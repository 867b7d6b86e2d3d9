package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.etl.EtlPipeline
import graft.operators.MergeOps.MergeSpec
import graft.sinks.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Golden-run machinery shared by the spec and the regeneration main:
  * run the pipeline over the checked-in fixture inputs with a pinned
  * salt, canonicalize each output table to sorted sparse JSON rows.
  * (The reference's primary harness: whole-tree structural diffs with a
  * pinned codebook, SURVEY §5.1-2.)
  */
object GoldenHarness {

  val inputDir = "src/test/resources/golden/input"
  val expectedDir = "src/test/resources/golden/expected"
  val PinnedSalt: String = "42" * 32

  /** All 20 task tables — every resource the default pipeline loads. */
  val tables = Seq("patient", "encounter", "allergyintolerance",
    "condition", "device", "diagnosticreport", "documentreference",
    "episodeofcare", "immunization", "location", "medication",
    "medicationdispense", "medicationrequest", "observation",
    "organization", "practitioner", "practitionerrole", "procedure",
    "servicerequest", "specimen")

  def run(spark: SparkSession): Map[String, Seq[String]] = {
    val out = Files.createTempDirectory("golden-out").toString
    val phi = Files.createTempDirectory("golden-phi").toString
    // pin the codebook before the run so fake IDs are deterministic
    Files.write(Paths.get(phi, "codebook.json"),
      s"""{"version":1,"codebook_id":"golden","id_salt":"$PinnedSalt"}"""
        .getBytes("UTF-8"))
    EtlPipeline.run(spark, inputDir, out, phi,
      groupName = "golden", exportTime = "2024-01-01T00:00:00Z")
    tables.map { t =>
      t -> canonicalRows(spark, s"$out/$t")
    }.toMap
  }

  /** Table contents as sparse JSON strings with canonical (sorted) key
    * order, sorted by row text — a stable structural fingerprint.
    */
  def canonicalRows(spark: SparkSession, tablePath: String): Seq[String] = {
    val mapper = new ObjectMapper()
    mapper.configure(
      com.fasterxml.jackson.databind.SerializationFeature.ORDER_MAP_ENTRIES_BY_KEYS,
      true)
    val table = GraftTable(spark, tablePath, MergeSpec(Seq("id")))
    if (!table.exists) return Nil
    val df = table.read()
    df.select(to_json(struct(df.columns.map(col): _*),
        Map("ignoreNullFields" -> "true")).as("j"))
      .collect()
      .map { r =>
        // parse → TreeMap-ordered re-serialize for key-order stability
        val node = mapper.readTree(r.getString(0))
        mapper.writeValueAsString(mapper.treeToValue(node, classOf[Object]))
      }
      .sorted
      .toSeq
  }

  def readExpected(table: String): Seq[String] = {
    val p = Paths.get(expectedDir, s"$table.ndjson")
    if (!Files.exists(p)) Nil
    else new String(Files.readAllBytes(p), "UTF-8")
      .split("\n").toSeq.filter(_.nonEmpty)
  }
}

/** Regenerates the expected golden files (run after INTENTIONAL output
  * changes, then review the diff): `sbt "Test/runMain graft.GoldenGen"`.
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpecBase.session
    val actual = GoldenHarness.run(spark)
    Files.createDirectories(Paths.get(GoldenHarness.expectedDir))
    actual.foreach { case (table, rows) =>
      Files.write(
        Paths.get(GoldenHarness.expectedDir, s"$table.ndjson"),
        rows.mkString("\n").getBytes("UTF-8"))
      println(s"[golden] wrote ${rows.length} rows for $table")
    }
    spark.stop()
  }
}
