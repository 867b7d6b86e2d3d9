package graft

import java.nio.file.Files

import graft.deid.{Codebook, ScrubCompiler}
import graft.sources.{I2b2Source, NdjsonSource}
import org.apache.spark.sql.functions._

/** Cross-validation of the i2b2 path against the REFERENCE's own
  * end-to-end fixture (tests/data/i2b2: dimension CSVs in, scrubbed
  * FHIR NDJSON goldens out, codebook salt "9876"): stage the CSVs as
  * bulk-export NDJSON, scrub under the pinned codebook, and compare
  * every resource table structurally (canonical sparse JSON) with the
  * checked-in goldens — the same whole-tree diff the reference's
  * TreeCompareMixin performs.
  */
class I2b2CompatSpec extends SparkSpecBase {

  private val refData = "/root/reference/tests/data/i2b2"
  private def available: Boolean =
    Files.exists(java.nio.file.Paths.get(refData))

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  mapper.configure(com.fasterxml.jackson.databind.SerializationFeature
    .ORDER_MAP_ENTRIES_BY_KEYS, true)

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(to_json(struct(df.columns.map(col): _*),
        Map("ignoreNullFields" -> "true")).as("j"))
      .collect().map { r =>
        val node = mapper.readTree(r.getString(0))
        mapper.writeValueAsString(mapper.treeToValue(node, classOf[Object]))
      }.sorted.toSeq

  test("i2b2 CSVs → transform → scrub reproduces the reference goldens") {
    assume(available)
    val staged = Files.createTempDirectory("i2b2-staged").toString
    // the reference feeds conditions an `icd.json` vocabulary side input
    // (not shipped in the snapshot); supply the public ICD-10-CM
    // description for the fixture's code the same way a deployment would
    val icd10 = Map("http://hl7.org/fhir/sid/icd-10-cm" -> Map(
      "R40.2412" ->
        "Glasgow coma scale score 13-15, at arrival to emergency department"))
    I2b2Source.loadToNdjson(spark, s"$refData/input", staged, icd10)
    val cb = Codebook.loadOrCreate(refData)
    val tables = Seq(
      "Patient" -> "patient",
      "Encounter" -> "encounter",
      "Condition" -> "condition",
      "Observation" -> "observation",
      "MedicationRequest" -> "medicationrequest",
      "DocumentReference" -> "documentreference")
    val problems = tables.flatMap { case (rt, table) =>
      val goldenPath = s"$refData/output/$table/$table.000.ndjson"
      if (!Files.exists(java.nio.file.Paths.get(goldenPath))) None
      else {
        val in = NdjsonSource.readResource(spark, staged, rt)
        val ours = canon(ScrubCompiler.scrub(
          I2b2Source.dedupFirstWins(in, "id"), rt, cb))
        val golden = canon(spark.read.json(goldenPath))
        if (ours == golden) None
        else {
          val onlyOurs = ours.filterNot(golden.contains).take(1)
          val onlyGolden = golden.filterNot(ours.contains).take(1)
          Some(s"$table: ours=${ours.size} golden=${golden.size}\n" +
            s"  onlyOurs:   ${onlyOurs.mkString}\n" +
            s"  onlyGolden: ${onlyGolden.mkString}")
        }
      }
    }
    assert(problems.isEmpty, "\n" + problems.mkString("\n"))
  }
}
