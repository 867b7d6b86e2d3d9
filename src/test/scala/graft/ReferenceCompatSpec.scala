package graft

import graft.deid.{Codebook, ScrubCompiler}
import graft.sources.NdjsonSource
import org.apache.spark.sql.functions._

/** Cross-validation against the REFERENCE's own golden fixtures
  * (SURVEY §7.2: "same salt ⇒ byte-identical fake IDs"): scrub the
  * reference's `tests/data/simple/input` under its pinned codebook and
  * compare the identifier mappings with its checked-in `output/` —
  * covering the HMAC formula, the legacy random-mapping lookup order,
  * and reference rewriting, end to end. (Whole-tree byte equality is
  * NOT asserted: the reference generated those goldens with its full
  * philter — POS-tagging included — where this engine ships the regex
  * subset by design.)
  */
class ReferenceCompatSpec extends SparkSpecBase {

  private val refData = "/root/reference/tests/data/simple"
  private def available: Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(refData))

  private def outIds(table: String): Set[String] =
    spark.read.json(s"$refData/output/$table/$table.000.ndjson")
      .select("id").collect().map(_.getString(0)).toSet

  test("non-legacy resource ids hash to the reference's exact output ids") {
    assume(available)
    val cb = Codebook.loadOrCreate(refData)
    val in = NdjsonSource.readResource(spark, s"$refData/input", "Condition")
    val ours = ScrubCompiler.scrub(in, "Condition", cb)
      .select("id").collect().map(_.getString(0)).toSet
    assert(ours === outIds("condition"))
  }

  test("legacy codebook mappings reproduce the reference's patient ids") {
    assume(available)
    val cb = Codebook.loadOrCreate(refData)
    // the fixture codebook carries pre-hash random UUID mappings; the
    // reference (and we) must keep honoring them over the hash
    val in = NdjsonSource.readResource(spark, s"$refData/input", "Patient")
    val ours = ScrubCompiler.scrub(in, "Patient", cb)
      .select("id").collect().map(_.getString(0)).toSet
    assert(ours === outIds("patient"))
    assert(ours.exists(_.contains("-"))) // really the UUID forms
  }

  test("reference rewriting consults legacy mappings for Patient refs") {
    assume(available)
    val cb = Codebook.loadOrCreate(refData)
    val in = NdjsonSource.readResource(spark, s"$refData/input", "Condition")
    val ourRefs = ScrubCompiler.scrub(in, "Condition", cb)
      .select(col("subject.reference")).collect()
      .map(_.getString(0)).toSet
    val goldenRefs = spark.read
      .json(s"$refData/output/condition/condition.000.ndjson")
      .select(col("subject.reference")).collect()
      .map(_.getString(0)).toSet
    assert(ourRefs === goldenRefs)
  }

  test("id mappings match the reference's output for ALL 20 resource types") {
    assume(available)
    val cb = Codebook.loadOrCreate(refData)
    val tables = Seq(
      "AllergyIntolerance", "Condition", "Device", "DiagnosticReport",
      "DocumentReference", "Encounter", "EpisodeOfCare", "Immunization",
      "Location", "Medication", "MedicationDispense", "MedicationRequest",
      "Observation", "Organization", "Patient", "Practitioner",
      "PractitionerRole", "Procedure", "ServiceRequest", "Specimen")
    val mismatches = tables.flatMap { rt =>
      val table = rt.toLowerCase
      val in = NdjsonSource.readResource(spark, s"$refData/input", rt)
      val ours = ScrubCompiler.scrub(in, rt, cb)
        .select("id").collect().map(_.getString(0)).toSet
      val golden = outIds(table)
      if (ours == golden) None
      else Some(s"$rt: ours=${ours.size} golden=${golden.size} " +
        s"onlyOurs=${(ours -- golden).take(2)} " +
        s"onlyGolden=${(golden -- ours).take(2)}")
    }
    assert(mismatches.isEmpty, mismatches.mkString("\n"))
  }

  test("rows are BYTE-IDENTICAL to the goldens outside philter-masked text") {
    assume(available)
    val cb = Codebook.loadOrCreate(refData)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.configure(com.fasterxml.jackson.databind.SerializationFeature
      .ORDER_MAP_ENTRIES_BY_KEYS, true)
    def canon(df: org.apache.spark.sql.DataFrame): Map[String, String] =
      df.select(to_json(struct(df.columns.map(col): _*),
          Map("ignoreNullFields" -> "true")).as("j"))
        .collect().map { r =>
          val node = mapper.readTree(r.getString(0))
          node.get("id").asText() -> mapper.writeValueAsString(
            mapper.treeToValue(node, classOf[Object]))
        }.toMap
    val tables = Seq(
      "AllergyIntolerance", "Condition", "Device", "DiagnosticReport",
      "DocumentReference", "Encounter", "EpisodeOfCare", "Immunization",
      "Location", "Medication", "MedicationDispense", "MedicationRequest",
      "Observation", "Organization", "Patient", "Practitioner",
      "PractitionerRole", "Procedure", "ServiceRequest", "Specimen")
    var checked = 0
    val bad = tables.flatMap { rt =>
      val ours = canon(ScrubCompiler.scrub(
        NdjsonSource.readResource(spark, s"$refData/input", rt), rt, cb))
      val golden = canon(spark.read.json(
        s"$refData/output/${rt.toLowerCase}/${rt.toLowerCase}.000.ndjson"))
      golden.flatMap { case (id, g) =>
        // rows the reference's FULL philter (POS-based name masking,
        // which this engine's regex subset deliberately omits) touched
        // carry '**' runs — everything else must match byte-for-byte
        if (g.contains("**")) None
        else {
          checked += 1
          if (ours.get(id).contains(g)) None else Some(s"$rt/$id")
        }
      }
    }
    assert(bad.isEmpty, bad.mkString(", "))
    assert(checked >= 30, s"only $checked rows compared") // 32 of 39
  }

  test("replaying the reference's batched output merges to its single-batch state") {
    assume(available)
    // the reference's batched-output tree is the same ETL run with a
    // forced batch split; merging the batches in index order must land
    // on exactly the unbatched output rows (A2 cross-batch semantics,
    // the convert/replay contract)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.configure(com.fasterxml.jackson.databind.SerializationFeature
      .ORDER_MAP_ENTRIES_BY_KEYS, true)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(to_json(struct(df.columns.map(col): _*),
          Map("ignoreNullFields" -> "true")).as("j"))
        .collect().map { r =>
          val node = mapper.readTree(r.getString(0))
          mapper.writeValueAsString(mapper.treeToValue(node, classOf[Object]))
        }.sorted.toSeq
    val tables = Seq("patient", "condition", "observation",
      "documentreference", "encounter")
    tables.foreach { table =>
      val batchedDir = s"$refData/batched-output/$table"
      assume(java.nio.file.Files.exists(
        java.nio.file.Paths.get(batchedDir)))
      val schema = spark.read.json(batchedDir).schema
      val files = java.nio.file.Files.list(
          java.nio.file.Paths.get(batchedDir)).toArray
        .map(_.toString).filter(_.endsWith(".ndjson")).sorted
      val out = java.nio.file.Files
        .createTempDirectory(s"replay-$table").toString
      val gt = graft.sinks.GraftTable(spark, out,
        graft.operators.MergeOps.MergeSpec(Seq("id")))
      files.foreach { f =>
        gt.merge(spark.read.schema(schema).json(f))
      }
      val replayed = canon(gt.read())
      val golden = canon(spark.read.schema(schema)
        .json(s"$refData/output/$table/$table.000.ndjson"))
      assert(replayed === golden, s"table $table")
    }
  }

  test("the bulk-export log fixture parses to its group + transaction time") {
    assume(available)
    // S4 on the reference's own log.ndjson: no /Group/ segment in the
    // export URL → blank group; transactionTime from status_complete
    assert(NdjsonSource.parseExportLog(spark,
      s"$refData/input/log.ndjson") ===
      Some(("", "2024-08-06T14:00:00-04:00")))
  }

  test("scalar generalizations match the reference's patient output") {
    assume(available)
    val cb = Codebook.loadOrCreate(refData)
    val in = NdjsonSource.readResource(spark, s"$refData/input", "Patient")
    val ours = ScrubCompiler.scrub(in, "Patient", cb)
      .select(col("id"), col("birthDate"),
        col("address")(0).getField("postalCode").as("zip"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2))).toMap
    val golden = spark.read
      .json(s"$refData/output/patient/patient.000.ndjson")
      .select(col("id"), col("birthDate"),
        col("address")(0).getField("postalCode").as("zip"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2))).toMap
    golden.foreach { case (id, (bd, zip)) =>
      assert(ours.contains(id), s"missing $id")
      assert(ours(id)._1 === bd, s"birthDate for $id")
      assert(ours(id)._2 === zip, s"zip for $id")
    }
  }
}
