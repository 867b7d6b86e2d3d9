package graft

import graft.deid.Philter
import graft.fhir.{FhirJoins, FhirSchemas}
import org.apache.spark.sql.functions._

class FhirSpec extends SparkSpecBase {
  import spark.implicits._

  test("explicit FHIR schemas read NDJSON with stable column sets") {
    val dir = java.nio.file.Files.createTempDirectory("fhir-schema").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "Patient.ndjson"),
      """{"resourceType":"Patient","id":"p1","gender":"female"}"""
        .getBytes("UTF-8"))
    val df = graft.sources.NdjsonSource.readResource(
      spark, dir, "Patient", FhirSchemas.forResource("Patient"))
    // full catalog schema present even though the data is sparse
    assert(df.columns.contains("birthDate"))
    assert(df.columns.contains("maritalStatus"))
    assert(df.count() === 1)
    // and the scrubber compiles against the catalog schema
    val cb = graft.deid.Codebook.withSalt("42" * 32)
    val scrubbed = graft.deid.ScrubCompiler.scrub(df, "Patient", cb)
    assert(scrubbed.head().getAs[String]("gender") === "female")
  }

  test("Athena registration drops then creates at the versioned layout") {
    import graft.sinks.{Athena, RecordingAthenaClient}
    import org.apache.spark.sql.types._
    val client = new RecordingAthenaClient()
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("result", StructType(Seq(
        StructField("label", StringType))))))
    val loc = Athena.registerTable(client, "covid__symptoms", schema,
      "s3://results-bucket/wg", version = 3)
    assert(loc === "s3://results-bucket/wg/covid/symptoms_v3/")
    assert(client.statements.head ===
      "DROP TABLE IF EXISTS covid__symptoms")
    assert(client.statements(1).contains("CREATE EXTERNAL TABLE"))
    assert(client.statements(1).contains(loc))
    intercept[IllegalArgumentException] {
      Athena.registerTable(client, "bad-name;drop", schema, "s3://x", 1)
    }
  }

  test("Athena cohort query guards against oversized tables") {
    import graft.sinks.{Athena, RecordingAthenaClient}
    val small = new RecordingAthenaClient(Map("my_cohort" -> 100L))
    val loc = Athena.queryCohortTable(small, "my_cohort")
    assert(loc.contains("SELECT * FROM"))
    val big = new RecordingAthenaClient(Map("core_table" -> 1000000L))
    intercept[IllegalStateException] {
      Athena.queryCohortTable(big, "core_table")
    }
    // explicit override allows it, like --allow-large-selection
    Athena.queryCohortTable(big, "core_table", allowLarge = true)
  }

  test("Athena DDL generation covers nested struct/array types") {
    val ddl = FhirSchemas.toAthenaDdl(FhirSchemas.observation,
      "observation", "s3://bucket/obs/")
    assert(ddl.contains("CREATE EXTERNAL TABLE IF NOT EXISTS `observation`"))
    assert(ddl.contains("`valueQuantity` STRUCT<value: DOUBLE"))
    assert(ddl.contains("`category` ARRAY<STRUCT<"))
    assert(ddl.contains("LOCATION 's3://bucket/obs/'"))
  }

  test("philter regex subset masks PHI shapes, offset-stable") {
    val df = Seq(
      "SSN 123-45-6789 phone (617) 555-1234 email a.b@example.com MRN: 12345678 ok"
    ).toDF("text")
    val out = df.select(Philter.scrubText(col("text"))).head().getString(0)
    assert(out.length ===
      "SSN 123-45-6789 phone (617) 555-1234 email a.b@example.com MRN: 12345678 ok".length)
    assert(out.contains("SSN ***********"))
    assert(!out.contains("123-45-6789"))
    assert(!out.contains("555-1234"))
    assert(!out.contains("example.com"))
    assert(!out.contains("12345678"))
    assert(out.endsWith(" ok"))
  }

  test("practitioner enrichment resolves both reference forms") {
    val notes = Seq(
      (1L, "PractitionerRole/r1"),
      (2L, "Practitioner/pr2"),
      (3L, "Practitioner/none")
    ).toDF("note_id", "author_ref")
    val roles = Seq(
      ("r1", "Practitioner/pr1", Seq("doctor"), Seq("cardiology")),
      ("r2", "Practitioner/pr2", Seq("nurse"), Seq("triage"))
    ).toDF("id", "practitionerRef", "codes", "specialties")
    val practitioners = Seq(("pr1", "Dr A"), ("pr2", "Nurse B"))
      .toDF("id", "name")
    val out = FhirJoins.enrichAuthors(notes, "note_id", "author_ref",
        roles, practitioners)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[scala.collection.Seq[String]]("author_roles")
      === Seq("doctor"))
    assert(out(1L).getAs[scala.collection.Seq[String]]("author_names")
      === Seq("Dr A"))
    assert(out(2L).getAs[scala.collection.Seq[String]]("author_specialties")
      === Seq("triage"))
    assert(out(3L).getAs[scala.collection.Seq[String]]("author_names")
      .isEmpty)
  }
}
