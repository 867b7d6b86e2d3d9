package graft

import java.nio.file.{Files, Paths}

import graft.sources.{I2b2Source, NdjsonSource}
import org.apache.spark.sql.functions._

class I2b2SourceSpec extends SparkSpecBase {

  private def write(dir: String, name: String, lines: Seq[String]): String = {
    val p = Paths.get(dir, name)
    Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  private lazy val dir =
    Files.createTempDirectory("i2b2").toString

  test("patient dimension → FHIR Patient with mapped codes") {
    val path = write(dir, "patient_dimension.csv", Seq(
      "PATIENT_NUM,BIRTH_DATE,DEATH_DATE,SEX_CD,RACE_CD,ZIP_CD",
      "p1,1980-02-03 00:00:00,,F,Asian,02115",
      "p2,1990-05-06 12:30:00,2020-01-01 00:00:00,X,Hispanic or Latino,",
      "p1,1999-09-09 00:00:00,,M,White,99999" // dup: first wins
    ))
    val out = I2b2Source.patients(spark, path)
    assert(out.count() === 2)
    val p1 = out.filter(col("id") === "p1").head()
    assert(p1.getAs[String]("birthDate") === "1980-02-03")
    assert(p1.getAs[String]("gender") === "female")
    val exts = p1.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("extension")
    assert(exts.length === 1)
    assert(exts.head.getAs[String]("url").endsWith("us-core-race"))
    val coding = exts.head
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("extension")
      .head.getAs[org.apache.spark.sql.Row]("valueCoding")
    assert(coding.getAs[String]("code") === "2028-9") // Asian

    val p2 = out.filter(col("id") === "p2").head()
    assert(p2.getAs[String]("gender") === "other") // unmapped X
    assert(p2.getAs[String]("deceasedDateTime") === "2020-01-01")
    val ethExt = p2.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("extension")
    assert(ethExt.head.getAs[String]("url").endsWith("us-core-ethnicity"))
  }

  test("visit dimension → FHIR Encounter with period + subject ref") {
    val path = write(dir, "visit_dimension.csv", Seq(
      "ENCOUNTER_NUM,PATIENT_NUM,START_DATE,END_DATE",
      "e1,p1,2021-03-04 10:00:00,2021-03-05 11:00:00"
    ))
    val e = I2b2Source.encounters(spark, path).head()
    assert(e.getAs[org.apache.spark.sql.Row]("subject")
      .getAs[String]("reference") === "Patient/p1")
    val period = e.getAs[org.apache.spark.sql.Row]("period")
    assert(period.getAs[String]("start") === "2021-03-04")
    assert(period.getAs[String]("end") === "2021-03-05")
  }

  test("observation facts → FHIR Observation with SNOMED result") {
    val path = write(dir, "observation_fact_lab_views.csv", Seq(
      "INSTANCE_NUM,PATIENT_NUM,ENCOUNTER_NUM,CONCEPT_CD,START_DATE,TVAL_CHAR",
      "i1,p1,e1,LAB:123,2021-03-04 09:00:00,Positive",
      "i2,p1,e1,LAB:456,2021-03-04 09:30:00,equivocal"
    ))
    val out = I2b2Source.labObservations(spark, path)
    val i1 = out.filter(col("id") === "i1").head()
    val vcc = i1.getAs[org.apache.spark.sql.Row]("valueCodeableConcept")
    val c1 = vcc.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](
      "coding").head
    assert(c1.getAs[String]("code") === "10828004") // positive → SNOMED
    assert(c1.getAs[String]("system") === "http://snomed.info/sct")
    // unmapped result stays in the i2b2 system with the raw value
    val i2 = out.filter(col("id") === "i2").head()
    val c2 = i2.getAs[org.apache.spark.sql.Row]("valueCodeableConcept")
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("coding").head
    assert(c2.getAs[String]("code") === "equivocal")
    assert(c2.getAs[String]("system") ===
      "http://cumulus.smarthealthit.org/i2b2")
  }

  test("i2b2 loader stages CSVs as NDJSON the normal pipeline consumes") {
    val i2b2 = java.nio.file.Files.createTempDirectory("i2b2src").toString
    def put(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(i2b2, name),
        lines.mkString("\n").getBytes("UTF-8"))
    put("patient_dimension.csv", Seq(
      "PATIENT_NUM,BIRTH_DATE,DEATH_DATE,SEX_CD,RACE_CD,ZIP_CD",
      "p1,1982-07-15 00:00:00,,F,White,02115"))
    put("visit_dimension.csv", Seq(
      "ENCOUNTER_NUM,PATIENT_NUM,START_DATE,END_DATE,LENGTH_OF_STAY,INOUT_CD",
      "e1,p1,2021-03-04 10:00:00,2021-03-05 10:00:00,1,Inpatient"))
    put("observation_fact_lab_views.csv", Seq(
      "INSTANCE_NUM,PATIENT_NUM,ENCOUNTER_NUM,CONCEPT_CD,START_DATE,TVAL_CHAR",
      "i1,p1,e1,LAB:123,2021-03-04 09:00:00,Positive"))
    put("observation_fact_vitals.csv", Seq(
      "INSTANCE_NUM,PATIENT_NUM,ENCOUNTER_NUM,CONCEPT_CD,START_DATE,VALTYPE_CD,TVAL_CHAR,NVAL_NUM,UNITS_CD,OBSERVATION_BLOB",
      "v1,p1,e1,VITAL:hr,2021-03-04 09:00:00,N,E,72,bpm,"))
    val staged = java.nio.file.Files.createTempDirectory("i2b2out").toString
    val detected = I2b2Source.loadToNdjson(spark, i2b2, staged)
    assert(detected === Set("Patient", "Encounter", "Observation"))
    // the staged dir is a normal bulk-export dir now
    assert(NdjsonSource.detectResources(spark, staged) ===
      Set("Patient", "Encounter", "Observation"))
    // both lab and vitals facts land in the Observation stream
    assert(NdjsonSource.readResource(spark, staged, "Observation")
      .count() === 2)
    assert(NdjsonSource.readResource(spark, staged, "Patient")
      .count() === 1)
  }

  test("vitals facts → Observation with UCUM quantity and comparator") {
    val path = write(dir, "observation_fact_vitals.csv", Seq(
      "INSTANCE_NUM,PATIENT_NUM,ENCOUNTER_NUM,CONCEPT_CD,START_DATE,VALTYPE_CD,TVAL_CHAR,NVAL_NUM,UNITS_CD,OBSERVATION_BLOB",
      "v1,p1,e1,VITAL:hr,2021-03-04 09:00:00,N,E,72,bpm,",
      "v2,p1,e1,VITAL:bp,2021-03-04 09:00:00,N,GE,120,mmHg,",
      "v3,p1,e1,VITAL:smoker,2021-03-04 09:00:00,T,Former smoker,,,",
      "v4,p1,e1,VITAL:note,2021-03-04 09:00:00,@,,,,"
    ))
    val out = I2b2Source.vitalsObservations(spark, path)
    val v1 = out.filter(col("id") === "v1").head()
    assert(v1.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](
      "category").head
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("coding").head
      .getAs[String]("code") === "vital-signs")
    val q1 = v1.getAs[org.apache.spark.sql.Row]("valueQuantity")
    assert(q1.getAs[Double]("value") === 72.0)
    assert(q1.getAs[String]("code") === "/min") // bpm → UCUM
    assert(q1.getAs[String]("comparator") === null) // E = equal
    val q2 = out.filter(col("id") === "v2").head()
      .getAs[org.apache.spark.sql.Row]("valueQuantity")
    assert(q2.getAs[String]("comparator") === ">=")
    assert(q2.getAs[String]("code") === "mm[Hg]")
    val v3 = out.filter(col("id") === "v3").head()
    assert(v3.getAs[org.apache.spark.sql.Row]("valueCodeableConcept")
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("coding").head
      .getAs[String]("code") === "Former smoker")
    assert(v3.getAs[Any]("valueQuantity") === null)
    val v4 = out.filter(col("id") === "v4").head()
    assert(v4.getAs[Any]("valueQuantity") === null)
    assert(v4.getAs[Any]("valueCodeableConcept") === null)
  }

  test("diagnosis facts → Condition with ICD system split") {
    val path = write(dir, "observation_fact_diagnosis.csv", Seq(
      "INSTANCE_NUM,PATIENT_NUM,ENCOUNTER_NUM,CONCEPT_CD,START_DATE",
      "d1,p1,e1,ICD10:J45.40,2021-01-02 03:04:05",
      "d2,p1,e1,LOCAL-WEIRD,2021-01-03 00:00:00"
    ))
    val out = I2b2Source.conditions(spark, path)
      .collect().map(r => r.getString(1) -> r).toMap
    val c1 = out("d1").getAs[org.apache.spark.sql.Row]("code")
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("coding").head
    assert(c1.getAs[String]("system") === "http://hl7.org/fhir/sid/icd-10-cm")
    assert(c1.getAs[String]("code") === "J45.40")
    val c2 = out("d2").getAs[org.apache.spark.sql.Row]("code")
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("coding").head
    assert(c2.getAs[String]("system") ===
      "http://cumulus.smarthealthit.org/i2b2")
    assert(c2.getAs[String]("code") === "LOCAL-WEIRD")
  }

  test("med + note facts → MedicationRequest and DocumentReference") {
    val medPath = write(dir, "observation_fact_meds.csv", Seq(
      "INSTANCE_NUM,PATIENT_NUM,ENCOUNTER_NUM,CONCEPT_CD,START_DATE",
      "m1,p1,e1,MED:12345,2021-02-03 00:00:00"
    ))
    val med = I2b2Source.medicationRequests(spark, medPath).head()
    assert(med.getAs[String]("status") === "unknown")
    assert(med.getAs[String]("authoredOn") === "2021-02-03")

    val notePath = write(dir, "observation_fact_notes.csv", Seq(
      "INSTANCE_NUM,PATIENT_NUM,ENCOUNTER_NUM,CONCEPT_CD,START_DATE,END_DATE,TVAL_CHAR,OBSERVATION_BLOB",
      "n1,p1,e1,NOTE:123,2021-03-04 00:00:00,2021-03-04 01:00:00,Progress note,The¿note text"
    ))
    val doc = I2b2Source.documentReferences(spark, notePath).head()
    val att = doc
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("content")
      .head.getAs[org.apache.spark.sql.Row]("attachment")
    assert(att.getAs[String]("contentType") === "text/plain")
    val decoded = new String(
      java.util.Base64.getDecoder.decode(att.getAs[String]("data")),
      "UTF-8")
    assert(decoded === "The note text") // ¿ artifact blanked
    // and the note text extractor reads it back (P7 round trip)
    val texts = I2b2Source.documentReferences(spark, notePath)
      .select(graft.nlp.NoteOps.noteText(col("content")).as("t"))
    assert(texts.head().getString(0) === "The note text")
  }

  test("i2b2 patients flow into the scrubber like NDJSON ones") {
    val path = write(dir, "patient_dimension2.csv", Seq(
      "PATIENT_NUM,BIRTH_DATE,DEATH_DATE,SEX_CD,RACE_CD,ZIP_CD",
      "p9,1975-12-25 00:00:00,,M,White,03601"
    ))
    val cb = graft.deid.Codebook.withSalt("42" * 32)
    val scrubbed = graft.deid.ScrubCompiler.scrub(
      I2b2Source.patients(spark, path), "Patient", cb).head()
    assert(scrubbed.getAs[String]("birthDate") === "1975")
    val addr = scrubbed
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("address").head
    assert(addr.getAs[String]("postalCode") === "00000") // restricted 036
    assert(scrubbed.getAs[String]("id").matches("[0-9a-f]{64}"))
  }
}
