package graft

import java.nio.file.{Files, Paths}

import graft.sources.I2b2Source
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
    assert(vcc.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("coding")
      .head.getAs[String]("code") === "10828004") // positive
    val i2 = out.filter(col("id") === "i2").head()
    assert(i2.getAs[Any]("valueCodeableConcept") === null) // unmapped
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
