package graft

import java.nio.file.{Files, Paths}

import graft.deid.{Codebook, ScrubCompiler}
import graft.nlp.{ModelRunner, NoteOps, StudyTasks}
import graft.sources.NdjsonSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Fourth whole-path reference parity proof: the declarative NLP
  * studies (glioma, ibd, irae) run against the REFERENCE's own fixtures
  * (tests/data/{study}) — each study's input DocumentReferences scrub
  * under its pinned codebook, its tasks.toml expands through
  * [[StudyTasks]], a fake model answers with exactly what the
  * reference's mock returns (the annotation defaults the goldens embed,
  * tests/nlp/test_glioma.py etc.), and the assembled rows must match
  * every checked-in golden table structurally — hashed references, task
  * versions from the toml, and responses parsed through the converted
  * JSON-Schema (25 golden tables across the three studies).
  */
class StudyCompatSpec extends SparkSpecBase {

  private val refTests = "/root/reference/tests/data"
  private val refStudies = "/root/reference/cumulus_etl/etl/studies"

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

  /** Golden fixture file for a task (fixture naming varies per study:
    * glioma/ibd prefix the study, irae's nameless longitudinal task has
    * its own file).
    */
  private def goldenFile(study: String, name: Option[String]): String =
    study match {
      case "glioma" | "ibd" =>
        s"$study-${name.get.replace('_', '-')}-output.ndjson"
      case "irae" =>
        name.map(n => s"${n.replace('_', '-')}-output.ndjson")
          .getOrElse("longitudinal-output.ndjson")
      case other => fail(s"unknown study $other")
    }

  private def checkStudy(study: String): Unit = {
    val dataDir = s"$refTests/$study"
    val tomlPath = s"$refStudies/$study/tasks.toml"
    assume(Files.exists(Paths.get(dataDir)) &&
      Files.exists(Paths.get(tomlPath)))

    val cb = Codebook.loadOrCreate(dataDir)
    val docrefs = ScrubCompiler.scrub(
      NdjsonSource.readResource(spark, s"$dataDir/input",
        "DocumentReference"),
      "DocumentReference", cb, nlpMode = true)
    val notes = docrefs.select(
      col("id").cast("string").as("note_id"),
      col("context.encounter")(0).getField("reference").cast("string")
        .as("encounter_ref_raw"),
      col("subject.reference").cast("string").as("subject_ref"),
      NoteOps.noteText(col("content")).cast("string").as("text"))

    val tasks = StudyTasks.load(study, tomlPath)
    val emptyCache = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("checksum", StringType),
        StructField("result", StringType))))

    // one run per distinct task (models share prompts and schema; the
    // goldens are model-agnostic)
    val distinctTasks = tasks.groupBy(_.name).map(_._2.head).toSeq
    val checkedFiles = distinctTasks.map { task =>
      val fixture = goldenFile(study, task.name)
      val goldenPath = s"$dataDir/$fixture"
      assert(Files.exists(Paths.get(goldenPath)),
        s"no golden for $study task ${task.name}")
      // the reference's mock model answer IS the goldens' result object
      // (the annotation-class defaults, serialized by the test mock);
      // everything else in the row is computed by this engine
      val mockAnswer = mapper.readTree(
        Files.readAllLines(Paths.get(goldenPath)).get(0))
        .get("result").toString
      val client = new ModelRunner.ModelClient {
        def complete(prompts: Seq[String]): Seq[String] =
          prompts.map(_ => mockAnswer)
      }
      val (annotated, _) = StudyTasks.annotate(
        task, notes, "note_id", "text", emptyCache, client)
      val rows = annotated
        .join(notes, "note_id")
        .select(
          concat(lit("DocumentReference/"), col("note_id")).as("note_ref"),
          concat(lit("Encounter/"),
            element_at(split(col("encounter_ref_raw"), "/"), -1))
            .as("encounter_ref"),
          col("subject_ref"),
          lit("2021-09-14T21:23:45+00:00").as("generated_on"),
          lit(task.version).as("task_version"),
          lit("test-fp").as("system_fingerprint"),
          col("result"))
      // read the golden under the task's own output schema — inference
      // would erase empty-object leaves like sescd's `"ileum": {}`
      val golden = spark.read.schema(task.outputSchema).json(goldenPath)
      assert(canon(rows) === canon(golden),
        s"$study task ${task.name} does not match $fixture")
      fixture
    }
    // every golden fixture in the directory must have been checked —
    // a silent skip would fake coverage
    val allFixtures = new java.io.File(dataDir).list()
      .filter(_.endsWith("-output.ndjson")).toSet
    assert(checkedFiles.toSet === allFixtures)
  }

  test("glioma study tables match the reference goldens") {
    checkStudy("glioma")
  }

  test("ibd study tables match the reference goldens") {
    checkStudy("ibd")
  }

  test("irae study tables match the reference goldens") {
    checkStudy("irae")
  }
}
