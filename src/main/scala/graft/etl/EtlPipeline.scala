package graft.etl

import graft.deid.{Codebook, DefaultScrubPolicy, ScrubCompiler, ScrubPolicy}
import graft.operators.MergeOps
import graft.operators.MergeOps.MergeSpec
import graft.sinks.GraftTable
import graft.sources.NdjsonSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end ETL flow (SURVEY §3.1): per resource task,
  * read NDJSON → scrub → dedup (last-wins) → merge into the output
  * table → completion bookkeeping — each stage one of the already-tested
  * operators; this driver only sequences them.
  */
object EtlPipeline {

  /** One per-resource task (the reference's task classes,
    * etl/tasks/task_factory.py:48-80, collapsed to configuration).
    */
  final case class EtlTask(
      resourceType: String,
      tableName: String,
      groupField: Option[String] = None,
      updateExisting: Boolean = true
  ) {
    /** K2/J2: every FHIR task merge is guarded by `meta.lastUpdated`,
      * exactly as the reference guards every Delta merge whenever the
      * schema carries the field (deltalake.py:120-122,187-232) — the wide
      * schemas here always do (FhirSchemas), so a re-run of an OLDER
      * export can never clobber newer rows. MergeOps skips the guard for
      * schemas without the path, so non-FHIR tables are unaffected.
      */
    def mergeSpec: MergeSpec = MergeSpec(
      keys = Seq("id"),
      updateExisting = updateExisting,
      guardField = Some("meta.lastUpdated"),
      groupField = groupField
    )
  }

  /** The reference's 20 default tasks (task_factory.py:48-80): Encounter
    * and Patient first (codebook-churn ordering, O6), the rest
    * alphabetical.
    */
  val DefaultTasks: Seq[EtlTask] = Seq(
    EtlTask("Encounter", "encounter"),
    EtlTask("Patient", "patient"),
    EtlTask("AllergyIntolerance", "allergyintolerance"),
    EtlTask("Condition", "condition"),
    EtlTask("Device", "device"),
    EtlTask("DiagnosticReport", "diagnosticreport"),
    EtlTask("DocumentReference", "documentreference"),
    EtlTask("EpisodeOfCare", "episodeofcare"),
    EtlTask("Immunization", "immunization"),
    EtlTask("Location", "location"),
    EtlTask("Medication", "medication"),
    EtlTask("MedicationDispense", "medicationdispense"),
    EtlTask("MedicationRequest", "medicationrequest"),
    EtlTask("Observation", "observation"),
    EtlTask("Organization", "organization"),
    EtlTask("Practitioner", "practitioner"),
    EtlTask("PractitionerRole", "practitionerrole"),
    EtlTask("Procedure", "procedure"),
    EtlTask("ServiceRequest", "servicerequest"),
    EtlTask("Specimen", "specimen")
  )

  /** Key-hash bucket count for resource tables. Local/test scale; on a
    * production deployment size so each bucket lands near the target
    * file size (e.g. 100 TB / 1 GB ≈ 10⁵ buckets).
    */
  val ResourceTableBuckets = 16

  final case class TaskResult(
      table: String,
      attempted: Boolean,
      rows: Long,
      rowsRead: Long = 0L,
      rowsScrubbed: Long = 0L
  ) {
    /** A5/A7: rejection funnel — rows dropped by scrub policy. */
    def rowsRejected: Long = rowsRead - rowsScrubbed
  }

  /** Run the pipeline: returns per-task summaries (A7-style). */
  def run(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      phiDir: String,
      tasks: Seq[EtlTask] = DefaultTasks,
      policy: ScrubPolicy = DefaultScrubPolicy.policy,
      groupName: String = "",
      exportTime: String = "",
      nlpMode: Boolean = false,
      philterEnabled: Boolean = false,
      buckets: Int = ResourceTableBuckets
  ): Seq[TaskResult] = {
    val codebook = Codebook.loadOrCreate(phiDir)
    // ONE detection pass (first line of each file) feeds resource
    // reconciliation AND every task's file list
    val filesByType = NdjsonSource.detectResourceFiles(spark, inputDir)
    val available = filesByType.keySet
    JobConfig.write(outputDir, Map(
      "input_dir" -> inputDir,
      "group_name" -> groupName,
      "export_time" -> exportTime,
      "codebook_id" -> codebook.codebookId,
      "tasks" -> tasks.map(_.tableName).mkString(",")
    ))

    val etlDebug = sys.env.contains("GRAFT_ETL_DEBUG")
    def phase[T](label: String)(f: => T): T =
      if (!etlDebug) f
      else {
        val t0 = System.nanoTime()
        val r = f
        System.err.println(
          f"[etl]   $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
        r
      }
    val results = tasks.map { task =>
      if (!available.contains(task.resourceType)) {
        // touch-empty-tables (etl/tasks/base.py:222-227): a selected task
        // with no input still leaves a valid empty wide-schema table so
        // downstream SQL never breaks on a missing table
        Init.touchTable(spark, outputDir, task, policy)
        TaskResult(task.tableName, attempted = false, rows = 0)
      } else {
        // parsed ONCE, read three times (census, scrub→merge, and the
        // Patient/Encounter mapping side-output) — JSON parsing of
        // nested resources dominates the cold path, so cache the parsed
        // frame for the task's duration (MEMORY_AND_DISK: spills, never
        // recomputes the parse)
        val raw = phase(s"${task.tableName} read")(NdjsonSource.readResourceFiles(spark,
          filesByType.getOrElse(task.resourceType, Nil),
          task.resourceType,
          graft.fhir.FhirSchemas.forResource(task.resourceType),
          widen = true)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        // P2/A4: dropped-extension census side-output (the report the
        // reference prints at run end, persisted as a mergeable table)
        val census = ScrubCompiler.extensionCensus(raw,
          task.resourceType, policy)
        // evaluate the census ONCE (it is small by definition: one row
        // per distinct dropped-extension url) — `isEmpty` + `merge`
        // would run the input aggregation twice
        val censusRows = phase(s"${task.tableName} census")(census.collect())
        if (censusRows.nonEmpty)
          GraftTable(spark, s"$outputDir/etl__extension_census",
            MergeSpec(Seq("resource_type", "url"))).merge(
            spark.createDataFrame(
              java.util.Arrays.asList(censusRows: _*), census.schema))
        // A5: funnel metrics ride the merge action via observe() —
        // no extra jobs for the seen/scrubbed counts
        val readObs = org.apache.spark.sql.Observation()
        val scrubObs = org.apache.spark.sql.Observation()
        // nlpMode keeps note text (mask-note leaves), mirroring the
        // reference's prepare_pipeline(nlp=True) (etl/pipeline.py:213-215)
        val scrubbed = ScrubCompiler.scrub(
          raw.observe(readObs, count(lit(1)).as("n")),
          task.resourceType, codebook, policy, nlpMode, philterEnabled)
        // A1: last-wins on id in EXPORT order ("updates appended later
        // win", etl/tasks/base.py:308-316): primary order = position of
        // the row's file in the sorted export listing (real append
        // signal — partition ids alone don't track file order), ties
        // within a file broken by the partition-local id
        val inputFiles = NdjsonSource.listResourceFiles(spark, inputDir)
        val deduped = phase(s"${task.tableName} scrub+dedup")(MergeOps.dedupLastWins(
          scrubbed.observe(scrubObs, count(lit(1)).as("n"))
            .withColumn("__file_seq", NdjsonSource.fileSeqCol(inputFiles))
            .withColumn("__seq", monotonically_increasing_id()),
          Seq("id"),
          Seq(col("__file_seq"), col("__seq"))
        ).drop("__file_seq", "__seq")
          // materialized ONCE before the merge: the bucketed merge (and
          // the completion fan-out) runs several actions, and each
          // would re-ANALYZE the full scrub-projection lineage — the
          // wide-schema Column tree costs seconds of Catalyst analysis
          // per action (measured at 200k rows: cold merge 12.2s → 4.4s,
          // tiny incremental 14.5s → 3.6s). Scrub + dedup still execute
          // exactly once — this checkpoint is that execution.
          .localCheckpoint(true))

        // bucketed incremental layout: re-runs merge only the key-hash
        // buckets their rows touch instead of rewriting the table
        // (backend-pluggable: spark.graft.delta.enabled=true binds the
        // same flow to Delta Lake when its jars are present)
        val table = graft.sinks.MergeTable.open(spark,
          s"$outputDir/${task.tableName}", task.mergeSpec,
          buckets = buckets)
        phase(s"${task.tableName} merge")(table.merge(deduped))

        // Patient/Encounter reversibility side-output (SURVEY §7.4.3)
        if (task.resourceType == "Patient" ||
          task.resourceType == "Encounter") {
          val mapping = codebook.mappingTable(
            raw.filter(col("resourceType") === task.resourceType),
            "id", task.resourceType)
          phase(s"${task.tableName} mapping")(
            GraftTable(spark, s"$phiDir/codebook-mappings",
              MergeSpec(Seq("resource_type", "real_id"))).merge(mapping))
        }

        val n = table.rowCount // footer metadata only — no table scan
        phase(s"${task.tableName} completion")(
          Completion.recordTable(spark, outputDir, task.tableName,
            groupName, exportTime))
        // J7: Encounter rows fan out into the per-encounter completion
        // table as well (etl/tasks/basic_tasks.py:36-68)
        if (task.resourceType == "Encounter")
          phase(s"${task.tableName} enc-completion")(
            Completion.recordEncounters(spark, outputDir,
              deduped.select("id"), groupName, exportTime))
        raw.unpersist()
        TaskResult(task.tableName, attempted = true, rows = n,
          rowsRead = readObs.get("n").asInstanceOf[Long],
          rowsScrubbed = scrubObs.get("n").asInstanceOf[Long])
      }
    }

    // deleted-ids bundles (S5 → K3)
    val deletedDir = s"$inputDir/deleted"
    if (Files.exists(java.nio.file.Paths.get(deletedDir))) {
      val deleted = NdjsonSource.readDeletedIds(spark, deletedDir).cache()
      tasks.foreach { task =>
        val ids = deleted
          .filter(col("resource_type") === task.resourceType)
          .select(codebook.fakeId(col("id")).as("id"))
        val table = GraftTable(spark, s"$outputDir/${task.tableName}",
          task.mergeSpec)
        if (table.exists) table.deleteIds(ids)
      }
      deleted.unpersist()
    }
    // K10: last-successful-run record for resume UX (etl/context.py)
    JobContext.recordSuccess(phiDir, inputDir, outputDir,
      results.map(r => r.table -> r.rows).toMap)
    results
  }

  private object Files {
    def exists(p: java.nio.file.Path): Boolean =
      java.nio.file.Files.exists(p)
  }
}

/** K10: frozen run configuration under OUTPUT/JobConfig/{timestamp}/
  * (etl/config.py:71-133) — run provenance for later `convert`s.
  */
object JobConfig {
  def write(outputDir: String, entries: Map[String, String]): String = {
    val ts = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd__HH.mm.ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    val dir = java.nio.file.Paths.get(outputDir, "JobConfig", ts)
    java.nio.file.Files.createDirectories(dir)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    entries.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    java.nio.file.Files.write(dir.resolve("job_config.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    dir.toString
  }

  /** O5: most recent JobConfig dir (reverse-sorted timestamps). */
  def latest(outputDir: String): Option[String] = {
    val base = java.nio.file.Paths.get(outputDir, "JobConfig")
    if (!java.nio.file.Files.exists(base)) None
    else {
      val dirs = java.nio.file.Files.list(base).toArray
        .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      dirs.sorted(Ordering.String.reverse).headOption
        .map(d => base.resolve(d).toString)
    }
  }
}

/** K8: quarantine sink — failed/unprocessable rows appended as
  * batch-indexed NDJSON under {errorsDir}/{task}/
  * (etl/tasks/base.py:356-364).
  */
object ErrorSink {
  def quarantine(df: org.apache.spark.sql.DataFrame, errorsDir: String,
      task: String, name: String = "write-error"): Option[String] =
    if (df.isEmpty) None
    else Some(graft.sinks.NdjsonSink.writeBatch(df,
      s"$errorsDir/$task", name))

  /** NLP-task quarantine (etl/tasks/nlp_task.py:91-100): unprocessable
    * notes land under {errorsDir}/{task}/nlp-errors.*.ndjson.
    */
  def quarantineNlp(df: org.apache.spark.sql.DataFrame, errorsDir: String,
      task: String): Option[String] =
    quarantine(df, errorsDir, task, "nlp-errors")
}

/** Completion-tracking tables (SURVEY §2.2 K9; completion/schema.py:12-75:
  * all-string columns by design so NDJSON replay round-trips).
  */
object Completion {

  def recordTable(
      spark: SparkSession,
      outputDir: String,
      tableName: String,
      groupName: String,
      exportTime: String
  ): Unit = {
    import spark.implicits._
    val etlTime = java.time.Instant.now().toString
    val row = Seq((tableName, groupName, exportTime, etlTime))
      .toDF("table_name", "group_name", "export_time", "etl_time")
    GraftTable(spark, s"$outputDir/etl__completion",
      MergeSpec(Seq("table_name", "group_name", "export_time"),
        updateExisting = false)).merge(row)
  }

  /** Encounter completion fan-out (J7): one row per encounter, insert-only
    * so the first export time wins (etl/tasks/basic_tasks.py:36-68).
    */
  def recordEncounters(
      spark: SparkSession,
      outputDir: String,
      encounterIds: DataFrame,
      groupName: String,
      exportTime: String
  ): Unit = {
    val rows = encounterIds
      .select(col(encounterIds.columns.head).as("encounter_id"))
      .withColumn("group_name", lit(groupName))
      .withColumn("export_time", lit(exportTime))
    GraftTable(spark, s"$outputDir/etl__completion_encounters",
      MergeSpec(Seq("encounter_id", "group_name"),
        updateExisting = false)).merge(rows)
  }
}
