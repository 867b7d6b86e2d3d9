package graft

import java.nio.file.Files

import graft.streaming.EventStreams
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Runs the REAL streaming engine (micro-batch, state store, watermark)
  * via Trigger.AvailableNow over the sf0.001 events and asserts parity
  * with the batch forms of the same transforms.
  */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val eventsDir: String = {
    // stage events through our µs-normalized reader (streaming needs a
    // plain parquet dir with a Spark-readable schema)
    val dir = Files.createTempDirectory("events-stream").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming windowed agg with watermark matches batch result") {
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    val streamed = EventStreams.runAvailableNow(
      spark,
      EventStreams.windowedAggStream(stream),
      "win_agg_test"
    )
    val batch = EventStreams.windowedAgg(spark.read.parquet(eventsDir))

    // Append mode only emits windows the watermark has passed: windows
    // inside the final lateness horizon stay open when the stream ends.
    val maxTs = spark.read.parquet(eventsDir)
      .agg(max(col("ts"))).head().getTimestamp(0)
    val horizon = new java.sql.Timestamp(
      maxTs.getTime - 3 * 3600 * 1000) // window len + lateness margin

    val s = streamed.orderBy("wstart", "event_type").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val b = batch.orderBy("wstart", "event_type").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(s.nonEmpty)
    val sClosed = s.filter(_._1.before(horizon)).toSeq
    val bClosed = b.filter(_._1.before(horizon)).toSeq
    assert(sClosed === bClosed)
    // and everything streamed agrees with batch (no wrong aggregates)
    assert(s.toSet.subsetOf(b.toSet))
  }

  test("stream-static enrichment join matches batch result") {
    val dim = Tables.customer(spark, "/root/testdata/sf0.001")
      .join(Tables.nation(spark, "/root/testdata/sf0.001"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("user_id"), col("n_name").as("segment"))
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    val streamed = EventStreams.runAvailableNow(
      spark,
      EventStreams.enrichedWindowedAgg(
        stream.withWatermark("ts", "2 hours"), dim),
      "enrich_test"
    )
    val batch = EventStreams
      .enrichedWindowedAgg(spark.read.parquet(eventsDir), dim)

    val maxTs = spark.read.parquet(eventsDir)
      .agg(max(col("ts"))).head().getTimestamp(0)
    val horizon = new java.sql.Timestamp(maxTs.getTime - 3 * 3600 * 1000)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getString(2), r.getLong(3), r.getDouble(4)))
    val s = rows(streamed)
    val b = rows(batch)
    assert(s.nonEmpty)
    assert(s.filter(_._1.before(horizon)).toSet ===
      b.filter(_._1.before(horizon)).toSet)
    assert(s.toSet.subsetOf(b.toSet))
  }

  test("stream-stream interval join (attribution) matches batch pairs") {
    // a genuine stream-stream self-join: purchases and clicks both read
    // from the stream, joined on user within a two-sided time bound so
    // the state store can evict on watermark. Inner-join matches emit
    // as found, so the full pair set appears even at stream end.
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    val streamed = EventStreams.runAvailableNow(
      spark,
      EventStreams.attributionPairs(stream, "30 minutes",
        lateness = Some("1 hour")),
      "attr_test"
    )
    val batch = EventStreams
      .attributionPairs(spark.read.parquet(eventsDir), "30 minutes")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val s = pairs(streamed)
    val b = pairs(batch)
    assert(s.nonEmpty)
    assert(s === b)
  }

  test("streaming MinHash near-dup emits the batch pipeline's pair set") {
    import graft.streaming.StreamNearDup
    // corpus with exact copies so band buckets collide
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.unionByName(docs
      .filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + lit(1000000L)))
      .withColumn("ts",
        timestamp_micros(lit(1700000000000000L) + col("doc_id") * 1000000L))
    val dir = Files.createTempDirectory("stream-neardup").toString
    corpus.write.mode("overwrite").parquet(dir)

    val batchPairs = graft.operators.NearDedup
      .minHashCandidates(spark.read.parquet(dir), "doc_id", "text")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "1 hour")
    val streamed = EventStreams.runAvailableNow(
      spark,
      StreamNearDup.minHashPairsStream(stream, "doc_id", "text", "ts")
        .toDF(),
      "neardup_test"
    )
    // a pair colliding in several bands is emitted once per band;
    // dedup by pair key, as the batch path's dropDuplicates does
    val streamPairs = streamed.select("id_a", "id_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamPairs.nonEmpty)
    assert(streamPairs === batchPairs)
  }

  test("streaming sequence examples equal the batch builder on sorted replay") {
    import graft.streaming.StreamSequence
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id", "event_id", "event_type", "ts")
    val batch = graft.operators.EventFlows
      .sequenceExamples(events, "user_id", "event_id", "event_type",
        "ts", contextLen = 3)
      .select("event_id", "context", "target").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

    // sorted replay: three time-ordered files, one micro-batch each —
    // per-user event time is then non-decreasing ACROSS batches, the
    // operator's exact-parity contract
    val dir = Files.createTempDirectory("stream-seq").toString
    val mm = events.agg(min(col("ts")), max(col("ts"))).head()
    val (lo, hi) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
    val (t1, t2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
    def cut(ms: Long) = timestamp_millis(lit(ms))
    Seq(
      events.filter(col("ts") <= cut(t1)),
      events.filter(col("ts") > cut(t1) && col("ts") <= cut(t2)),
      events.filter(col("ts") > cut(t2))
    ).zipWithIndex.foreach { case (wave, i) =>
      // plain dir names (no "=": would trigger partition inference);
      // written oldest-first so the file source's mod-time order
      // replays them in time order
      wave.coalesce(1).write.mode("overwrite")
        .parquet(f"$dir/wave-$i%03d")
    }
    val schema = events.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/wave-*")
      .withWatermark("ts", "365 days")
    val streamed = EventStreams.runAvailableNow(
      spark,
      StreamSequence.sequenceExamplesStream(stream, "user_id",
        "event_id", "event_type", "ts", contextLen = 3).toDF(),
      "seq_stream_test")
    val got = streamed.select("event_id", "context", "target").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got.nonEmpty)
    assert(got === batch)
  }

  test("streaming funnel equals the batch funnel on sorted replay") {
    import graft.streaming.EventStreams
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id", "event_type", "ts")
    val steps = Seq("view", "click", "purchase")
    val batch = graft.operators.EventFlows
      .funnel(events, "user_id", "event_type", "ts", steps)
      .collect().map(r => r.getAs[Long]("step") -> r.getAs[Long]("n_users"))
      .toMap

    val dir = Files.createTempDirectory("stream-funnel").toString
    val mm = events.agg(min(col("ts")), max(col("ts"))).head()
    val (lo, hi) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
    val (t1, t2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
    def cut(ms: Long) = timestamp_millis(lit(ms))
    Seq(
      events.filter(col("ts") <= cut(t1)),
      events.filter(col("ts") > cut(t1) && col("ts") <= cut(t2)),
      events.filter(col("ts") > cut(t2))
    ).zipWithIndex.foreach { case (wave, i) =>
      wave.coalesce(1).write.mode("overwrite").parquet(f"$dir/wave-$i%03d")
    }
    import spark.implicits._
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/wave-*")
      .as[EventStreams.FunnelEvent]
    val streamed = EventStreams.runAvailableNow(
      spark,
      EventStreams.statefulFunnel(stream, steps).toDF(),
      "funnel_stream_test")
    val got = streamed.collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("step")))
    // one transition per (user, step), counts per step match the batch
    assert(got.length === got.distinct.length)
    val counts = got.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert((1L to steps.length.toLong).forall(s =>
      counts.getOrElse(s, 0L) === batch.getOrElse(s, 0L)))
    assert(counts.getOrElse(1L, 0L) > 0L)
    // nested conversion sets: a user at step k also completed step k-1
    val byStep = got.groupBy(_._2).view
      .mapValues(_.map(_._1).toSet).toMap
    assert(byStep.getOrElse(3L, Set.empty[Long])
      .subsetOf(byStep.getOrElse(2L, Set.empty[Long])))
    assert(byStep.getOrElse(2L, Set.empty[Long])
      .subsetOf(byStep.getOrElse(1L, Set.empty[Long])))
  }

  test("batch-mode sequence-example state op matches the batch window") {
    import graft.streaming.StreamSequence
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id", "event_id", "event_type", "ts")
    val viaState = StreamSequence
      .sequenceExamplesStream(events, "user_id", "event_id",
        "event_type", "ts", contextLen = 3)
      .toDF().select("event_id", "context", "target").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val viaWindow = graft.operators.EventFlows
      .sequenceExamples(events, "user_id", "event_id", "event_type",
        "ts", contextLen = 3)
      .select("event_id", "context", "target").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(viaState === viaWindow)
  }

  test("q80 batch-mode stateful near-dup matches the batch candidate set") {
    // SparkEntry runs minHashPairsStream over a BATCH frame: Spark
    // executes flatMapGroupsWithState with each key's rows in a single
    // group call, so the emitted pair set must equal NearDedup's.
    val q80 = SparkEntry.queries("q80_stateful_neardup")(
      spark, "/root/testdata/sf0.001")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.unionByName(docs
      .filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + lit(1000000L)))
    val batch = graft.operators.NearDedup
      .minHashCandidates(corpus, "doc_id", "text")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(q80.nonEmpty)
    assert(q80 === batch)
  }

  test("heavy hitters: streamed snapshots converge to exact counts") {
    // ample capacity → SpaceSaving never evicts → exact, so the final
    // per-shard snapshot must equal the batch frequency count even
    // when the stream arrives across several micro-batches
    val dir = Files.createTempDirectory("hh-stream").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .repartition(3).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val hits = graft.streaming.StreamHeavyHitters
      .spaceSaving(stream, "event_type", shards = 2, capacity = 64)
      .toDF()
    val q = hits.writeStream.format("memory").queryName("hh_stream_test")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val all = spark.table("hh_stream_test")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shard")
    val finalSnap = all.withColumn("mx", max("seq").over(w))
      .filter(col("seq") === col("mx"))
    val got = finalSnap.select("key", "est_count").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = spark.read.parquet(dir).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    // several micro-batches actually ran (snapshots are sequenced)
    assert(all.agg(max("seq")).head().getLong(0) >= 2L)
  }

  test("portable HLL: streamed register table equals the batch sketch") {
    // PortableHll.sketch is select + groupBy + max — an algebraic
    // (commutative, idempotent) aggregate Structured Streaming
    // maintains natively, so the SAME operator body is the live
    // distinct-count monitor: in Complete mode the final register
    // table must equal the batch sketch bit-for-bit no matter how the
    // stream is micro-batched. State is hard-bounded at
    // |groups| × 2^p rows — constant in stream length.
    val dir = Files.createTempDirectory("hll-stream").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .repartition(3).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    def grams(df: org.apache.spark.sql.DataFrame) = df.select(col("source"),
      explode(graft.functions.TextFunctions
        .md5Grams60Udf(col("text"), lit(5))).as("h"))
    val q = graft.operators.PortableHll
      .sketch(grams(stream), Seq("source"), col("h"), p = 8)
      .writeStream.format("memory").queryName("hll_stream_test")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("hll_stream_test")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = graft.operators.PortableHll
      .sketch(grams(spark.read.parquet(dir)), Seq("source"), col("h"), p = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want && got.nonEmpty)
  }

  test("heavy hitters: tight capacity keeps the hitter within bounds") {
    // 500×hot + 100 singletons through 4 counters: the classic
    // SpaceSaving guarantees, order-independent — the hitter (freq >
    // n/capacity) is always present, counts only ever overestimate,
    // and the error bound brackets the true count
    val rows = Seq.fill(500)("hot") ++ (1 to 100).map(i => s"cold$i")
    val hits = graft.streaming.StreamHeavyHitters
      .spaceSaving(rows.toDF("k"), "k", shards = 1, capacity = 4)
      .collect()
    assert(hits.length <= 4)
    val hot = hits.find(_.key == "hot").get
    assert(hot.est_count >= 500L)
    assert(hot.est_count - hot.max_err <= 500L)
  }

  test("streaming dedup drops key duplicates within the watermark") {
    val schema = spark.read.parquet(eventsDir).schema
    // duplicate the whole stream: every key arrives at least twice
    val dupDir = Files.createTempDirectory("events-dup").toString
    val base = spark.read.parquet(eventsDir)
    base.unionByName(base).write.mode("overwrite").parquet(dupDir)
    val stream = spark.readStream.schema(schema).parquet(dupDir)
    val deduped = EventStreams.runAvailableNow(
      spark,
      EventStreams.streamingDedup(stream, Seq("event_id"), "ts",
        lateness = "1 hour"),
      "dedup_test"
    )
    val distinctKeys = base.select("event_id").distinct().count()
    assert(deduped.select("event_id").distinct().count() === distinctKeys)
    // every key emitted exactly once despite duplicate arrivals
    assert(deduped.count() === distinctKeys)
  }

  test("streaming corpus ingestion: quality gates + dedup match batch") {
    import graft.functions.TextFunctions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // copies make the dedup stage meaningful
    val corpus = docs.unionByName(
      docs.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L)))
    val dir = Files.createTempDirectory("docs-stream").toString
    corpus.write.mode("overwrite").parquet(dir)

    def ingest(df: org.apache.spark.sql.DataFrame) =
      df.filter(
          tokenCount(col("text")) >= 20 &&
            typeTokenRatio(col("text")) >= 0.45 &&
            alphaRatio(col("text")) >= 0.80)
        .withColumn("h", md5(col("text")))
        .dropDuplicates("h")

    val schema = spark.read.parquet(dir).schema
    val streamed = EventStreams.runAvailableNow(
      spark,
      ingest(spark.readStream.schema(schema).parquet(dir)),
      "corpus_ingest_test"
    )
    val batch = ingest(spark.read.parquet(dir))
    // which duplicate row survives depends on arrival order — compare
    // the surviving CONTENT set, which is deterministic
    val sH = streamed.select("h").collect().map(_.getString(0)).toSet
    val bH = batch.select("h").collect().map(_.getString(0)).toSet
    assert(sH.nonEmpty)
    assert(sH === bH)
  }

  test("flatMapGroupsWithState session count matches session_window") {
    val events = spark.read.parquet(eventsDir)
      .select(col("user_id"), col("ts"))
      .as[EventStreams.Event]
    val stateful = EventStreams.statefulSessionCount(events)
      .collect().map(s => s.user_id -> s.n_sessions).toMap
    val viaWindow = EventStreams.sessionAgg(spark.read.parquet(eventsDir))
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stateful.nonEmpty)
    assert(stateful === viaWindow)
  }

  test("streaming feature snapshots equal the batch q151 join") {
    import graft.streaming.StreamFeatures
    val batch = graft.queries.TemporalQueries
      .qFeatureSnapshot(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]),
        r.getLong(6))).toSet

    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id", "event_id", "event_type", "ts", "value")
    val dir = Files.createTempDirectory("stream-feat").toString
    val mm = events.agg(min(col("ts")), max(col("ts"))).head()
    val (lo, hi) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
    val (t1, t2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
    def cut(ms: Long) = timestamp_millis(lit(ms))
    Seq(
      events.filter(col("ts") <= cut(t1)),
      events.filter(col("ts") > cut(t1) && col("ts") <= cut(t2)),
      events.filter(col("ts") > cut(t2))
    ).zipWithIndex.foreach { case (wave, i) =>
      wave.coalesce(1).write.mode("overwrite").parquet(f"$dir/wave-$i%03d")
    }
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/wave-*")
    val streamed = EventStreams.runAvailableNow(
      spark,
      StreamFeatures.featureSnapshots(stream, "user_id", "event_id",
        "event_type", "ts", "value").toDF(),
      "feat_stream_test")
    val got = streamed.collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Double]("purchase_value"),
        Option(r.get(r.fieldIndex("last_click_id")))
          .map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("micros_since_click")))
          .map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("last_view_id")))
          .map(_.asInstanceOf[Long]),
        r.getAs[Long]("n_clicks_10m"))).toSet
    assert(got.nonEmpty)
    assert(got === batch)
  }

  test("streaming SCD2 closed intervals equal the batch history") {
    import graft.streaming.StreamScd2
    val changes = Tables.events(spark, "/root/testdata/sf0.001")
      .select(concat_ws("|", col("user_id"), col("event_type")).as("key"),
        col("ts"), col("event_id"),
        floor(col("value") / lit(10.0)).as("tier"))
    // batch truth: the q146 operator's CLOSED rows (is_current = false)
    val batch = graft.operators.Scd2
      .build(changes, Seq("key"), "ts", "event_id", "tier")
      .filter(!col("is_current"))
      .select(col("key"), col("tier").cast("string"),
        col("valid_from"), col("valid_to"), col("version"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4))).toSet

    // sorted replay, three waves → per-key time non-decreasing across
    // micro-batches (the operator's parity contract)
    val dir = Files.createTempDirectory("stream-scd2").toString
    val mm = changes.agg(min(col("ts")), max(col("ts"))).head()
    val (lo, hi) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
    val (t1, t2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
    def cut(ms: Long) = timestamp_millis(lit(ms))
    Seq(
      changes.filter(col("ts") <= cut(t1)),
      changes.filter(col("ts") > cut(t1) && col("ts") <= cut(t2)),
      changes.filter(col("ts") > cut(t2))
    ).zipWithIndex.foreach { case (wave, i) =>
      wave.coalesce(1).write.mode("overwrite").parquet(f"$dir/wave-$i%03d")
    }
    val stream = spark.readStream.schema(changes.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/wave-*")
    val streamed = EventStreams.runAvailableNow(
      spark,
      StreamScd2.closedIntervals(stream, "key", "ts", "event_id", "tier")
        .toDF(),
      "scd2_stream_test")
    val got = streamed.collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("value"),
        r.getAs[java.sql.Timestamp]("valid_from"),
        r.getAs[java.sql.Timestamp]("valid_to"),
        r.getAs[Long]("version"))).toSet
    assert(got.nonEmpty)
    assert(got === batch)
  }
}
