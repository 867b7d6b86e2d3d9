package graft.queries

import graft.streaming.EventStreams
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Batch forms of the streaming operators over `events` (SURVEY §2.9) —
  * the same transforms EventStreams runs incrementally, so the DuckDB
  * oracle checks both.
  */
object StreamQueries {

  /** q50 — tumbling 1-hour windows per event_type. */
  def qWindowAgg(spark: SparkSession, dir: String): DataFrame =
    EventStreams.windowedAgg(Tables.events(spark, dir))

  val qWindowAggSql: String =
    """SELECT date_trunc('hour', date_trunc('microseconds', ts)) AS wstart,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** q51 — session windows (30-minute gap) per user via Spark's native
    * session_window; a new session starts when the gap is ≥ 30 minutes
    * (session extends while ts < previous end).
    */
  def qSessions(spark: SparkSession, dir: String): DataFrame =
    EventStreams
      .sessionAgg(Tables.events(spark, dir))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events")
      )

  val qSessionsSql: String =
    """WITH e AS (
      |  SELECT user_id, date_trunc('microseconds', ts) AS ts FROM events),
      |flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (
      |  SELECT user_id,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS sess_id
      |  FROM flagged)
      |SELECT user_id, CAST(COUNT(DISTINCT sess_id) AS BIGINT) AS n_sessions,
      |  COUNT(*) AS n_events
      |FROM sess GROUP BY user_id""".stripMargin

  /** q53 — stream-static enrichment: events joined to a broadcast
    * dimension (customer → nation name as the user's segment) then
    * aggregated per (hour window, segment, event_type). Same transform
    * the streaming engine runs incrementally (StreamingSpec proves
    * stream/batch parity); the oracle checks the batch form.
    */
  def qStreamEnrich(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables
      .customer(spark, dir)
      .join(Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("user_id"), col("n_name").as("segment"))
    EventStreams.enrichedWindowedAgg(Tables.events(spark, dir), dim)
  }

  val qStreamEnrichSql: String =
    """SELECT date_trunc('hour', date_trunc('microseconds', ts)) AS wstart,
      |  n_name AS segment, event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
      |FROM events e
      |JOIN customer c ON e.user_id = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY 1, 2, 3""".stripMargin

  /** q52 — event-time lag analytics: per (user, event order) deltas —
    * the window-function shape streaming pipelines use for gap
    * detection; also exercises JSON extraction from the props column.
    */
  def qEventDeltas(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        (unix_micros(col("ts")) -
          coalesce(unix_micros(lag(col("ts"), 1).over(w)),
            unix_micros(col("ts"))))
          .as("micros_since_prev")
      )
  }

  val qEventDeltasSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, props,
      |    date_trunc('microseconds', ts) AS ts
      |  FROM events)
      |SELECT event_id, user_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |  CAST(COALESCE(
      |    epoch_us(ts) - epoch_us(lag(ts) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id)),
      |    0) AS BIGINT) AS micros_since_prev
      |FROM e""".stripMargin

  /** q86 — the stateful SpaceSaving heavy-hitter operator executed in
    * batch mode over the events table: with capacity (64) above the
    * per-shard distinct-key count, nothing evicts, so the sketch's
    * counters are exact and order-independent — oracle = a plain
    * frequency count with zero error. The approximation regime (tight
    * capacity, guaranteed containment + error bounds) is pinned in
    * StreamingSpec, streamed across micro-batches.
    */
  def qHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamHeavyHitters
      .spaceSaving(Tables.events(spark, dir), "event_type",
        shards = 4, capacity = 64)
      .toDF()
      .select(col("key").as("event_type"), col("est_count"),
        col("max_err"))

  val qHeavyHittersSql: String =
    """SELECT event_type, COUNT(*) AS est_count,
      |  CAST(0 AS BIGINT) AS max_err
      |FROM events
      |WHERE event_type IS NOT NULL
      |GROUP BY 1""".stripMargin

  /** q92 — top-5 event values per type through the custom typed
    * [[graft.operators.TopKDoubles]] Aggregator: each partition ships
    * at most k doubles per group to the shuffle (a rank window would
    * shuffle EVERY row to sort it) — the aggregation-pushdown shape
    * for "top k values only" at scale. The oracle ranks with a window;
    * equal values make identical output regardless of which row wins.
    */
  def qTopKAgg(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new graft.operators.TopKDoubles(5))
    Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(topk(col("value")).as("__top"))
      .select(col("event_type"),
        posexplode(col("__top")).as(Seq("__pos", "value")))
      .select(col("event_type"), (col("__pos") + 1).cast("long").as("rank"),
        col("value"))
  }

  val qTopKAggSql: String =
    """WITH ranked AS (
      |  SELECT event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY value DESC) AS rank
      |  FROM events WHERE value IS NOT NULL)
      |SELECT event_type, CAST(rank AS BIGINT) AS rank, value
      |FROM ranked WHERE rank <= 5""".stripMargin

  /** q80 — the stateful streaming near-dup operator executed in batch
    * mode (Spark runs `flatMapGroupsWithState` over batch frames with
    * all of a key's rows in one group call): candidate pairs from
    * per-bucket LSH state on the docs∪copies corpus, deduplicated by
    * pair key. StreamingSpec proves the genuinely-streamed execution
    * emits the same set; no SQL oracle (FNV signature family is
    * engine-internal, like q25).
    */
  def qStatefulNearDup(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Tables
      .withIdCopies(Tables.documents(spark, dir).select("doc_id", "text"),
        "doc_id", 7, 1000000L)
      .withColumn("ts",
        timestamp_micros(lit(1700000000000000L) + col("doc_id") * 1000000L))
    graft.streaming.StreamNearDup
      .minHashPairsStream(corpus, "doc_id", "text", "ts")
      .toDF()
      .dropDuplicates("id_a", "id_b")
  }
}
