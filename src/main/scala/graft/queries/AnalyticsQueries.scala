package graft.queries

import graft.operators.TimeSeries
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** OLAP analytics shapes round 5 adds on top of Relational/Relational2:
  * rollup with grouping ids, pivot, calendar gap-fill, Markov event
  * transitions, and rolling/cumulative window frames. All arithmetic
  * follows the repo's exactness discipline — decimal sums cast to
  * double at the edge, integer/division-only doubles, no
  * transcendentals (ln is not bit-identical between the JVM and libm).
  */
object AnalyticsQueries {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(28, 6))).cast("double")

  /** q93 — ROLLUP with grouping ids: per (priority, status) order
    * counts + revenue, plus per-priority and grand-total super-rows.
    * One Expand + one shuffle; every grouping's partial aggregates
    * combine map-side, so the rollup costs one pass regardless of
    * corpus size.
    */
  def q93Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .select(
        col("o_orderpriority").as("priority"),
        col("o_orderstatus").as("status"),
        col("o_totalprice"))
      .rollup("priority", "status")
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"),
        grouping_id().cast("long").as("gid"))

  /** Spark's grouping_id and DuckDB's GROUPING share the Postgres bit
    * convention (first rollup column = MSB), so `gid` is comparable
    * directly.
    */
  val q93RollupSql: String =
    """SELECT o_orderpriority AS priority, o_orderstatus AS status,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid
      |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q94 — pivot: per user-bucket revenue by event type, wide. The
    * pivot values are pinned (the deployment's known event vocabulary),
    * so the plan is a single hash aggregate over the fact table — no
    * distinct-values pre-pass, no second shuffle.
    */
  def q94Pivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables
      .events(spark, dir)
      .withColumn("bucket", col("user_id") % 20)
      .groupBy("bucket")
      .pivot("event_type", eventTypes)
      .agg(dsum(col("value")))
    eventTypes
      .foldLeft(wide)((df, t) =>
        df.withColumn(t, coalesce(col(t), lit(0.0))))
  }

  val q94PivotSql: String = {
    val cols = eventTypes
      .map(t =>
        s"""  COALESCE(CAST(SUM(CAST(value AS DECIMAL(28,6)))
           |    FILTER (event_type = '$t') AS DOUBLE), 0.0) AS $t""".stripMargin)
      .mkString(",\n")
    s"""SELECT user_id % 20 AS bucket,
       |$cols
       |FROM events GROUP BY 1""".stripMargin
  }

  /** q95 — calendar gap-fill: daily high-value event metrics on a dense
    * (day × event_type) spine; missing days get count 0 and carry the
    * last observed revenue level forward (0.0 before the first). The
    * value ≥ 180 filter makes the daily series genuinely sparse at
    * every SF, so both repairs are exercised.
    */
  def q95GapFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"), col("value"))
    val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
    val keys = ev.select("event_type").distinct()
    val daily = ev
      .filter(col("value") >= 180)
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("level"))
    TimeSeries
      .gapFill(TimeSeries.calendarSpine(bounds, keys), daily,
        keyCols = Seq("event_type"), dayCol = "day",
        zeroFill = Seq("n_events"), forwardFill = Seq("level"))
      .select("day", "event_type", "n_events", "level")
  }

  val q95GapFillSql: String =
    """WITH ev AS (
      |  SELECT CAST(ts AS DATE) AS day, event_type, value FROM events),
      |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      |days AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
      |    AS day FROM b),
      |spine AS (
      |  SELECT day, event_type
      |  FROM days CROSS JOIN (SELECT DISTINCT event_type FROM ev)),
      |daily AS (
      |  SELECT event_type, day, COUNT(*) AS n_events,
      |    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS level
      |  FROM ev WHERE value >= 180 GROUP BY 1, 2)
      |SELECT s.day, s.event_type, COALESCE(d.n_events, 0) AS n_events,
      |  COALESCE(last_value(d.level IGNORE NULLS) OVER (
      |    PARTITION BY s.event_type ORDER BY s.day
      |    ROWS UNBOUNDED PRECEDING), 0.0) AS level
      |FROM spine s LEFT JOIN daily d
      |  ON s.day = d.day AND s.event_type = d.event_type""".stripMargin

  /** q98 — first-order Markov transitions: per user, order events by
    * (ts, event_id) and count (from → to) type pairs with per-source
    * probabilities. One shuffle on user for the lead window (per-user
    * sequences, bounded), one map-side-combinable count, probabilities
    * from an exact long-ratio over a tiny aggregated frame.
    */
  def q98Transitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val counts = Tables
      .events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    counts.withColumn(
      "p",
      col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy("from_type")).cast("double"))
  }

  val q98TransitionsSql: String =
    """WITH tr AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |c AS (
      |  SELECT from_type, to_type, COUNT(*) AS n FROM tr
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(n AS DOUBLE) /
      |    CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
      |FROM c""".stripMargin

  /** q113 — sequence-model training examples
    * ([[graft.operators.EventFlows.sequenceExamples]]): every event
    * with ≥3 predecessors becomes a (context "a>b>c" oldest-first,
    * target) next-token example — the dataset-builder complement of
    * q98's transition MATRIX. One user-key shuffle, all lags on a
    * single window sort.
    */
  def q113SeqExamples(spark: SparkSession, dir: String): DataFrame =
    graft.operators.EventFlows.sequenceExamples(
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts")),
      "user_id", "event_id", "event_type", "ts", contextLen = 3)

  val q113SeqExamplesSql: String =
    """SELECT user_id, event_id, ts,
      |  lag3 || '>' || lag2 || '>' || lag1 AS context,
      |  event_type AS target
      |FROM (
      |  SELECT user_id, event_id, ts, event_type,
      |    lag(event_type, 3) OVER w AS lag3,
      |    lag(event_type, 2) OVER w AS lag2,
      |    lag(event_type, 1) OVER w AS lag1
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |WHERE lag3 IS NOT NULL""".stripMargin

  /** q100 — rolling + cumulative window frames over the daily revenue
    * series: 7-row trailing sum/avg and a running total, decimal-exact
    * until the final double cast. The windows are unpartitioned BY
    * DESIGN over the post-aggregation daily frame — |distinct days|
    * rows (calendar-bounded, ~2.4k here), so the single-task sort is
    * over kilobytes no matter the corpus size; the corpus-sized work is
    * the map-side-combinable daily groupBy before it.
    */
  def q100Rolling(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(28, 6))).as("rev"))
    val w7 = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    val wCum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.select(
      col("day"),
      col("n_orders"),
      col("rev").cast("double").as("revenue"),
      sum(col("rev")).over(w7).cast("double").as("roll7_revenue"),
      (sum(col("rev")).over(w7).cast("double") /
        count(lit(1)).over(w7).cast("double")).as("roll7_avg"),
      sum(col("rev")).over(wCum).cast("double").as("cum_revenue"))
  }

  val q100RollingSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders,
      |    SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
      |  FROM orders GROUP BY 1)
      |SELECT day, n_orders, CAST(rev AS DOUBLE) AS revenue,
      |  CAST(SUM(rev) OVER w7 AS DOUBLE) AS roll7_revenue,
      |  CAST(SUM(rev) OVER w7 AS DOUBLE) /
      |    CAST(COUNT(*) OVER w7 AS DOUBLE) AS roll7_avg,
      |  CAST(SUM(rev) OVER (ORDER BY day
      |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_revenue
      |FROM daily
      |WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin

  /** q164 — CUSUM change-point detection per event type: daily mean
    * values, cumulative sum of deviations from the type's overall
    * mean, and the day where |CUSUM| peaks — the standard
    * drift-localization statistic (WHERE did the level shift, which
    * the q? drift detectors' did-it-shift answer doesn't give).
    * Deviations and their cumulative sums stay DECIMAL-exact (the
    * partial-agg discipline); only the reported statistics cast to
    * double. The corpus-sized work is ONE daily aggregate; the CUSUM
    * window runs over the bounded (type × day) frame, partitioned by
    * type.
    */
  def qCusum(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast(DecimalType(28, 6))).as("sv"),
        count(lit(1)).as("n"))
    val overall = daily.groupBy("event_type")
      .agg(sum(col("sv")).as("tot"), sum(col("n")).as("tn"))
    // exact per-day deviation from the overall mean, kept rational:
    // dev_day = sv - n * tot / tn  →  scale by tn to stay integer-
    // exact: sdev = sv * tn - n * tot (DECIMAL), cusum = Σ sdev;
    // reported cusum is the scaled value / tn, one double division
    val wCum = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily.join(overall, "event_type")
      // counts cast to DECIMAL(10,0): a (28,6)x(10,0) product keeps
      // scale 6 under the 38-precision cap on BOTH engines, so the
      // arithmetic stays exact (a (28,6)x(28,6) product would overflow
      // the cap and round differently per engine)
      .withColumn("sdev",
        col("sv") * col("tn").cast(DecimalType(10, 0)) -
          col("n").cast(DecimalType(10, 0)) * col("tot"))
      .withColumn("cusum_scaled", sum(col("sdev")).over(wCum))
    val wAbs = Window.partitionBy("event_type")
      .orderBy(abs(col("cusum_scaled")).desc, col("day"))
    scored
      .withColumn("rk", row_number().over(wAbs))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("change_day"),
        (col("cusum_scaled").cast("double") /
          col("tn").cast("double")).as("peak_cusum"))
      .orderBy("event_type")
  }

  val qCusumSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    SUM(CAST(value AS DECIMAL(28,6))) AS sv, COUNT(*) AS n
      |  FROM events WHERE value IS NOT NULL
      |  GROUP BY event_type, CAST(ts AS DATE)),
      |overall AS (
      |  SELECT event_type, SUM(sv) AS tot, SUM(n) AS tn
      |  FROM daily GROUP BY event_type),
      |scored AS (
      |  SELECT d.event_type, d.day,
      |    SUM(d.sv * CAST(o.tn AS DECIMAL(10,0))
      |        - CAST(d.n AS DECIMAL(10,0)) * o.tot)
      |      OVER (PARTITION BY d.event_type ORDER BY d.day
      |            ROWS UNBOUNDED PRECEDING) AS cusum_scaled,
      |    o.tn
      |  FROM daily d JOIN overall o USING (event_type)),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      |    ORDER BY abs(cusum_scaled) DESC, day) AS rk
      |  FROM scored)
      |SELECT event_type, day AS change_day,
      |  CAST(cusum_scaled AS DOUBLE) / CAST(tn AS DOUBLE) AS peak_cusum
      |FROM ranked WHERE rk = 1 ORDER BY event_type""".stripMargin

  /** q167 — two-proportion A/B test over the event stream: users are
    * assigned by `user_id % 2`, a user converts when they ever fire a
    * high-value `purchase` event (value > 100 — every user in the
    * synthetic stream has SOME purchase, which would make both rates
    * exactly 1 and the pooled variance 0), and the pooled
    * two-proportion z-score compares
    * the arms. Everything up to the final z is integer (per-user max,
    * arm counts); the z itself is a fixed-shape double expression, so
    * both engines evaluate the identical IEEE operation sequence.
    * Scale shape: one user-keyed aggregate with map-side partials, one
    * two-row arm aggregate, one single-row pivot — no joins at all.
    */
  def qAbTest(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") > 100.0,
        1L).otherwise(0L)).as("conv"))
      .withColumn("variant", col("user_id") % 2)
    val arms = users.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
    val wide = arms.agg(
      max(when(col("variant") === 0, col("n"))).as("n0"),
      max(when(col("variant") === 0, col("c"))).as("c0"),
      max(when(col("variant") === 1, col("n"))).as("n1"),
      max(when(col("variant") === 1, col("c"))).as("c1"))
    val p0 = col("c0").cast("double") / col("n0").cast("double")
    val p1 = col("c1").cast("double") / col("n1").cast("double")
    val pp = (col("c0") + col("c1")).cast("double") /
      (col("n0") + col("n1")).cast("double")
    wide.select(col("n0"), col("c0"), col("n1"), col("c1"),
      p0.as("p0"), p1.as("p1"),
      ((p1 - p0) / sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n0").cast("double") +
          lit(1.0) / col("n1").cast("double")))).as("z"))
  }

  val qAbTestSql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    MAX(CASE WHEN event_type = 'purchase' AND value > 100
      |        THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id),
      |v AS (
      |  SELECT user_id % 2 AS variant, COUNT(*) AS n,
      |    SUM(conv) AS c
      |  FROM u GROUP BY user_id % 2),
      |w AS (
      |  SELECT
      |    CAST(MAX(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n0,
      |    CAST(MAX(CASE WHEN variant = 0 THEN c END) AS BIGINT) AS c0,
      |    CAST(MAX(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n1,
      |    CAST(MAX(CASE WHEN variant = 1 THEN c END) AS BIGINT) AS c1
      |  FROM v)
      |SELECT n0, c0, n1, c1,
      |  CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
      |  CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
      |  (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |    - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
      |  / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
      |      * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
      |      * (CAST(1 AS DOUBLE) / CAST(n0 AS DOUBLE)
      |         + CAST(1 AS DOUBLE) / CAST(n1 AS DOUBLE))) AS z
      |FROM w""".stripMargin

  /** q169 — per-group median imputation
    * ([[graft.operators.Impute.medianImpute]]): a deterministic 10%
    * of event values is knocked out (`event_id % 10`, simulated
    * sensor dropout — the synthetic stream has no organic nulls) and
    * refilled with the event type's exact discrete median of the
    * surviving values. The summary proves the repair: per type, the
    * imputed count, the fill value, and the decimal-exact post-repair
    * sum.
    */
  def qImpute(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        when(col("event_id") % 10 === 0, lit(null)).otherwise(col("value"))
          .as("value"))
    graft.operators.Impute.medianImpute(e, "event_type", "value")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("imputed"), 1L).otherwise(0L)).as("n_imputed"),
        max(when(col("imputed"), col("value"))).as("imputed_median"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double")
          .as("sum_after"))
      .orderBy("event_type")
  }

  val qImputeSql: String =
    """WITH e AS (
      |  SELECT event_id, event_type,
      |    CASE WHEN event_id % 10 = 0 THEN NULL ELSE value END AS v
      |  FROM events),
      |r1 AS (
      |  SELECT event_type, v,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM e WHERE v IS NOT NULL),
      |med AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN rn = CEIL(n * 0.5) THEN v END) AS med
      |  FROM r1 GROUP BY event_type),
      |f AS (
      |  SELECT e.event_type, COALESCE(e.v, m.med) AS v2,
      |    e.v IS NULL AS imputed, m.med
      |  FROM e JOIN med m USING (event_type))
      |SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN imputed THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_imputed,
      |  MAX(CASE WHEN imputed THEN v2 END) AS imputed_median,
      |  CAST(SUM(CAST(v2 AS DECIMAL(28,6))) AS DOUBLE) AS sum_after
      |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q170 — per-group winsorization ([[graft.operators.Impute.winsorize]]):
    * event values clipped to the type's exact discrete [p05, p95]
    * (lower-rank order statistics, always actual input values), with
    * clip counts, the bounds, and the decimal-exact post-clip sum —
    * the robust-scaling companion to q169's imputation and q155's
    * outlier flags.
    */
  def qWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    graft.operators.Impute.winsorize(e, "event_type", "value", 0.05, 0.95)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("clip_low"), 1L).otherwise(0L)).as("n_clip_low"),
        sum(when(col("clip_high"), 1L).otherwise(0L)).as("n_clip_high"),
        max(col("p_low")).as("p_low"),
        max(col("p_high")).as("p_high"),
        sum(col("value_w").cast(DecimalType(28, 6))).cast("double")
          .as("sum_after"))
      .orderBy("event_type")
  }

  val qWinsorizeSql: String =
    """WITH e AS (
      |  SELECT event_type, value AS v FROM events WHERE value IS NOT NULL),
      |r AS (
      |  SELECT event_type, v,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM e),
      |b AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN rn = CEIL(n * 0.05) THEN v END) AS lo,
      |    MAX(CASE WHEN rn = CEIL(n * 0.95) THEN v END) AS hi
      |  FROM r GROUP BY event_type)
      |SELECT e.event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN e.v < b.lo THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clip_low,
      |  CAST(SUM(CASE WHEN e.v > b.hi THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clip_high,
      |  MAX(b.lo) AS p_low, MAX(b.hi) AS p_high,
      |  CAST(SUM(CAST(LEAST(GREATEST(e.v, b.lo), b.hi) AS DECIMAL(28,6)))
      |    AS DOUBLE) AS sum_after
      |FROM e JOIN b USING (event_type)
      |GROUP BY e.event_type ORDER BY event_type""".stripMargin

  /** The q190–q192 synthetic annotation table: the event stream read
    * as a labeling exercise (item = event_id mod 400, annotator =
    * user_id mod 5, label = event_type), resolved to one deterministic
    * vote per (item, annotator) via [[graft.operators.Annotation.resolveVotes]].
    */
  private def annotationVotes(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Annotation.resolveVotes(
      Tables.events(spark, dir)
        .select((col("event_id") % 400).as("item"),
          (col("user_id") % 5).as("annotator"),
          col("event_type").as("lbl")),
      "item", "annotator", "lbl")

  private val annotationVotesSqlCte: String =
    """WITH v AS (
      |  SELECT event_id % 400 AS item, user_id % 5 AS annotator,
      |    MIN(event_type) AS label
      |  FROM events WHERE event_type IS NOT NULL
      |  GROUP BY 1, 2)""".stripMargin

  /** q190 — majority-vote label adjudication
    * ([[graft.operators.Annotation.majorityVote]]): per item the
    * winning label (ties to the smallest label), its votes and the
    * item's annotator count — the resolution step downstream of the
    * chart-review / Label Studio flow (labelstudio.py push → human
    * labels → this). Grouped integer aggregation; the window runs
    * over (item × label) rows, never raw votes.
    */
  def qMajorityVote(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Annotation
      .majorityVote(annotationVotes(spark, dir), "item", "label")

  val qMajorityVoteSql: String =
    annotationVotesSqlCte + ",\n" +
      """c AS (
        |  SELECT item, label, CAST(COUNT(*) AS BIGINT) AS votes
        |  FROM v GROUP BY 1, 2),
        |r AS (
        |  SELECT item, label, votes,
        |    CAST(SUM(votes) OVER (PARTITION BY item) AS BIGINT)
        |      AS n_annotators,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY item ORDER BY votes DESC, label ASC) AS rn
        |  FROM c)
        |SELECT item, label, votes, n_annotators FROM r WHERE rn = 1""".stripMargin

  /** q191 — Cohen's kappa between annotators 0 and 1
    * ([[graft.operators.Annotation.cohenKappa]]): inter-annotator
    * agreement in the exact integer form
    * `(agree·n − Σ na·nb) / (n² − Σ na·nb)` — numerator/denominator
    * BIGINTs plus ONE double division, so the statistic itself is
    * hash-exact cross-engine (the q167 z-test discipline, with even
    * the intermediates integral).
    */
  def qCohenKappa(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Annotation.cohenKappa(
      annotationVotes(spark, dir), "item", "annotator",
      col("label"), lit(0L), lit(1L))

  val qCohenKappaSql: String =
    annotationVotesSqlCte + ",\n" +
      """p AS (
        |  SELECT a.item, a.label AS la, b.label AS lb
        |  FROM v a JOIN v b USING (item)
        |  WHERE a.annotator = 0 AND b.annotator = 1),
        |base AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
        |    CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS agree FROM p),
        |m AS (
        |  SELECT l, CAST(SUM(ca) AS BIGINT) AS na,
        |    CAST(SUM(cb) AS BIGINT) AS nb FROM (
        |    SELECT la AS l, 1 AS ca, 0 AS cb FROM p
        |    UNION ALL SELECT lb, 0, 1 FROM p) GROUP BY l),
        |pe AS (SELECT CAST(COALESCE(SUM(na * nb), 0) AS BIGINT)
        |  AS pe_num FROM m)
        |SELECT n_items, agree, pe_num,
        |  agree * n_items - pe_num AS kappa_num,
        |  n_items * n_items - pe_num AS kappa_den,
        |  CAST(agree * n_items - pe_num AS DOUBLE)
        |    / CAST(n_items * n_items - pe_num AS DOUBLE) AS kappa
        |FROM base, pe""".stripMargin

  /** q192 — Fleiss' kappa over items rated by exactly 5 annotators
    * ([[graft.operators.Annotation.fleissKappa]]): multi-rater
    * agreement, same exact-integer discipline —
    * `((S2 − Nn)·Nn − Se(n−1)) / ((Nn)²(n−1) − Se(n−1))` with one
    * double division at the edge.
    */
  def qFleissKappa(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Annotation
      .fleissKappa(annotationVotes(spark, dir), "item", "label", n = 5)

  val qFleissKappaSql: String =
    annotationVotesSqlCte + ",\n" +
      """cells AS (
        |  SELECT item, label, CAST(COUNT(*) AS BIGINT) AS nij
        |  FROM v GROUP BY 1, 2),
        |ok AS (SELECT item FROM cells GROUP BY item HAVING SUM(nij) = 5),
        |q AS (SELECT cells.* FROM cells JOIN ok USING (item)),
        |s AS (
        |  SELECT CAST(COUNT(DISTINCT item) AS BIGINT) AS n_items,
        |    CAST(COALESCE(SUM(nij * nij), 0) AS BIGINT) AS s2 FROM q),
        |e AS (
        |  SELECT CAST(COALESCE(SUM(cs * cs), 0) AS BIGINT) AS se FROM (
        |    SELECT SUM(nij) AS cs FROM q GROUP BY label)),
        |k AS (
        |  SELECT n_items, s2, se, n_items * 5 AS nn FROM s, e)
        |SELECT n_items, s2, se,
        |  (s2 - nn) * nn - se * 4 AS kappa_num,
        |  nn * nn * 4 - se * 4 AS kappa_den,
        |  CAST((s2 - nn) * nn - se * 4 AS DOUBLE)
        |    / CAST(nn * nn * 4 - se * 4 AS DOUBLE) AS kappa
        |FROM k""".stripMargin
}
