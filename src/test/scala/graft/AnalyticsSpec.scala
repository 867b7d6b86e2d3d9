package graft

import graft.operators.{DupSpans, FuzzyJoin, Sampling, TimeSeries}
import graft.queries.AnalyticsQueries
import org.apache.spark.sql.functions._

/** Semantics of the round-5 analytics operators: calendar gap-fill,
  * duplicated-span removal accounting, blocked fuzzy matching, priority
  * sampling, and the rollup/pivot/rolling query shapes.
  */
class AnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---- TimeSeries -------------------------------------------------------

  test("gapFill zero-fills counts and carries levels forward per key") {
    val daily = Seq(
      ("a", "2024-01-01", 3L, 10.0),
      ("a", "2024-01-03", 1L, 30.0),
      ("b", "2024-01-04", 2L, 99.0)
    ).toDF("k", "day", "n", "level")
      .withColumn("day", to_date(col("day")))
    val bounds = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val keys = daily.select("k").distinct()
    val out = TimeSeries
      .gapFill(TimeSeries.calendarSpine(bounds, keys), daily,
        Seq("k"), "day", zeroFill = Seq("n"), forwardFill = Seq("level"))
      .select("k", "day", "n", "level")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3)))
      .toSet
    assert(out === Set(
      ("a", "2024-01-01", 3L, 10.0),
      ("a", "2024-01-02", 0L, 10.0), // gap: zero count, carried level
      ("a", "2024-01-03", 1L, 30.0),
      ("a", "2024-01-04", 0L, 30.0),
      ("b", "2024-01-01", 0L, 0.0), // before first observation
      ("b", "2024-01-02", 0L, 0.0),
      ("b", "2024-01-03", 0L, 0.0),
      ("b", "2024-01-04", 2L, 99.0)
    ))
  }

  // ---- DupSpans ---------------------------------------------------------

  test("dupSpanStats unions overlapping duplicated windows per doc") {
    // E and F share two OVERLAPPING 8-grams (x1..x8 and x2..x9): the
    // union must cover 9 tokens, not 16.
    val e = (1 to 9).map(i => s"x$i").mkString(" ")
    val f = e + " w"
    // short-doc convention: whole-text single gram; identical short docs
    // are fully covered
    val docs = Seq(
      (1L, e), (2L, f),
      (3L, "s1 s2 s3"), (4L, "s1 s2 s3"),
      (5L, "z1 z2 z3 z4 z5")
    ).toDF("doc_id", "text")
    val out = DupSpans
      .dupSpanStats(docs, "doc_id", col("text"), n = 8)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) === ((9L, 9L, 0.0)))
    assert(out(2L) === ((10L, 9L, 0.1)))
    assert(out(3L) === ((3L, 3L, 0.0)))
    assert(out(4L) === ((3L, 3L, 0.0)))
    assert(out(5L) === ((5L, 0L, 1.0)))
  }

  test("dupSpanStats keeps docs with no grams and handles empty text") {
    val docs = Seq((1L, ""), (2L, "only unique tokens here"))
      .toDF("doc_id", "text")
    val out = DupSpans
      .dupSpanStats(docs, "doc_id", col("text"), n = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) === ((0L, 0L, 1.0)))
    assert(out(2L) === ((4L, 0L, 1.0)))
  }

  // ---- FuzzyJoin --------------------------------------------------------

  test("blockedNamePairs pairs only within blocks, once, with counts") {
    val rows = Seq("red widget", "red widget", "hot widget", "red gizmo",
      "rad widget").toDF("name")
    val out = FuzzyJoin
      .blockedNamePairs(rows, "name",
        n => regexp_extract(n, "(\\S+)$", 1), maxDist = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    // "red gizmo" is blocked apart; "hot"/"rad" vs "red" are within 3
    // edits of each other pairwise; pairs are emitted name_a < name_b
    assert(out === Set(
      ("hot widget", "rad widget", 3L, 1L, 1L),
      ("hot widget", "red widget", 3L, 1L, 2L),
      ("rad widget", "red widget", 1L, 1L, 2L)
    ))
  }

  // ---- Sampling ---------------------------------------------------------

  test("prioritySample is deterministic, capped, and weight-sensitive") {
    val df = (1L to 200L).map(i => (i, i % 7 + 1)).toDF("id", "w")
    val s1 = Sampling.prioritySample(df, "id", col("w"), 20, "s")
      .select("id").as[Long].collect().toSeq
    val s2 = Sampling.prioritySample(df, "id", col("w"), 20, "s")
      .select("id").as[Long].collect().toSeq
    assert(s1 === s2)
    assert(s1.size === 20)
    // a different seed reshuffles the sample
    val s3 = Sampling.prioritySample(df, "id", col("w"), 20, "t")
      .select("id").as[Long].collect().toSeq
    assert(s1 !== s3)
    // zero/negative weights are excluded entirely
    val withBad = df.withColumn("w",
      when(col("id") <= 190, lit(0L)).otherwise(col("w")))
    val s4 = Sampling.prioritySample(withBad, "id", col("w"), 20, "s")
      .select("id").as[Long].collect().toSeq
    assert(s4.toSet.subsetOf((191L to 200L).toSet) && s4.size === 10)
  }

  test("prioritySample favors heavier rows at equal uniforms") {
    // same id twice (same u), different weight: the heavy twin must
    // outrank the light one
    val df = Seq((1L, 1L, "light"), (1L, 1000L, "heavy"))
      .toDF("id", "w", "tag")
    val top = Sampling.prioritySample(df, "id", col("w"), 1, "s")
      .select("tag").as[String].collect()
    assert(top === Array("heavy"))
  }

  // ---- query shapes on real data ---------------------------------------

  test("q93 rollup gids partition the output into the three groupings") {
    val rows = AnalyticsQueries.q93Rollup(spark, sf).collect()
    val byGid = rows.groupBy(_.getLong(4))
    assert(byGid.keySet === Set(0L, 1L, 3L))
    assert(byGid(3L).length === 1) // grand total
    // per-priority super-rows roll up their detail rows exactly
    val details = byGid(0L).groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val supers = byGid(1L).map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(details === supers)
    assert(byGid(1L).forall(r => r.isNullAt(1))) // status nulled
  }

  test("q94 pivot buckets cover all users and zero-fill missing cells") {
    val out = AnalyticsQueries.q94Pivot(spark, sf)
    assert(out.columns.toSet ===
      Set("bucket", "click", "error", "purchase", "signup", "view"))
    val rows = out.collect()
    assert(rows.forall(r => (1 until 6).forall(i => !r.isNullAt(i))))
  }

  test("q98 transition probabilities sum to 1 per source type") {
    val sums = AnalyticsQueries.q98Transitions(spark, sf)
      .groupBy("from_type").agg(sum("p").as("s"))
      .select("s").as[Double].collect()
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }

  test("q100 rolling frames: roll7 equals the trailing-7 daily sums") {
    val rows = AnalyticsQueries.q100Rolling(spark, sf)
      .orderBy("day").collect()
    val daily = rows.map(_.getDouble(2))
    rows.zipWithIndex.foreach { case (r, i) =>
      val lo = math.max(0, i - 6)
      val expect = daily.slice(lo, i + 1).sum
      assert(math.abs(r.getDouble(3) - expect) < 1e-6,
        s"roll7 at $i")
    }
    // cumulative is monotone and ends at the total
    assert(math.abs(rows.last.getDouble(5) - daily.sum) < 1e-6)
  }
}
