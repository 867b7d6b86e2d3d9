package graft

import graft.functions.TextFunctions
import graft.operators.TemporalJoins
import graft.queries.CorpusQueries
import graft.streaming.EventStreams
import graft.tables.Tables
import org.apache.spark.sql.functions._

class CorpusQueriesSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("sketched gram cardinality stays within 5% of the exact count") {
    val exact = Tables.documents(spark, sf)
      .select(col("source"),
        explode(TextFunctions.md5Grams60Udf(col("text"), lit(5))).as("h"))
      .groupBy("source")
      .agg(countDistinct(col("h")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = CorpusQueries.qSketchDistinct(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (src, a) =>
      val e = exact(src)
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"$src: approx $a vs exact $e")
    }
  }

  test("first-touch attribution matches the interval-join pair minimum") {
    // the bucketed firstTouchJoin and the plain interval join are two
    // routes to the same answer — cross-check them on real events
    val events = Tables.events(spark, sf)
    val viaPairs = EventStreams.attributionPairs(events, "30 minutes")
      .groupBy("purchase_id")
      .agg(min(struct(col("c_ts"), col("click_id"))).as("m"))
      .select(col("purchase_id"), col("m.click_id").as("first_click_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaBuckets = graft.queries.TemporalQueries.qAttribution(spark, sf)
      .filter(col("first_click_id").isNotNull)
      .select("purchase_id", "first_click_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaBuckets === viaPairs)
    // and purchases with no prior click survive with nulls
    val total = graft.queries.TemporalQueries.qAttribution(spark, sf).count()
    val purchases = events.filter(col("event_type") === "purchase").count()
    assert(total === purchases)
  }

  test("deflate ratio separates redundant from diverse text") {
    val redundant = ("spam " * 400).trim
    val diverse = (1 to 400).map(i => s"w${i}x${i * 7 % 97}").mkString(" ")
    val df = Seq(("r", redundant), ("d", diverse)).toDF("k", "text")
    val m = df.select(col("k"),
      TextFunctions.deflateRatioUdf(col("text")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("r") < 0.1, s"repetition should compress hard: ${m("r")}")
    assert(m("d") > 0.3, s"diverse text should not: ${m("d")}")
    // empty text defined as ratio 1.0 (no evidence of redundancy)
    val e = Seq("").toDF("text")
      .select(TextFunctions.deflateRatioUdf(col("text"))).head().getDouble(0)
    assert(e === 1.0)
  }

  test("wordNgramsKernel agrees with the expression-form wordNgrams") {
    val df = Seq("one two three four five", "short", "").toDF("text")
    val a = df.select(TextFunctions.wordNgrams(col("text"), 3).as("g"))
      .collect().map(_.getSeq[String](0).toList).toList
    val b = df.select(TextFunctions.wordNgramsKernel(col("text"), 3).as("g"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(a === b)
  }

  test("null text yields no grams under explode (kernel and md5 forms)") {
    // the expression form propagates NULL and explode emits nothing;
    // the kernels must match (a [\"\"] would fabricate one gram per doc)
    val df = Seq(Some("a b c d e"), None).toDF("text")
    val kernel = df.select(explode(
      TextFunctions.wordNgramsKernel(col("text"), 3)).as("g")).count()
    val md5g = df.select(explode(
      TextFunctions.md5Grams60Udf(col("text"), lit(5))).as("h")).count()
    assert(kernel === 3) // only the non-null doc's 3-grams (5 tokens)
    assert(md5g === 1) // 5 tokens → one 5-gram; null doc contributes none
  }

  test("leakage-safe split: components never straddle splits; ~80/10/10") {
    val rows = CorpusQueries.qLeakageSplit(spark, sf).collect()
    assert(rows.nonEmpty)
    // one split per component — the leakage guarantee
    val perComp = rows.groupBy(_.getLong(1))
      .map { case (_, rs) => rs.map(_.getString(2)).distinct.length }
    assert(perComp.forall(_ === 1))
    // deterministic rerun
    val again = CorpusQueries.qLeakageSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    assert(rows.forall(r => again(r.getLong(0)) === r.getString(2)))
    // group-level fractions roughly honor 80/10/10 (binomial slack)
    val comps = rows.map(r => (r.getLong(1), r.getString(2))).distinct
    val n = comps.length.toDouble
    val frac = comps.groupBy(_._2).view.mapValues(_.length / n).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, frac)
    assert(frac.getOrElse("val", 0.0) < 0.2 && frac.getOrElse("test", 0.0) < 0.2)
  }
}
