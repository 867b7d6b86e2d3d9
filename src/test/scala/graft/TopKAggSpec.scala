package graft

import graft.operators.TopKDoubles
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpecBase {
  import spark.implicits._

  test("reduce/merge keep the k largest in sorted order") {
    val agg = new TopKDoubles(3)
    val buf = Seq(5.0, 1.0, 3.0, 9.0, 2.0, 9.0, 0.5)
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.toSeq === Seq(9.0, 9.0, 5.0)) // duplicates retained
    val merged = agg.merge(Array(8.0, 4.0), Array(9.0, 6.0, 1.0))
    assert(merged.toSeq === Seq(9.0, 8.0, 6.0))
    assert(agg.merge(agg.zero, agg.zero).toSeq === Seq.empty)
  }

  test("NaN input is skipped, not admitted into the sorted buffer") {
    // NaN comparisons are all false: an admitted NaN would sit at the
    // front and poison later binary searches/merges
    val agg = new TopKDoubles(3)
    val buf = Seq(Double.NaN, 5.0, Double.NaN, 1.0, 3.0, 9.0, Double.NaN)
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.toSeq === Seq(9.0, 5.0, 3.0))
    assert(agg.reduce(agg.zero, Double.NaN).toSeq === Seq.empty)
  }

  test("grouped top-k equals sort-desc-take-k across many partitions") {
    val topk = udaf(new TopKDoubles(4))
    val df = spark.range(1000)
      .select((col("id") % 7).cast("string").as("g"),
        ((col("id") * 37) % 101).cast("double").as("v"))
      .repartition(16) // force real partial-buffer merges
    val got = df.groupBy("g").agg(topk(col("v")).as("top"))
      .collect()
      .map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Double]](1).toSeq).toMap
    val want = df.collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.map(_.getDouble(1)).sorted.reverse.take(4).toSeq
      }
    assert(got === want)
  }
}
