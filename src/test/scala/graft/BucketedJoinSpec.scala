package graft

import org.apache.spark.sql.functions._

/** Proves the co-located-join scale story: two tables bucketed on the
  * join key by the SAME bucket count join WITHOUT a shuffle exchange —
  * the plan Spark produces when bucketing metadata lines up, and the
  * reason GraftTable's key-hash bucket layout matters beyond
  * incremental merges (PERF.md "Why the shapes hold").
  */
class BucketedJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("equal-bucketed tables join with no shuffle exchange") {
    // warehouse dir is a static conf — use the session default
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    try {
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
        .toDF("k", "v")
        .write.bucketBy(4, "k").sortBy("k")
        .mode("overwrite").saveAsTable("bkt_left")
      Seq((1L, 10.0), (2L, 20.0), (5L, 50.0))
        .toDF("k", "w")
        .write.bucketBy(4, "k").sortBy("k")
        .mode("overwrite").saveAsTable("bkt_right")

      // disable broadcast so the join would otherwise shuffle
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("bkt_left")
          .join(spark.table("bkt_right"), "k")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join should not shuffle:\n$plan")
        val rows = joined.select("k", "v", "w").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
        assert(rows === Set((1L, "a", 10.0), (2L, "b", 20.0)))
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
