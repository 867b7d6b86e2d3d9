package graft

import org.apache.spark.sql.functions._

/** Proves the co-located-join scale story: two tables bucketed on the
  * join key by the SAME bucket count join WITHOUT a shuffle exchange —
  * the plan Spark produces when bucketing metadata lines up, and the
  * reason GraftTable's key-hash bucket layout matters beyond
  * incremental merges (PERF.md "Why the shapes hold").
  */
class BucketedJoinSpec extends SparkSpecBase {

  test("equal-bucketed tables join with no shuffle exchange") {
    // OWN session: suites run in parallel and this one must disable
    // auto-broadcast — newSession() gives it a private SQLConf so the
    // flip can't race another suite's plan assertions
    val s = spark.newSession()
    import s.implicits._
    // warehouse dir is a static conf — use the session default
    s.sql("DROP TABLE IF EXISTS bkt_left")
    s.sql("DROP TABLE IF EXISTS bkt_right")
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
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("bkt_left")
        .join(s.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      val rows = joined.select("k", "v", "w").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(rows === Set((1L, "a", 10.0), (2L, "b", 20.0)))
    } finally {
      s.sql("DROP TABLE IF EXISTS bkt_left")
      s.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
