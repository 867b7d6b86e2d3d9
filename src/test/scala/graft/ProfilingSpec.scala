package graft

import graft.operators.Profiling

class ProfilingSpec extends SparkSpecBase {
  import spark.implicits._

  test("profile counts rows, nulls, and exact distincts per column") {
    val df = Seq(
      (Some(1), Some("a")),
      (Some(1), None),
      (Some(2), Some("b")),
      (None, Some("b"))
    ).toDF("x", "s")
    val got = Profiling.profile(df, Seq("x", "s"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3))))
      .toMap
    assert(got("x") === ((4L, 1L, 2L)))
    assert(got("s") === ((4L, 1L, 2L)))
  }

  test("profile is one aggregation job (single Expand plan)") {
    val df = Seq((1, "a")).toDF("x", "s")
    val plan = Profiling.profile(df, Seq("x", "s"))
      .queryExecution.optimizedPlan.toString
    // one Aggregate chain over an Expand — no join of per-column passes
    assert(plan.contains("Expand"))
    assert(!plan.contains("Join"))
  }
}
