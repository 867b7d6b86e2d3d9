package graft

import graft.operators.{Checks, Profiling}
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpecBase {
  import spark.implicits._

  test("checks evaluate metrics and verdicts in one pass") {
    val df = Seq((Some(1), Some("a")), (Some(1), None), (Some(2), Some("b")))
      .toDF("id", "v")
    val n = count(lit(1)).cast("double")
    val out = Checks.run(df, Seq(
      Checks.CheckDef("rows", n, _ > 0.0),
      Checks.CheckDef("id_unique",
        countDistinct(col("id")).cast("double") / n, _ == 1.0),
      Checks.CheckDef("v_complete",
        count(col("v")).cast("double") / n, _ == 1.0)
    )).collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(out("rows") === ((3.0, true)))
    assert(out("id_unique")._1 === 2.0 / 3.0)
    assert(!out("id_unique")._2)
    assert(out("v_complete") === ((2.0 / 3.0, false)))
  }

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
