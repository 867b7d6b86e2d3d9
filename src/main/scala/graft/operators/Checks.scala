package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deequ-style declarative data-quality constraints: each check is a
  * named aggregate metric plus a pass predicate, and ALL metrics run in
  * ONE aggregation pass over the table (multiple count-distincts plan
  * as a single Expand, the same shape as [[Profiling]]) — at 100 TB the
  * whole quality gate costs one scan, and the result is a tiny
  * (check, metric, passed) report the pipeline asserts on before a
  * training run consumes the table.
  */
object Checks {

  /** One constraint: an aggregate metric expression (cast to double)
    * and the predicate its value must satisfy.
    */
  final case class CheckDef(
      name: String,
      metric: Column,
      pass: Double => Boolean
  )

  /** Evaluate all checks in one aggregation pass; returns
    * (check_name, metric, passed) — one row per check.
    */
  def run(df: DataFrame, checks: Seq[CheckDef]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val spark = df.sparkSession
    import spark.implicits._
    val row = df.agg(
      checks.head.metric.cast("double").as("m0"),
      checks.tail.zipWithIndex.map { case (c, i) =>
        c.metric.cast("double").as(s"m${i + 1}")
      }: _*).head()
    checks.zipWithIndex.map { case (c, i) =>
      // a metric can be null (e.g. a ratio over an empty table):
      // surface it as NaN so the pass predicate decides explicitly
      // rather than this throwing on unboxing
      val m = if (row.isNullAt(i)) Double.NaN else row.getDouble(i)
      (c.name, m, c.pass(m))
    }.toDF("check_name", "metric", "passed")
  }
}
