package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: calendar spines, gap zero-fill, and
  * forward-fill of sparse metrics (SURVEY §7.5 — the resampling step a
  * metrics/training pipeline needs before windowed feature extraction).
  *
  * Scale shape: both inputs to [[gapFill]] are POST-aggregation frames
  * (a spine of |days| × |keys| rows and a per-(key, day) rollup), so the
  * join and the per-key forward-fill window operate on data already
  * reduced from the raw corpus — at 100 TB the only full-size pass is
  * the caller's daily aggregation, which map-side combines.
  */
object TimeSeries {

  /** Dense (day × key) spine. `bounds` is a single-row frame with `d0`
    * and `d1` date columns (min/max of the observed range — an aggregate
    * the caller derives, so the spine never silently extends past the
    * data); `keys` is the distinct key frame. Both are tiny; Spark
    * broadcast-joins the cross product.
    */
  def calendarSpine(bounds: DataFrame, keys: DataFrame): DataFrame =
    bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .crossJoin(keys)

  /** Left-join `daily` metrics onto the dense `spine`, then repair the
    * gaps: `zeroFill` columns get 0 (counts — a missing day really is
    * zero events), `forwardFill` columns carry the last observed value
    * per key series (level metrics — a missing day keeps the prior
    * level), 0.0 before the first observation.
    *
    * The forward-fill window is `rowsBetween(unboundedPreceding, 0)` per
    * key ordered by day — per-series state bounded by |days|, never
    * corpus-sized.
    */
  def gapFill(
      spine: DataFrame,
      daily: DataFrame,
      keyCols: Seq[String],
      dayCol: String,
      zeroFill: Seq[String],
      forwardFill: Seq[String]): DataFrame = {
    val joined = spine.join(daily, keyCols :+ dayCol, "left")
    val zeroed = zeroFill.foldLeft(joined) { (df, c) =>
      df.withColumn(c, coalesce(col(c), lit(0L)))
    }
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    forwardFill.foldLeft(zeroed) { (df, c) =>
      df.withColumn(c, coalesce(last(col(c), ignoreNulls = true).over(w),
        lit(0.0)))
    }
  }
}
