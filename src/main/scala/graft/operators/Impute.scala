package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-value repair for feature pipelines: fill nulls with the
  * per-group exact discrete median of the observed values. The median
  * follows the repo's value-histogram discipline (aggregate counts per
  * (group, value), pick the order statistic from cumulative counts) —
  * the shuffle is bounded by |groups|·|distinct values|, never raw
  * rows, and the lower-rank convention keeps the fill an exact input
  * value, so an engine-independent oracle can reproduce it
  * bit-for-bit. The per-group median frame joins back onto the stream
  * (AQE broadcasts it when |groups| is small — not forced, so a
  * high-cardinality group column cannot OOM the driver).
  */
object Impute {

  /** `df` with nulls in `valCol` replaced by the group's median and a
    * boolean `imputed` flag appended. Groups whose values are ALL null
    * keep their nulls (flagged imputed, nothing to fill with).
    */
  def medianImpute(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val counts = df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(valCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(groupCol).orderBy("v")
    val wAll = Window.partitionBy(groupCol)
    val k = ceil(col("n") * 0.5)
    val med = counts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy(groupCol)
      .agg(max(when(col("cum") - col("c") < k && k <= col("cum"), col("v")))
        .as("_med"))
    // no broadcast() hint: the median frame is one row per GROUP, which
    // is data-dependent cardinality — a forced driver broadcast is the
    // exact OOM shape the repo removed from Boilerplate (commit
    // ffc01bc). AQE broadcasts it at runtime whenever it is actually
    // small; a high-cardinality groupCol degrades to a sort-merge join
    // instead of degrading to a dead driver.
    df.join(med, Seq(groupCol), "left")
      .withColumn("imputed", col(valCol).isNull)
      .withColumn(valCol, coalesce(col(valCol), col("_med")))
      .drop("_med")
  }

  /** Winsorization twin: clip `valCol` to the group's exact discrete
    * [pLow, pHigh] percentiles (lower-rank order statistics at
    * `ceil(n·p)` — always actual input values, so engines agree
    * bit-for-bit). Appends `<valCol>_w` (the clipped value),
    * `clip_low`/`clip_high` flags, and the `p_low`/`p_high` bounds.
    * Null values pass through un-clipped and un-flagged. Same scale
    * shape as the median: the only shuffle is the per-(group, value)
    * count histogram; bounds join back (AQE-broadcast when small).
    */
  def winsorize(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      pLow: Double,
      pHigh: Double): DataFrame = {
    require(0 < pLow && pLow < pHigh && pHigh < 1,
      "need 0 < pLow < pHigh < 1")
    val counts = df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(valCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(groupCol).orderBy("v")
    val wAll = Window.partitionBy(groupCol)
    val kLo = ceil(col("n") * pLow)
    val kHi = ceil(col("n") * pHigh)
    def pick(k: org.apache.spark.sql.Column) =
      max(when(col("cum") - col("c") < k && k <= col("cum"), col("v")))
    val bounds = counts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy(groupCol)
      .agg(pick(kLo).as("p_low"), pick(kHi).as("p_high"))
    // same no-hint rationale as medianImpute: |groups| is data-dependent
    df.join(bounds, Seq(groupCol), "left")
      .withColumn("clip_low", coalesce(col(valCol) < col("p_low"), lit(false)))
      .withColumn("clip_high", coalesce(col(valCol) > col("p_high"), lit(false)))
      // Spark's greatest/least IGNORE nulls — unguarded, a null value
      // would come out clipped to p_low instead of staying null
      .withColumn(s"${valCol}_w",
        when(col(valCol).isNull, col(valCol))
          .otherwise(least(greatest(col(valCol), col("p_low")),
            col("p_high"))))
  }
}
