package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental maintenance of a grouped (count, sum) aggregate from a
  * change data feed ([[MergeOps.changeFeed]]), instead of recomputing
  * over the full table: at 100 TB a daily merge touches a fraction of a
  * percent of rows, so the delta aggregation runs over the CHANGES only
  * (tiny), followed by ONE keyed join against the existing aggregate —
  * never a full-table scan. `insert`/`update_postimage` rows add,
  * `delete`/`update_preimage` rows subtract (a row whose group changes
  * between pre and post therefore moves exactly one unit of count and
  * its value between the two groups). Sums are carried as
  * DECIMAL(28,6) so addition is exact and the incremental result is
  * bit-identical to a full recompute — the property the oracle checks.
  */
object IncrementalAgg {

  private val Dec = DecimalType(28, 6)

  /** The aggregate this module maintains: per-`groupCol` row count and
    * decimal sum of `valueCol`. Run once over the base table to seed.
    */
  def countSum(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol).cast(Dec)).as("s"))

  /** Fold a change feed into an existing [[countSum]] aggregate.
    * Returns the maintained aggregate; groups whose count reaches zero
    * disappear, groups first seen in the changes appear.
    */
  def applyChanges(
      agg: DataFrame,
      changes: DataFrame,
      groupCol: String,
      valueCol: String
  ): DataFrame = {
    val adds: Column =
      col("_change_type").isin("insert", "update_postimage")
    val delta = changes
      .groupBy(col(groupCol))
      .agg(sum(when(adds, 1L).otherwise(-1L)).as("__dn"),
        sum(when(adds, col(valueCol)).otherwise(-col(valueCol))
          .cast(Dec)).as("__ds"))
    val zero = lit(0).cast(agg.schema("s").dataType)
    // null-safe join key: a null group must merge into ONE row, like
    // GROUP BY's null group in a full recompute — a plain equi-join
    // would pass the base and delta null-group rows through unmerged
    val d = delta.withColumnRenamed(groupCol, "__g")
    agg
      .join(d, col(groupCol) <=> col("__g"), "full_outer")
      .select(coalesce(col(groupCol), col("__g")).as(groupCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n"),
        (coalesce(col("s"), zero) +
          coalesce(col("__ds").cast(agg.schema("s").dataType), zero))
          .as("s"))
      .filter(col("n") > 0)
  }
}
