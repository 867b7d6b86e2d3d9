package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension builder — turn an append-only
  * change stream into validity-interval history rows, the standard
  * warehouse shape for "what was this attribute at time T" queries
  * (and the batch twin of the reference's lastUpdated-guarded merge,
  * `formats/deltalake.py:187-232`, which keeps only the LATEST version;
  * SCD2 keeps them all).
  *
  * Semantics, per key:
  *   1. order the stream deterministically by (orderCol, tieCol) —
  *      tieCol must make the ordering total or versions are
  *      nondeterministic under shuffle;
  *   2. compress consecutive runs of the same attribute value to one
  *      row (null-safe comparison, so null→null is "no change");
  *   3. each surviving change opens an interval `[valid_from,
  *      valid_to)` closed by the next change; the open interval is the
  *      current version (`is_current`), and `version` numbers the
  *      history 1..n.
  *
  * Scale shape: ONE hash exchange on the key columns; both window
  * passes (the lag compression and the lead/row_number interval
  * assembly) and the run-compression filter reuse it — the filter
  * preserves sort order, so the second pass re-sorts partitions
  * without reshuffling. No driver state, no joins; skew follows the
  * hottest key's CHANGE count, not its raw event count, because
  * compression happens before interval assembly... per-partition both
  * passes stream in sorted order.
  */
object Scd2 {

  def build(
      changes: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "SCD2 needs at least one key column")
    val keys = keyCols.map(col)
    val ordered = Window.partitionBy(keys: _*)
      .orderBy(col(orderCol), col(tieCol))
    val compressed = changes
      .withColumn("__prev", lag(col(valueCol), 1).over(ordered))
      .withColumn("__first", row_number().over(ordered) === 1)
      // null-safe: a genuine null value is a version too, but a
      // null→null run is still one version
      .filter(col("__first") || !(col(valueCol) <=> col("__prev")))
    val byStart = Window.partitionBy(keys: _*)
      .orderBy(col(orderCol), col(tieCol))
    compressed
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(byStart))
      .withColumn("version", row_number().over(byStart).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keys ++ Seq(col(valueCol), col("valid_from"),
        col("valid_to"), col("version"), col("is_current")): _*)
  }
}
