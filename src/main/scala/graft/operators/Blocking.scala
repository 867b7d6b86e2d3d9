package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sorted-neighborhood blocking for entity resolution (Hernández &
  * Stolfo's merge/purge): sort the corpus by a fuzzy blocking key and
  * emit each record paired with its `window - 1` successors in the
  * global sort order. Complements the equi-key blocking in
  * [[FuzzyJoin]] — sorted neighborhoods catch near-matches whose
  * blocking keys differ (typos in the first character, shifted
  * prefixes) that hash blocking can never pair.
  *
  * Scale shape: a range-partitioned sort (no single-partition window —
  * the global rank comes from `zipWithIndex` over the sorted
  * partitions, one extra count job), then an equi-join of the corpus
  * with itself on `rank + k` for k in 1..window-1. Both join sides
  * shuffle on a dense rank key, so there is no skew regardless of key
  * distribution, and the blow-up factor is exactly `window - 1`.
  */
object Blocking {

  /** Candidate pairs (l_key, l_id, r_key, r_id) for every record and its
    * `window - 1` successors under the total order (keyCol, idCol).
    * `idCol` must be unique; it makes the order — and therefore the pair
    * set — deterministic even when blocking keys collide.
    */
  def sortedNeighborPairs(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      window: Int): DataFrame = {
    require(window >= 2, "window must pair each record with >=1 neighbor")
    val spark = df.sparkSession
    val base = df.select(col(keyCol).as("k"), col(idCol).as("id"))
      .repartitionByRange(col("k"), col("id"))
      .sortWithinPartitions(col("k"), col("id"))
    // global rank without a single-partition window: partitions are
    // range-ordered, so partition-order indexing IS the total order
    val schema = StructType(
      base.schema.fields :+ StructField("rnk", LongType, nullable = false))
    val ranked = spark.createDataFrame(
      base.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
      // both join sides scan this frame; unmaterialized, the range sort
      // would run once per scan on top of zipWithIndex's size-count job
      .localCheckpoint(true)
    val offsets = spark.range(1, window.toLong).select(col("id").as("off"))
    val probes = ranked.crossJoin(broadcast(offsets))
      .select(col("k").as("l_key"), col("id").as("l_id"),
        (col("rnk") + col("off")).as("rhs"))
    val targets = ranked.select(col("k").as("r_key"), col("id").as("r_id"),
      col("rnk").as("rhs"))
    probes.join(targets, "rhs")
      .select(col("l_key"), col("l_id"), col("r_key"), col("r_id"))
  }
}
