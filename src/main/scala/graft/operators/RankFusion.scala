package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009) — the standard
  * way to combine a lexical ([[Bm25]]) and a dense ([[Similarity]])
  * ranking into one hybrid retrieval list without score calibration:
  * each list contributes 1/(c + rank) per document and the fused order
  * is by the summed contribution.
  *
  * Scale shape: one hash aggregate keyed on (query, doc) over the
  * concatenated ranked lists (whose size is queries × k per source, not
  * corpus-sized), then the per-query top-k window. Contributions are
  * single IEEE divisions of exact integers and the cross-source sum
  * folds in sorted-source order, so the fused score is bit-identical
  * across engines (same discipline as [[Bm25]] — this is what lets the
  * DuckDB oracle hash-check q103 end to end).
  */
object RankFusion {

  /** Fuses ranked lists into a per-query top-k.
    *
    * @param ranked (queryCol, docCol, rankCol, sourceCol) rows — one row
    *               per (query, doc, source list); (query, doc, source)
    *               must be unique
    * @param c      the RRF damping constant (60 in the original paper)
    * @return (query id, fused rank 1..k, doc id, rrf_score)
    */
  def rrf(
      ranked: DataFrame,
      queryCol: String,
      docCol: String,
      rankCol: String,
      sourceCol: String,
      k: Int,
      c: Int = 60
  ): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(c >= 0, s"c must be non-negative: $c")
    val contrib = lit(1.0) / (lit(c.toLong) + col(rankCol)).cast("double")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    ranked
      .select(col(queryCol).as("query_id"), col(docCol).as("doc_id"),
        col(sourceCol).as("__src"), contrib.as("__c"))
      .groupBy("query_id", "doc_id")
      // deterministic fold order over sources — the distributed-sum
      // order flake cannot reach the oracle compare
      .agg(aggregate(
        sort_array(collect_list(struct(col("__src"), col("__c")))),
        lit(0.0),
        (acc, x) => acc + x.getField("__c")).as("rrf_score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf_score"))
  }
}
