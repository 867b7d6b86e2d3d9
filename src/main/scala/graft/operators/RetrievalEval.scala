package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-quality metrics for a retrieval run ([[Bm25]], [[Similarity]],
  * [[RankFusion]]) against a relevance-labeled table: recall@k and MRR.
  *
  * Both metrics are ratios of exact integers (hits/|relevant|, 1/rank),
  * so — unlike nDCG's log2 discounts — they are bit-identical across
  * engines and the oracle hash-checks them. Shape: one join of the
  * ranked rows (queries × k, never corpus-sized) against the relevance
  * table on (query, doc), then one aggregate per side; queries with no
  * relevant hit keep a row (recall 0, mrr 0) via the right join back to
  * the per-query relevant counts.
  */
object RetrievalEval {

  /** @param ranked   (queryCol, rankCol, docCol) rows, rank 1-based
    * @param relevant (queryCol, docCol) rows — the qrels
    * @return (query_id, n_relevant, hits, recall_at_k, mrr) — one row
    *         per query that HAS relevance judgments; `hits` counts
    *         relevant docs inside the ranked list, `mrr` is 1/rank of
    *         the first relevant hit (0.0 when none)
    */
  def metrics(
      ranked: DataFrame,
      queryCol: String,
      rankCol: String,
      docCol: String,
      relevant: DataFrame,
      relQueryCol: String,
      relDocCol: String
  ): DataFrame = {
    val rel = relevant.select(col(relQueryCol).as("query_id"),
      col(relDocCol).as("__doc"))
    val nRel = rel.groupBy("query_id")
      .agg(count(lit(1)).as("n_relevant"))
    val hits = ranked
      .select(col(queryCol).as("query_id"), col(rankCol).as("__rank"),
        col(docCol).as("__doc"))
      .join(rel, Seq("query_id", "__doc"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("hits"), min(col("__rank")).as("__minrank"))
    nRel.join(hits, Seq("query_id"), "left")
      .select(
        col("query_id"),
        col("n_relevant"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          col("n_relevant").cast("double")).as("recall_at_k"),
        when(col("__minrank").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("__minrank").cast("double")).as("mrr"))
  }
}
