package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-example mining over retrieval results — the operator that
  * turns a ranked candidate list plus relevance judgments into the
  * (anchor, positive, hard-negative) triples contrastive embedding /
  * reranker training consumes (the DPR / sentence-transformers
  * recipe: negatives that RANK high but are NOT relevant).
  */
object Mining {

  /** Hard negatives: the top `nNeg` ranked candidates per query that
    * are absent from the relevance set.
    *
    * `ranked` is any (queryCol, docCol, rankCol) frame — brute-force
    * cosine ([[Similarity.bruteForceTopK]]), ANN, BM25, or fused;
    * `relevant` is the (queryCol, docCol) judgment set. The join is a
    * LEFT ANTI on (query, doc) — at scale both sides hash on the same
    * compound key, and the re-rank window rides the ranked side's
    * existing per-query grouping; nothing is ever collected.
    *
    * Output: (query, doc, orig_rank, neg_rank) with `neg_rank` the
    * 1-based position among the query's surviving negatives, ordered
    * by original rank.
    */
  def hardNegatives(
      ranked: DataFrame,
      queryCol: String,
      docCol: String,
      rankCol: String,
      relevant: DataFrame,
      relQueryCol: String,
      relDocCol: String,
      nNeg: Int): DataFrame = {
    require(nNeg > 0, s"nNeg must be positive, got $nNeg")
    val rel = relevant.select(
      col(relQueryCol).as("__rq"), col(relDocCol).as("__rd"))
    ranked
      .join(rel,
        col(queryCol) === col("__rq") && col(docCol) === col("__rd"),
        "left_anti")
      .withColumn("neg_rank",
        row_number().over(
          Window.partitionBy(queryCol).orderBy(col(rankCol))))
      .filter(col("neg_rank") <= nNeg)
      .select(col(queryCol), col(docCol),
        col(rankCol).cast("long").as("orig_rank"),
        col("neg_rank").cast("long").as("neg_rank"))
  }
}
