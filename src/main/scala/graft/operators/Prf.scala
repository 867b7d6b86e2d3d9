package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pseudo-relevance feedback (the RM3/Bo1 recipe): take each query's
  * top-ranked documents as implicit relevance evidence, mine the terms
  * those documents share, and emit the best non-query terms as query
  * EXPANSIONS — the classic recall lever a lexical retrieval stack
  * ([[Bm25]]) applies before its second pass.
  *
  * Scale shape: the feedback set is (queries × fbDocs) rows — tiny by
  * construction — so the ONLY corpus touch is one join that pulls the
  * feedback docs' text (broadcast of the feedback ids at scale; no
  * corpus-wide token explode, unlike a naive "tokenize everything then
  * filter"). Tokens explode only for those few documents; the
  * count/exclude/top-n chain runs on a frame bounded by
  * queries × fbDocs × doc-length.
  *
  * Scoring is the exact occurrence count across the query's feedback
  * docs (integers, cross-engine exact — RM3's full relevance-model
  * weighting needs per-doc score normalization with transcendentals,
  * which would break the oracle hash for no ranking difference on
  * count-dominated corpora).
  */
object Prf {

  /** Top `nTerms` expansion terms per query.
    *
    * @param ranked   (queryCol, docCol, rankCol) retrieval output; rows
    *                 with rank ≤ fbDocs form the feedback set
    * @param docs     the corpus to pull feedback text from
    * @param tokens   tokenizer (must match the retrieval stage's)
    * @param queryTerms (qtQueryCol, qtTermCol) the ORIGINAL query
    *                 terms, excluded from expansions
    * @return (query, term, fb_count, exp_rank) — fb_count the term's
    *         total occurrences across the query's feedback docs,
    *         exp_rank 1-based by (fb_count desc, term asc)
    */
  def expansionTerms(
      ranked: DataFrame,
      queryCol: String,
      docCol: String,
      rankCol: String,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tokens: Column => Column,
      queryTerms: DataFrame,
      qtQueryCol: String,
      qtTermCol: String,
      fbDocs: Int = 10,
      nTerms: Int = 5): DataFrame = {
    require(fbDocs > 0 && nTerms > 0,
      s"fbDocs and nTerms must be positive, got $fbDocs/$nTerms")
    val feedback = ranked
      .filter(col(rankCol) <= fbDocs)
      .select(col(queryCol), col(docCol))
    val counted = feedback
      .join(docs.select(col(idCol).as(docCol), col(textCol)), Seq(docCol))
      .select(col(queryCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(queryCol), col("term"))
      .agg(count(lit(1)).as("fb_count"))
    val qt = queryTerms.select(
      col(qtQueryCol).as("__q"), col(qtTermCol).as("__t"))
    counted
      .join(qt,
        col(queryCol) === col("__q") && col("term") === col("__t"),
        "left_anti")
      .withColumn("exp_rank",
        row_number().over(Window.partitionBy(queryCol)
          .orderBy(col("fb_count").desc, col("term").asc)).cast("long"))
      .filter(col("exp_rank") <= nTerms)
      .select(col(queryCol), col("term"), col("fb_count"), col("exp_rank"))
  }
}
