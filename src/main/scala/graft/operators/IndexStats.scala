package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a text index's document-frequency table —
  * what keeps [[Bm25]]-style retrieval stats fresh under a merging
  * corpus without recomputing from the full table. The composition
  * twin of [[IncrementalAgg]]: consume [[MergeOps.changeFeed]], emit
  * the post-merge df table at O(changes) cost.
  *
  * Each changed document contributes ±1 per DISTINCT term (insert and
  * update_postimage add, delete and update_preimage subtract — an
  * update is its pre-image retired plus its post-image indexed). The
  * deltas aggregate over the CHANGES only (a small frame by
  * definition) and apply with one keyed outer join against the
  * vocabulary-sized base; at 100 TB a daily merge touching 0.1% of
  * docs costs O(0.1%) to maintain, not O(corpus). Counts are exact
  * integers, so incremental == full recompute bit-for-bit (the q105
  * oracle recomputes from the merged table and hash-matches).
  */
object IndexStats {

  /** The one term-extraction rule both directions share — if full
    * recompute and incremental maintenance ever tokenized differently,
    * the operator's defining invariant (incremental == recompute)
    * would silently break.
    */
  private def distinctTermsUdf(tokenizeLocal: String => Array[String]) =
    udf { (text: String) => tokenizeLocal(text).distinct }

  /** Per-term document frequency of a corpus (the full-recompute form
    * and the base for [[applyChanges]]). One kernel pass per doc emits
    * its distinct terms; one aggregate counts docs per term.
    */
  def termDf(
      docs: DataFrame,
      textCol: String,
      tokenizeLocal: String => Array[String]
  ): DataFrame =
    docs
      .select(explode(distinctTermsUdf(tokenizeLocal)(col(textCol)))
        .as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"))

  /** Applies a merge's change feed to a df table.
    *
    * @param baseDf  (term, df) — the pre-merge document frequencies
    * @param changes [[MergeOps.changeFeed]] output (`_change_type` +
    *                the row columns, including `textCol`)
    * @return the post-merge (term, df), terms with df 0 dropped
    */
  def applyChanges(
      baseDf: DataFrame,
      changes: DataFrame,
      textCol: String,
      tokenizeLocal: String => Array[String]
  ): DataFrame = {
    val distinctTerms = distinctTermsUdf(tokenizeLocal)
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val delta = changes
      .select(sign.as("__s"), explode(distinctTerms(col(textCol))).as("term"))
      .groupBy("term")
      .agg(sum(col("__s")).as("__d"))
    baseDf
      .join(delta, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("__d"), lit(0L)))
          .as("df"))
      .filter(col("df") > 0)
  }
}
