package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional phrase retrieval: exact two-word phrase occurrences via
  * positional posting intersection — the operator a positional
  * inverted index ([[InvertedIndex]] stores doc:pos entries for
  * exactly this reason) exists to serve. BM25 (q101) ranks bags of
  * words; phrase search is the adjacency-constrained counterpart
  * ("big data" ≠ "data big").
  *
  * Scale shape: the corpus's (doc, pos, term) posting stream is
  * filtered to the phrase vocabulary FIRST (the phrase table is
  * query-sized — broadcast), so the adjacency self-join runs over
  * per-term posting lists, never the corpus: left side emits
  * (doc, pos+1) for first-word hits, right side (doc, pos) for
  * second-word hits, and ONE equi-join on (doc, pos, phrase) finds
  * adjacent pairs. Join degree is bounded by posting-list length —
  * the same bound a skip-list intersection has on a single node, here
  * hash-partitioned.
  */
object PhraseSearch {

  /** Count per-document occurrences of each (w1, w2) phrase.
    *
    * `phrases` must have columns (w1, w2). Output:
    * (w1, w2, idCol, n_occ) — docs with zero occurrences are absent.
    */
  def phraseOccurrences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrases: DataFrame): DataFrame = {
    val postings = docs
      .select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos0", "term")))
    val vocab = phrases.select(col("w1").as("term"))
      .unionByName(phrases.select(col("w2").as("term")))
      .distinct()
    // phrase-vocabulary filter before anything shuffles: postings for
    // terms no phrase mentions never leave the scan. Materialize the
    // filtered postings: firsts and seconds both reference this frame
    // and the vocab join is map-side (no exchange to reuse), so
    // without this the corpus tokenize + posexplode runs TWICE — the
    // md5Sigs/twice-referenced-kernel-frame lesson again. Safe to
    // checkpoint: vocabulary-filtered, so it is query-sized.
    val hits = postings.join(broadcast(vocab), Seq("term"))
      .localCheckpoint(true)
    val firsts = hits
      .join(broadcast(phrases), col("term") === col("w1"))
      .select(col("w1"), col("w2"), col(idCol), (col("pos0") + 1).as("adj"))
    val seconds = hits
      .select(col("term").as("w2"), col(idCol), col("pos0").as("adj"))
    firsts
      .join(seconds, Seq("w2", idCol, "adj"))
      .groupBy("w1", "w2", idCol)
      .agg(count(lit(1)).as("n_occ"))
  }
}
