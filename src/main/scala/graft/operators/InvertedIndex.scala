package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked inverted-index construction: term → fixed-size posting
  * blocks of (doc, position) entries.
  *
  * The reference ships its notes to Athena/ctakes for search-side
  * consumption (cumulus_etl/nlp/selection.py builds the cohort the
  * search runs over); this operator is the corpus-side artifact a
  * lexical retrieval system (the q101 BM25 family) serves from.
  *
  * Scale shape: ONE shuffle. Tokens explode to (term, doc, pos) rows,
  * the exchange hashes on `term`, and both the per-term ordering
  * (window) and the per-(term, block) packing (groupBy) reuse that
  * same partitioning — `HashPartitioning(term)` satisfies the
  * clustered distribution of `(term, block)`, so Catalyst plans no
  * second exchange (verified with `graft.Explain`). Posting lists are
  * BLOCKED (`blockSize` entries per output row) precisely so a hot
  * term ("the") produces many bounded rows instead of one
  * collect_list the size of the corpus — the classic posting-skip-list
  * layout, and the reason this holds at 100 TB where a naive
  * `groupBy(term).agg(collect_list(...))` dies on stop-words.
  */
object InvertedIndex {

  /** Build blocked postings.
    *
    * Output: (term, block, df, n_in_block, postings) where `block` is
    * the 0-based block ordinal within the term, `df` the term's total
    * document frequency (same value on every block row of a term),
    * `n_in_block` the entries packed into this row, and `postings`
    * the "doc:pos" entries joined with "," in (doc, pos) order.
    */
  def buildBlocks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tokens: Column => Column,
      blockSize: Int = 128): DataFrame = {
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    val posting = docs
      .select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos0", "term")))
      .select(col("term"), col("doc_id"), (col("pos0") + 1).as("pos"))
    val byTerm = Window.partitionBy("term")
    val ordered = byTerm.orderBy(col("doc_id"), col("pos"))
    // df rides the SAME term-hash exchange and the SAME (doc_id, pos)
    // sort the blocking window needs: a posting is its doc's FIRST iff
    // its per-(term, doc) row_number is 1, and those firsts sum to df.
    // (A per-block countDistinct would double-count docs whose
    // postings straddle a block boundary.)
    val firstInDoc = Window.partitionBy("term", "doc_id").orderBy("pos")
    posting
      .withColumn("rn", row_number().over(ordered))
      .withColumn("first_in_doc",
        when(row_number().over(firstInDoc) === 1, 1L).otherwise(0L))
      .withColumn("block", ((col("rn") - 1L) / blockSize).cast("long"))
      .groupBy("term", "block")
      .agg(
        count(lit(1)).cast("long").as("n_in_block"),
        // entries arrive in window order but groupBy does not promise
        // it — sort the packed block explicitly for determinism
        array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("pos")))),
            e => concat_ws(":", e("doc_id"), e("pos"))),
          ",").as("postings"),
        sum(col("first_in_doc")).as("new_docs_in_block"))
      .withColumn("df", sum(col("new_docs_in_block")).over(byTerm))
      .drop("new_docs_in_block")
      .select("term", "block", "df", "n_in_block", "postings")
  }
}
