package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval over a document corpus — the lexical half of
  * a training-data / RAG pipeline (the embedding half lives in
  * [[Similarity]]). Nothing comparable in the reference (its text path
  * is NLP extraction, not ranking); this is the standard Okapi/Lucene
  * formulation with k1 = 1.2, b = 0.75.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - term frequencies come from a single-pass per-document KERNEL: the
  *    (small, by contract) query vocabulary ships in the closure and
  *    each document emits only its matching (term, count) pairs — no
  *    token explode, no corpus-sized shuffle, no tf aggregate at all
  *    (the kernel pre-aggregates within the row). This is the same
  *    kernel-over-HOF discipline the dedup path measured 10–100× on;
  *    the explode+broadcast-join draft of this operator benched 1.75s
  *    at sf0.1 vs 0.6s for the kernel form;
  *  - document frequencies are a window count over the small matched
  *    (doc, term) frame, not a second corpus aggregation;
  *  - corpus stats (N, total tokens) are one cheap scan+agg of the text
  *    column; the only other corpus touch is the kernel pass;
  *  - the per-query top-k is a window over the scored (query, doc) rows,
  *    whose cardinality is bounded by docs-matching-any-term, not |corpus|.
  *
  * Arithmetic: with rational k1 = 6/5 and b = 3/4, the tf-saturation
  * term scaled by 20·T is a ratio of exact int64 products
  * (44·tf·T) / (20·tf·T + 6·T + 18·dl·N), and the idf odds
  * (N − df + ½)/(df + ½) + 1 equals 2(N+1)/(2df+1). Both are exact in
  * bigint (int64 holds them up to ~10¹⁷-token corpora; beyond that,
  * shard the stats), and the final int64→double casts and the one
  * division round identically under IEEE-754 on every engine. With
  * `logIdf = false` the per-term contribution is therefore bit-exact
  * across engines (the DuckDB oracle hash-matches it); `logIdf = true`
  * applies the standard `ln` to the same odds — the textbook score, but
  * libm implementations differ by 1 ulp between engines (measured: 12 of
  * 20k idf arguments), so it is spec-tested, not oracle-hashed. The ln
  * is monotone, so per-term doc ordering is identical; only multi-term
  * sums can reorder between the two forms.
  *
  * The cross-term sum folds contributions in sorted-term order on both
  * engines (Spark `aggregate` over `sort_array`; DuckDB `list_reduce`
  * over `list(... ORDER BY term)`), so double-addition order — the usual
  * distributed-sum flake — is pinned.
  */
object Bm25 {

  /** Corpus stats (N docs, total tokens) as a one-row frame — ONE full
    * scan+agg of the text column. Callers issuing several [[topK]]
    * passes over the SAME corpus (the RM3 loop: rank → feedback →
    * re-rank; any multi-query-set workload) should compute this once
    * and pass it to every call — at corpus scale the stats scan is a
    * full read, and re-deriving it per pass is a redundant 100 TB scan.
    */
  def corpusStats(
      docs: DataFrame,
      textCol: String,
      tokenize: Column => Column): DataFrame =
    docs.agg(
      count(lit(1)).as("__n"),
      sum(size(tokenize(col(textCol))).cast("long")).as("__t"))

  /** Top-k docs per query by BM25.
    *
    * The query table is collected to the driver (it is the SMALL side by
    * contract — a query workload, not a second corpus) so its vocabulary
    * can ride the kernel closure.
    *
    * @param docs          corpus; `idCol` must be unique
    * @param queries       (queryIdCol, termCol) rows — one row per
    *                      DISTINCT query term (duplicates are collapsed;
    *                      query-side tf weighting is not applied)
    * @param tokenize      column-expression tokenizer (used for the
    *                      corpus-stats pass)
    * @param tokenizeLocal the SAME tokenization as a plain function
    *                      (used inside the kernel) — the two must agree
    * @param logIdf        true = standard `ln` idf; false = exact-rational
    *                      odds idf (cross-engine bit-exact, same per-term
    *                      ranking)
    * @return (query id, rank 1..k, doc id, score); docs sharing no term
    *         with the query never appear
    */
  def topK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tokenize: Column => Column,
      tokenizeLocal: String => Array[String],
      queries: DataFrame,
      queryIdCol: String,
      termCol: String,
      k: Int,
      logIdf: Boolean = true,
      precomputedStats: Option[DataFrame] = None
  ): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val stats = precomputedStats
      .getOrElse(corpusStats(docs, textCol, tokenize))
    val qt = queries
      .select(col(queryIdCol).as("__qid"), col(termCol).as("__term"))
      .distinct()
    val vocab: Set[String] =
      qt.select("__term").distinct().as[String].collect().toSet
    // one pass, pre-aggregated per row: (dl, [(matched term, count)...])
    val kernel = udf { (text: String) =>
      val toks = tokenizeLocal(if (text == null) "" else text)
      val counts = new scala.collection.mutable.HashMap[String, Long]
      toks.foreach { w =>
        if (vocab.contains(w)) counts.update(w, counts.getOrElse(w, 0L) + 1)
      }
      (toks.length.toLong, counts.toSeq)
    }
    val tf = docs
      .select(col(idCol).as("__doc"), kernel(col(textCol)).as("__k"))
      .select(col("__doc"), col("__k._1").as("__dl"),
        explode(col("__k._2")).as("__h"))
      .select(col("__doc"), col("__dl"), col("__h._1").as("__term"),
        col("__h._2").as("__tf"))
      // df as a window count over the (small) matched frame — NOT a
      // second corpus aggregation
      .withColumn("__df",
        count(lit(1)).over(Window.partitionBy(col("__term"))))
    val tfT = col("__tf") * col("__t")
    val tfsat = (lit(44L) * tfT).cast("double") /
      (lit(20L) * tfT + lit(6L) * col("__t") +
        lit(18L) * col("__dl") * col("__n")).cast("double")
    // odds = (N − df + ½)/(df + ½) + 1 — the "+1" is already inside
    // (it's what makes the ratio equal 2(N+1)/(2df+1)), so the standard
    // Okapi idf is ln(odds), NOT ln(1 + odds)
    val odds = (lit(2L) * (col("__n") + lit(1L))).cast("double") /
      (lit(2L) * col("__df") + lit(1L)).cast("double")
    val idf = if (logIdf) log(odds) else odds
    val contrib = tf
      .crossJoin(broadcast(stats))
      .select(col("__term"), col("__doc"), (idf * tfsat).as("__c"))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("score").desc, col("__doc").asc)
    qt.join(contrib, "__term")
      .groupBy("__qid", "__doc")
      // deterministic fold order: 0.0 + c1 == c1 exactly, so this equals
      // the oracle's init-less list_reduce over the same sorted list
      .agg(aggregate(
        sort_array(collect_list(struct(col("__term"), col("__c")))),
        lit(0.0),
        (acc, x) => acc + x.getField("__c")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("__qid").as("query_id"), col("rank"),
        col("__doc").as("doc_id"), col("score"))
  }
}
