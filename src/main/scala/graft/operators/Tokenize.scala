package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** BPE tokenizer APPLICATION — the encode half of the tokenizer whose
  * training half is [[BpeVocab]]. This is the step that actually
  * converts a curated corpus into model tokens (token budgeting,
  * sequence packing, and cost accounting all consume its counts).
  *
  * Encoding semantics match training exactly: a word starts as its
  * code-point symbols ([[BpeVocab.toSymbols]]) and repeatedly applies
  * the LOWEST-RANK applicable merge rule, greedy-leftmost within the
  * word ([[BpeVocab.applyMerge]]) until no rule applies — so encoding
  * a word from the training dictionary reproduces the exact symbol
  * state training left it in (TokenizeSpec pins that invariant on the
  * real corpus dictionary, plus concat(tokens) == word).
  *
  * Scale shape: the merge table is tiny (the collected output of
  * [[BpeVocab.train]] — vocab-building is bounded by construction),
  * broadcast in the UDF closure; encoding is then a pure per-document
  * kernel pass with ZERO shuffle, and per-word results are memoized
  * within each document (word frequency is Zipfian — repeated words
  * encode once).
  */
object Tokenize {

  /** Encode one word under a rank map ((left, right) → rank). */
  private[graft] def encodeWord(
      word: String,
      rank: Map[(String, String), Int]): Seq[String] = {
    var syms = BpeVocab.toSymbols(word)
    var done = false
    while (!done && syms.length >= 2) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) done = true
      else syms = BpeVocab.applyMerge(syms, best._1, best._2)
    }
    syms
  }

  /** Per-document encoder over a fixed merge-rule list
    * ((left, right) in rank order). Returns (n_words, n_tokens).
    */
  def encodeCountsUdf(rules: Seq[(String, String)]): UserDefinedFunction = {
    val rank = rules.zipWithIndex.toMap
    udf { (text: String) =>
      val memo = scala.collection.mutable.HashMap.empty[String, Int]
      val toks = TextFunctions.tokensLocal(text)
      var nTokens = 0L
      var i = 0
      while (i < toks.length) {
        nTokens += memo.getOrElseUpdate(toks(i), encodeWord(toks(i), rank).length)
        i += 1
      }
      (toks.length.toLong, nTokens)
    }
  }
}
