package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus n-gram language-model statistics: bigram counts with exact
  * conditional probabilities — the KenLM-style count pass a
  * training-data pipeline runs for perplexity filtering, boilerplate
  * detection, and corpus comparison.
  *
  * Scale shape: the bigram arrays come out of one per-doc kernel pass
  * (no interpreted higher-order transforms — the round-3 lesson), the
  * explode carries (w1, w2) string pairs into ONE count aggregate with
  * map-side partials, and the conditional denominator is a window sum
  * over the already-grouped frame (`HashPartitioning(w1, w2)` does not
  * satisfy `(w1)`, so Catalyst inserts one more exchange over the
  * GROUPED bigram vocabulary — bounded by distinct bigrams, not corpus
  * tokens). Probabilities are single IEEE divisions of exact integer
  * counts, bit-identical across engines.
  */
object NgramLm {

  /** Bigram conditional counts over `textCol`.
    *
    * Output: (w1, w2, c_bigram, c_w1, p_cond) where `c_w1` counts
    * bigram STARTS of w1 (= Σ_w2 c_bigram, the conditional-probability
    * denominator — NOT the unigram count, which differs at document
    * ends) and `p_cond = c_bigram / c_w1`. `minCount` prunes the long
    * tail before the window pass.
    */
  def bigramCounts(
      docs: DataFrame,
      textCol: String,
      grams: (Column, Int) => Column,
      minCount: Long = 2L): DataFrame = {
    val bigram = docs
      .select(explode(grams(col(textCol), 2)).as("bg"))
      // the positional-gram convention emits the WHOLE text as one
      // "gram" for sub-n-token docs (q27's greatest(len-1, 1) floor);
      // a real bigram always contains the joining space, so this
      // filter drops exactly the degenerate one-token grams
      .filter(col("bg").contains(" "))
      // positional word bigrams join tokens with a single space and
      // whitespace tokenization guarantees tokens contain none, so the
      // first space splits exactly
      .select(
        substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
    val counted = bigram.groupBy("w1", "w2")
      .agg(count(lit(1)).as("c_bigram"))
    counted
      .withColumn("c_w1",
        sum(col("c_bigram")).over(Window.partitionBy("w1")))
      // prune AFTER the denominator so p_cond stays a true conditional
      // over the full vocabulary, not the surviving subset
      .filter(col("c_bigram") >= minCount)
      .withColumn("p_cond",
        col("c_bigram").cast("double") / col("c_w1").cast("double"))
      .select("w1", "w2", "c_bigram", "c_w1", "p_cond")
  }

  /** Per-document bigram perplexity under a [[bigramCounts]] LM — the
    * CCNet-style quality filter: documents whose token transitions the
    * corpus LM finds improbable (boilerplate, lorem-garbage, wrong
    * language) score high and get culled; repetitive text scores near
    * 1. Add-α smoothing over a V-word vocabulary:
    * p(w2|w1) = (c(w1,w2) + α) / (c(w1·) + α·V), so unseen bigrams and
    * unseen contexts degrade gracefully to ~1/V instead of zeroing the
    * product. ppl = exp(−Σ ln p / n).
    *
    * Scale shape: doc bigrams explode from the same kernel pass as the
    * LM build, LEFT-join the (w1, w2) count table and the per-w1
    * denominator (both map-side-combinable aggregates of the corpus,
    * joined by key — the LM never collects to the driver, so it may be
    * arbitrarily large), then ONE regroup by document sums the
    * log-probabilities. Output: (id, n_bigrams, n_oov, ppl) — the OOV
    * count (bigrams absent from the LM) is the exact-integer half of
    * the quality signal and rides the same regroup for free. The raw
    * ppl doubles are transcendental (engine libm rounding differs), so
    * the registered gate (q159) pins ppl on a coarse ln-space grid
    * (guard bands were measured to flake — see qLmPerplexity); the
    * spec pins exact values against the same-JVM reference formula.
    */
  def perplexity(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      grams: (Column, Int) => Column,
      lm: DataFrame,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha=$alpha must be positive for smoothing")
    val pairs = docs
      .select(col(idCol).as("__id"),
        explode(grams(col(textCol), 2)).as("bg"))
      .filter(col("bg").contains(" "))
      .select(col("__id"),
        substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
    val denom = lm.groupBy("w1").agg(max(col("c_w1")).as("c_ctx"))
    // vocabulary size for the smoothing mass: distinct CONTINUATION
    // words in the LM (a single scalar, broadcast by crossJoin)
    val vocab = lm.select(countDistinct(col("w2")).as("v"))
    pairs
      .join(lm.select(col("w1"), col("w2"), col("c_bigram")),
        Seq("w1", "w2"), "left")
      .join(denom, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__p",
        (coalesce(col("c_bigram"), lit(0L)).cast("double") + alpha) /
          (coalesce(col("c_ctx"), lit(0L)).cast("double") +
            lit(alpha) * col("v").cast("double")))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c_bigram").isNull, 1L).otherwise(0L)).as("n_oov"),
        exp(-sum(log(col("__p"))) / count(lit(1))).as("ppl"))
  }
}
