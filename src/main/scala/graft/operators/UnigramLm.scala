package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SentencePiece-style unigram-LM vocabulary induction (Kudo 2018) —
  * the probabilistic alternative to BPE ([[BpeVocab]]): start from a
  * large substring seed, then alternate (E) Viterbi-segmenting the
  * word dictionary under current piece log-probs with (M)
  * re-estimating piece probabilities from the segmentation counts,
  * pruning the least-used pieces each round until the vocabulary
  * reaches its target size.
  *
  * Scale shape — the [[Similarity]] trainer discipline: the DRIVER
  * holds only the piece vocabulary (bounded by `targetSize`-ish, the
  * artifact every tokenizer trainer materializes); the corpus
  * collapses to its word DICTIONARY in one aggregate and never moves
  * again; each E-step is one kernel pass over the dictionary with the
  * vocab broadcast in the closure, one explode, one count aggregate.
  * Nothing iterates over corpus rows.
  *
  * Determinism: the Viterbi loop scans split points in a fixed order
  * and replaces only on STRICTLY better scores, so equal-score
  * segmentations resolve to the longest-first canonical choice on
  * every JVM; M-step log-probs are same-JVM-reproducible doubles
  * (transcendental ln → no SQL oracle; the spec pins the trainer
  * against an independent reference implementation).
  */
object UnigramLm {

  /** Best segmentation of `word` under `logp`; None when some prefix
    * is uncoverable (cannot happen while single chars stay in vocab).
    */
  private[graft] def viterbi(
      word: String,
      logp: java.util.HashMap[String, java.lang.Double],
      maxPieceLen: Int): Option[List[String]] = {
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1) // split start for position end
    best(0) = 0.0
    var end = 1
    while (end <= n) {
      var start = math.max(0, end - maxPieceLen)
      while (start < end) {
        val lp = logp.get(word.substring(start, end))
        if (lp != null && best(start) + lp > best(end)) {
          best(end) = best(start) + lp
          back(end) = start
        }
        start += 1
      }
      end += 1
    }
    if (back(n) < 0 && n > 0) None
    else {
      var pieces = List.empty[String]
      var e = n
      while (e > 0) {
        val s = back(e)
        pieces = word.substring(s, e) :: pieces
        e = s
      }
      Some(pieces)
    }
  }

  /** Train the vocabulary. Returns (piece, count, logp, rank) — rank 1
    * = most used in the final segmentation. `docs(textCol)` is
    * whitespace-tokenized (the corpus word convention shared with
    * [[BpeVocab]]).
    */
  def train(
      docs: DataFrame,
      textCol: String,
      maxPieceLen: Int = 6,
      seedMinCount: Long = 2L,
      targetSize: Int = 200,
      emRounds: Int = 3,
      pruneFrac: Double = 0.25): DataFrame = {
    require(emRounds >= 1 && targetSize >= 1)
    require(pruneFrac > 0 && pruneFrac < 1)
    val spark = docs.sparkSession
    import spark.implicits._
    // corpus → word dictionary, ONE aggregate; everything after runs
    // over the dictionary
    val words = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .persist()
    // dictionary-derived loop partitioning (see [[Sizing]]): the seed
    // aggregate and every EM round shuffle dictionary-sized frames;
    // the count also forces the persist before the multi-reference use
    val sized = Sizing.loopPartitions(words.count())
    Sizing.withShufflePartitions(spark, sized) {
    // substring seed, weighted by word count (kernel + aggregate —
    // |dict| × O(len²) pieces, never corpus-sized)
    val seed = words.flatMap { case (w, c) =>
      for {
        i <- 0 until w.length
        j <- (i + 1) to math.min(i + maxPieceLen, w.length)
      } yield (w.substring(i, j), c)
    }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .map { case (p, c) => (p, c) }
      .collect() // the vocabulary artifact — driver-bounded by design
    var vocab: Map[String, Long] = seed
      .filter { case (p, c) => c >= seedMinCount || p.length == 1 }
      .toMap
    def logProbs(v: Map[String, Long]): java.util.HashMap[String, java.lang.Double] = {
      // floor zero counts at 1: a single-char piece kept for coverage
      // but unused in the last segmentation would otherwise carry
      // log(0) = -Inf, and Viterbi coverage through it could still
      // fail — silently dropping the affected WORDS from the E-step.
      // The floor keeps coverage pieces at finite (tiny) probability;
      // pieces with real counts are untouched.
      val total = math.max(1L, v.values.sum).toDouble
      val m = new java.util.HashMap[String, java.lang.Double](v.size * 2)
      v.foreach { case (p, c) =>
        m.put(p, math.log(math.max(1L, c) / total))
      }
      m
    }
    var counts: Map[String, Long] = vocab
    var round = 0
    while (round < emRounds) {
      val lp = logProbs(vocab)
      val bc = spark.sparkContext.broadcast(lp)
      val mpl = maxPieceLen
      // E-step: Viterbi over the dictionary, counts weighted by word
      // frequency — distributed kernel pass + count aggregate
      counts = words.flatMap { case (w, c) =>
        viterbi(w, bc.value, mpl).getOrElse(Nil).map(p => (p, c))
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case (p, c) => (p, c) }
        .collect().toMap
      // M-step + prune: keep single chars unconditionally (coverage),
      // drop the least-used quartile of the rest until targetSize
      val (chars, multi) = vocab.keys.partition(_.length == 1)
      val scored = multi.toSeq
        .map(p => (p, counts.getOrElse(p, 0L)))
        .sortBy { case (p, c) => (-c, p) }
      val keepN = math.max(targetSize - chars.size,
        math.ceil(scored.size * (1 - pruneFrac)).toInt)
      val kept = scored.take(math.min(scored.size, keepN))
      vocab = (chars.map(p => p -> counts.getOrElse(p, 0L)) ++ kept).toMap
      bc.destroy()
      round += 1
    }
    words.unpersist()
    val fin = vocab.toSeq
      .map { case (p, _) => (p, counts.getOrElse(p, 0L)) }
      .sortBy { case (p, c) => (-c, p) }
      .zipWithIndex
      .map { case ((p, c), i) => (p, c, i + 1L) }
    // same floor in the published artifact: encode()'s Viterbi must be
    // able to route through zero-count coverage chars with a finite
    // (worst-rank) log-prob instead of -Inf
    val total = math.max(1L, fin.map(_._2).sum).toDouble
    spark.createDataFrame(fin.map { case (p, c, r) =>
      (p, c, math.log(math.max(1L, c) / total), r)
    }).toDF("piece", "count", "logp", "rank")
    }
  }

  /** Segment each document's words under a trained vocabulary — the
    * encode half (inference twin of [[train]], like
    * [[Tokenize.encode]] for BPE). Output: (id, pieces array, n_pieces).
    */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame,
      maxPieceLen: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lp = new java.util.HashMap[String, java.lang.Double]()
    vocab.select("piece", "logp").collect()
      .foreach(r => lp.put(r.getString(0), r.getDouble(1)))
    val bc = spark.sparkContext.broadcast(lp)
    val mpl = maxPieceLen
    val segUdf = udf { (text: String) =>
      if (text == null) null
      else {
        val t = text.trim
        val ws = if (t.isEmpty) Array.empty[String] else t.split("\\s+")
        ws.flatMap(w => viterbi(w, bc.value, mpl).getOrElse(List(w)))
      }
    }
    // NO spread here (reverted in r11): the Viterbi kernel on these
    // short docs is cheaper than the exchange that parallelized it —
    // idle-host measurement 1.61s WITH vs 1.10s (r9) WITHOUT. On a
    // production corpus the source arrives pre-split, so the revert
    // costs nothing at scale either.
    docs
      .select(col(idCol), segUdf(col(textCol)).as("pieces"))
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
  }
}
