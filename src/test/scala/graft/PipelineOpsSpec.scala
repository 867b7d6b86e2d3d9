package graft

import graft.operators.{BpeVocab, CrossDedup, PhraseSearch, QualityClassifier, Sampling, Tokenize}
import org.apache.spark.sql.functions._

/** Driver-round-6 pipeline operators: cross-corpus dedup, hashing-trick
  * quality classifier, positional phrase search, per-group caps, and
  * BPE tokenizer application.
  */
class PipelineOpsSpec extends SparkSpecBase {

  import spark.implicits._

  // --- CrossDedup ---------------------------------------------------

  test("cross-corpus dedup flags exact, near, and fresh incoming docs") {
    val base = "spark shuffles data across the cluster when a join has no " +
      "co-located partitioning and the optimizer cannot broadcast either side"
    val ref = Seq(
      (1L, base),
      (2L, "completely different reference content about parquet footers " +
        "and column statistics that prune row groups during the scan phase"))
      .toDF("doc_id", "text")
    val inc = Seq(
      (10L, base), // exact copy of ref doc 1
      // near-dup of ref doc 1 (verified: shares 3 of its 4 md5-LSH
      // bands — one tail word changed in a 21-word doc)
      (11L, base.replace("either side", "either operand")),
      (12L, "an unrelated incoming document mentioning watermarks windows " +
        "and state stores in the streaming engine with nothing shared"))
      .toDF("doc_id", "text")
    val out = CrossDedup.flagAgainst(ref, inc, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getBoolean(3)))
    assert(out(0) === ((10L, true, 1L, false))) // exact (and shares bands)
    assert(out(1)._1 === 11L)
    assert(!out(1)._2 && out(1)._3 >= 1L && !out(1)._4) // near only
    assert(out(2) === ((12L, false, 0L, true))) // fresh → kept
  }

  test("cross-corpus dedup never flags against other incoming docs") {
    val ref = Seq((1L, "reference only corpus with its own words entirely"))
      .toDF("doc_id", "text")
    val dup = "two incoming docs that duplicate each other but not the " +
      "reference corpus should both be kept by the cross check"
    val inc = Seq((10L, dup), (11L, dup)).toDF("doc_id", "text")
    val out = CrossDedup.flagAgainst(ref, inc, "doc_id", "text").collect()
    assert(out.forall(r => !r.getBoolean(1) && r.getLong(2) === 0L
      && r.getBoolean(3)))
  }

  // --- QualityClassifier --------------------------------------------

  test("classifier weights are deterministic integers in [-10, 10]") {
    val w = QualityClassifier.weights
    assert(w.length === QualityClassifier.Dim)
    assert(w.forall(v => v >= -10L && v <= 10L))
    assert(w.distinct.length > 10) // not degenerate
  }

  test("classifier score is additive over token occurrences") {
    val df = Seq("alpha beta", "alpha beta alpha beta", "", "   ")
      .toDF("text")
      .select(QualityClassifier.score(col("text")).as("s"))
      .select($"s._1".as("n"), $"s._2".as("score"))
      .collect()
    assert(df(0).getLong(0) === 2L)
    assert(df(1).getLong(0) === 4L)
    assert(df(1).getLong(1) === 2L * df(0).getLong(1)) // doubled text → doubled score
    assert(df(2).getLong(0) === 0L && df(2).getLong(1) === 0L)
    assert(df(3).getLong(0) === 0L && df(3).getLong(1) === 0L)
  }

  // --- PhraseSearch -------------------------------------------------

  test("phrase search counts adjacency-exact occurrences per doc") {
    val docs = Seq(
      (1L, "big data big data systems love big data"),
      (2L, "data big"), // reversed — no match
      (3L, "big little data")) // not adjacent — no match
      .toDF("doc_id", "text")
    val phrases = Seq(("big", "data")).toDF("w1", "w2")
    val out = PhraseSearch.phraseOccurrences(docs, "doc_id", "text", phrases)
      .orderBy("doc_id").collect()
    assert(out.length === 1)
    assert(out(0).getLong(2) === 1L && out(0).getLong(3) === 3L)
  }

  test("phrase search handles overlapping self-phrases") {
    val docs = Seq((1L, "a a a a")).toDF("doc_id", "text")
    val phrases = Seq(("a", "a")).toDF("w1", "w2")
    val out = PhraseSearch.phraseOccurrences(docs, "doc_id", "text", phrases)
      .collect()
    assert(out(0).getLong(3) === 3L) // positions (1,2) (2,3) (3,4)
  }

  // --- Sampling.capPerGroup -----------------------------------------

  test("capPerGroup keeps min(cap, group size) rows, deterministically") {
    val df = (1L to 50L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val out = Sampling.capPerGroup(df, "grp", "id", n = 5)
    val kept = out.filter(col("kept")).groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept === Map("g0" -> 5L, "g1" -> 5L, "g2" -> 5L))
    val small = Sampling.capPerGroup(df.limit(3), "grp", "id", n = 5)
    assert(small.filter(col("kept")).count() === 3L)
    // survivor SET is a function of the data, not of partitioning
    val a = out.filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.capPerGroup(df.repartition(7), "grp", "id", n = 5)
      .filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("trainShards: deterministic balanced layout, partitioning-independent") {
    val df = (1L to 300L).map(i => Tuple1(i)).toDF("id")
    val out = Sampling.trainShards(df, "id", seed = "s", shardSize = 64L)
      .collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("shard"),
        r.getAs[Long]("pos_in_shard"))).toMap
    // every row assigned exactly once; shard/pos form a bijection with
    // 0..n-1 (no gaps, no dup slots)
    assert(out.size === 300)
    val slots = out.values.map { case (s, p) => s * 64 + p }.toSeq.sorted
    assert(slots === (0L until 300L))
    // shards are full except the last
    val bySize = out.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(bySize === Map(0L -> 64, 1L -> 64, 2L -> 64, 3L -> 64, 4L -> 44))
    // order is a pure function of (corpus, seed): re-run and a
    // different physical partitioning give the identical layout
    val again = Sampling
      .trainShards(df.repartition(13), "id", seed = "s", shardSize = 64L)
      .collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("shard"),
        r.getAs[Long]("pos_in_shard"))).toMap
    assert(again === out)
    // a different seed is a different permutation
    val other = Sampling.trainShards(df, "id", seed = "t", shardSize = 64L)
      .collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("shard"),
        r.getAs[Long]("pos_in_shard"))).toMap
    assert(other !== out)
  }

  // --- DataManifest.applyChanges ------------------------------------

  test("incremental manifest equals full recompute, deletes included") {
    import graft.operators.DataManifest
    val before = Seq((1L, "alpha", "s1"), (2L, "beta", "s1"),
      (3L, "gamma", "s2"), (4L, "delta", "s2"))
      .toDF("doc_id", "text", "source")
    val after = Seq((1L, "alpha", "s1"), // unchanged
      (3L, "gamma prime", "s2"), // updated
      (5L, "epsilon", "s2")) // inserted; 2 and 4 deleted
      .toDF("doc_id", "text", "source")
    // hand-built change feed in the MergeOps CDF vocabulary
    val changes = Seq(
      ("delete", 2L, "beta", "s1"),
      ("update_preimage", 3L, "gamma", "s2"),
      ("update_postimage", 3L, "gamma prime", "s2"),
      ("delete", 4L, "delta", "s2"),
      ("insert", 5L, "epsilon", "s2"))
      .toDF("_change_type", "doc_id", "text", "source")
    val base = DataManifest.manifest(before, "source", "doc_id", "text")
      .drop("min_id", "max_id")
    val incr = DataManifest
      .applyChanges(base, changes, "source", "doc_id", "text")
      .orderBy("source").collect().map(_.toSeq)
    val full = DataManifest.manifest(after, "source", "doc_id", "text")
      .drop("min_id", "max_id")
      .orderBy("source").collect().map(_.toSeq)
    assert(incr.toSeq === full.toSeq)
  }

  test("incremental manifest drops a fully-deleted group") {
    import graft.operators.DataManifest
    val before = Seq((1L, "only", "gone")).toDF("doc_id", "text", "source")
    val changes = Seq(("delete", 1L, "only", "gone"))
      .toDF("_change_type", "doc_id", "text", "source")
    val base = DataManifest.manifest(before, "source", "doc_id", "text")
      .drop("min_id", "max_id")
    assert(DataManifest
      .applyChanges(base, changes, "source", "doc_id", "text")
      .count() === 0L)
  }

  // --- Tokenize -----------------------------------------------------

  test("BPE encode reproduces training's final symbol state") {
    val dict = Seq(("lower", 5L), ("lowest", 2L), ("newer", 6L),
      ("wider", 3L), ("low", 7L))
    val rules = BpeVocab.trainLocal(dict, merges = 6)
      .map { case (_, l, r, _) => (l, r) }
    val rank = rules.zipWithIndex.toMap
    // replay training: apply each rule in order to the whole dictionary
    var state = dict.map { case (w, _) => w -> BpeVocab.toSymbols(w) }.toMap
    rules.foreach { case (l, r) =>
      state = state.map { case (w, s) => w -> BpeVocab.applyMerge(s, l, r) }
    }
    dict.foreach { case (w, _) =>
      assert(Tokenize.encodeWord(w, rank) === state(w),
        s"encode($w) diverged from training state")
    }
  }

  test("BPE encode is lossless and handles empty rule sets") {
    val rank = Map(("a", "b") -> 0, ("ab", "c") -> 1)
    assert(Tokenize.encodeWord("abcabd", rank).mkString === "abcabd")
    assert(Tokenize.encodeWord("abcabd", rank) === Seq("abc", "ab", "d"))
    assert(Tokenize.encodeWord("xyz", Map.empty) === Seq("x", "y", "z"))
    assert(Tokenize.encodeWord("", rank) === Seq.empty)
  }

  test("BPE encode applies lowest-rank rule first, not leftmost match") {
    // "bc" outranks "ab": in "abc" the bc merge wins even though ab is
    // leftmost; then (a, bc) has no rule
    val rank = Map(("bc", "") -> 99, ("b", "c") -> 0, ("a", "b") -> 1)
    assert(Tokenize.encodeWord("abc", rank) === Seq("a", "bc"))
  }
}
