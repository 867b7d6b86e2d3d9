package graft

import graft.functions.TextFunctions
import graft.operators.{EventFlows, InvertedIndex, Mining, NearDedup,
  NgramLm, Sampling}
import org.apache.spark.sql.functions._

/** Semantics of the round-6 training-pipeline operators: blocked
  * inverted index, bigram LM counts, hard-negative mining, n-gram
  * containment, curriculum staging, and sequence-example building.
  */
class MiningAndIndexSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- InvertedIndex ----------------------------------------------------

  test("buildBlocks packs postings and counts df across block straddles") {
    val docs = Seq(
      (1L, "t a t"), // t at pos 1, 3
      (2L, "t b")    // t at pos 1
    ).toDF("doc_id", "text")
    val got = InvertedIndex
      .buildBlocks(docs, "doc_id", "text", TextFunctions.tokens,
        blockSize = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .toSet
    assert(got === Set(
      // doc 1's postings straddle t's two blocks; df must still be 2,
      // not 3 (the per-block-distinct double count)
      ("t", 0L, 2L, 2L, "1:1,1:3"),
      ("t", 1L, 2L, 1L, "2:1"),
      ("a", 0L, 1L, 1L, "1:2"),
      ("b", 0L, 1L, 1L, "2:2")
    ))
  }

  test("buildBlocks: empty and null text emit no postings") {
    val docs = Seq((1L, ""), (2L, "  "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(InvertedIndex.buildBlocks(docs, "doc_id", "text",
      TextFunctions.tokens, blockSize = 4).count() === 0L)
  }

  // ---- NgramLm ----------------------------------------------------------

  test("bigramCounts: conditional denominator spans pruned rows") {
    val docs = Seq(
      (1L, "a b a b a c"), // (a,b)=2 (b,a)=2 (a,c)=1
      (2L, "solo")         // 1-token doc: no bigrams
    ).toDF("doc_id", "text")
    val got = NgramLm
      .bigramCounts(docs, "text",
        (c, n) => TextFunctions.wordNgramsKernel(c, n), minCount = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
      .toSet
    // (a,c) is pruned by minCount but still counts in a's denominator:
    // p(b|a) = 2/3, not 2/2
    assert(got === Set(
      ("a", "b", 2L, 3L, 2.0 / 3.0),
      ("b", "a", 2L, 2L, 1.0)
    ))
  }

  test("perplexity matches the reference formula and orders by fluency") {
    // LM corpus: "a b" dominates; doc 10 repeats the likely bigram,
    // doc 11 is the rare transition, doc 12 has unseen tokens
    val corpus = Seq(
      (1L, "a b a b a b a b"),
      (2L, "a b a c")
    ).toDF("doc_id", "text")
    val lm = NgramLm.bigramCounts(corpus, "text",
      (c, n) => TextFunctions.wordNgramsKernel(c, n), minCount = 1L)
    val score = Seq(
      (10L, "a b a b"),
      (11L, "a c a c"),
      (12L, "x y x y")
    ).toDF("doc_id", "text")
    val rows = NgramLm.perplexity(score, "doc_id", "text",
        (c, n) => TextFunctions.wordNgramsKernel(c, n), lm)
      .collect()
    val got = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_bigrams"), r.getAs[Double]("ppl"))).toMap
    val oov = rows.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Long]("n_oov")).toMap
    // OOV = bigrams absent from the LM: doc 10 all seen, doc 11 has
    // the unseen (c,a) context transition, doc 12 entirely unseen
    assert(oov === Map(10L -> 0L, 11L -> 1L, 12L -> 3L))
    // reference formula, same JVM: p = (c+0.5)/(c_ctx+0.5*V), V = 3
    // distinct continuations (b, a, c); corpus counts: (a,b)=5 (b,a)=4
    // (a,c)=1; c_a=6, c_b=4, c_c=1 (from "c a"? no: corpus bigrams of
    // doc2: (a,b)(b,a)(a,c) → c starts nothing → unseen context)
    val V = 3.0
    def p(c: Long, ctx: Long) = (c + 0.5) / (ctx + 0.5 * V)
    def ppl(ps: Seq[Double]) =
      math.exp(-ps.map(math.log).sum / ps.length)
    // partial-aggregation order can shift the log sum by an ulp;
    // compare to 1e-12 relative
    def close(a: Double, b: Double) = math.abs(a - b) <= 1e-12 * b
    assert(got(10L)._1 === 3L)
    assert(close(got(10L)._2, ppl(Seq(p(5, 6), p(4, 4), p(5, 6)))))
    // doc 11: (a,c)=1 of 6, (c,a) unseen context → 0.5/(0+1.5)
    assert(close(got(11L)._2,
      ppl(Seq(p(1, 6), 0.5 / (0 + 0.5 * V), p(1, 6)))))
    // doc 12: all unseen
    assert(close(got(12L)._2, ppl(Seq.fill(3)(0.5 / (0.5 * V)))))
    // fluent text beats both degenerate docs; note all-unseen floors
    // at exactly V (uniform 1/V per step) while a rare-but-seen
    // transition chain can score WORSE than uniform — smoothing is
    // generous to total novelty by design
    assert(got(10L)._2 < got(11L)._2)
    assert(got(10L)._2 < got(12L)._2)
    assert(close(got(12L)._2, V))
  }

  // ---- Mining -----------------------------------------------------------

  test("hardNegatives anti-joins relevance and re-ranks survivors") {
    val ranked = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4),
      (2L, 20L, 1), (2L, 21L, 2)
    ).toDF("query_id", "doc_id", "rank")
    val relevant = Seq((1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "doc_id")
    val got = Mining
      .hardNegatives(ranked, "query_id", "doc_id", "rank",
        relevant, "query_id", "doc_id", nNeg = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // q1: 11 removed; 10, 12 survive as negs 1, 2 (13 cut by nNeg).
    // q2: everything relevant → no negatives at all.
    assert(got === Set((1L, 10L, 1L, 1L), (1L, 12L, 3L, 2L)))
  }

  // ---- NearDedup.ngramContainment ---------------------------------------

  test("containment flags superset duplicates that Jaccard dilutes") {
    val short = "w1 w2 w3 w4 w5"
    val long = s"p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 $short"
    val df = Seq((short, long)).toDF("a", "b")
    val row = df.select(
      NearDedup.ngramContainment(col("a"), col("b")).as("ab"),
      NearDedup.ngramContainment(col("b"), col("a")).as("ba"),
      NearDedup.ngramJaccard(col("a"), col("b")).as("j")
    ).head()
    assert(row.getDouble(0) === 1.0) // short fully inside long
    assert(row.getDouble(1) < 0.5)   // long mostly NOT in short
    assert(row.getDouble(2) < 0.5)   // symmetric Jaccard misses it
  }

  // ---- Sampling.curriculumStages ----------------------------------------

  test("curriculumStages buckets by exact CDF; ties share a stage") {
    val docs = (1 to 8).map(i => (i.toLong, i.toLong))
      .toDF("doc_id", "w")
    val got = Sampling.curriculumStages(docs, "w", 4)
      .select("doc_id", "stage")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got === (1 to 8).map(i => (i.toLong, ((i - 1) / 2).toLong)).toSet)

    val tied = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 9L))
      .toDF("doc_id", "w")
    val stages = Sampling.curriculumStages(tied, "w", 4)
      .select("doc_id", "stage")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    // the three weight-5 docs share stage 0 (0 strictly-smaller rows);
    // the weight-9 doc has 3 of 4 below it → stage 3
    assert(stages === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 3L))
  }

  // ---- Prf --------------------------------------------------------------

  test("expansionTerms counts feedback terms, excludes query terms") {
    import graft.operators.Prf
    val docs = Seq(
      (10L, "spark shuffle join shuffle"),
      (11L, "spark codegen shuffle"),
      (12L, "unrelated noise")
    ).toDF("doc_id", "text")
    val ranked = Seq(
      (1L, 10L, 1), (1L, 11L, 2), // doc 12 not in feedback
      (1L, 12L, 3)
    ).toDF("query_id", "doc_id", "rank")
    val queryTerms = Seq((1L, "spark")).toDF("query_id", "term")
    val got = Prf.expansionTerms(ranked, "query_id", "doc_id", "rank",
      docs, "doc_id", "text", graft.functions.TextFunctions.tokens,
      queryTerms, "query_id", "term", fbDocs = 2, nTerms = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // "spark" excluded (query term); "shuffle" counted 3× across both
    // feedback docs; then "codegen"/"join" tie at 1 → term asc
    assert(got === Set(
      (1L, "shuffle", 3L, 1L),
      (1L, "codegen", 1L, 2L)
    ))
  }

  test("PRF second pass re-ranks with the expanded vocabulary") {
    val sf001 = "/root/testdata/sf0.001"
    val first = graft.queries.RetrievalQueries
      .qBm25TopK(spark, sf001)
      .select("query_id", "rank", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val second = graft.queries.RetrievalQueries
      .qPrfSecondPass(spark, sf001)
      .select("query_id", "rank", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(second.nonEmpty)
    // the expanded vocabulary must actually move the ranking — if the
    // two passes agree exactly, the expansion terms did nothing and
    // the loop is vacuous
    assert(second !== first)
    assert(second.map(_._1) === first.map(_._1)) // same query ids served
  }

  // ---- NearDedup.applyBandChanges ---------------------------------------

  test("applyBandChanges: incremental band table equals full rebuild") {
    val base = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu")
    ).toDF("doc_id", "text")
    // an update (pre+post image), an insert, and a delete
    val changes = Seq(
      ("update_preimage", 2L, "epsilon zeta eta theta"),
      ("update_postimage", 2L, "epsilon zeta eta theta REVISED"),
      ("insert", 4L, "nu xi omicron pi"),
      ("delete", 3L, "iota kappa lambda mu")
    ).toDF("_change_type", "doc_id", "text")
    val merged = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta REVISED"),
      (4L, "nu xi omicron pi")
    ).toDF("doc_id", "text")
    val toSet = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val incremental = graft.operators.NearDedup.applyBandChanges(
      graft.operators.NearDedup.md5BandTable(base, "doc_id", "text"),
      changes, "doc_id", "text")
    val rebuilt = graft.operators.NearDedup
      .md5BandTable(merged, "doc_id", "text")
    assert(toSet(incremental) === toSet(rebuilt))
    assert(toSet(incremental).size === 12) // 3 docs × 4 bands
  }

  // ---- DataManifest -----------------------------------------------------

  test("manifest digest is invariant to row order and partitioning") {
    import graft.operators.DataManifest
    val rows = Seq((1L, "g", "alpha"), (2L, "g", "beta"), (3L, "g", "gamma"))
    val a = DataManifest.manifest(
      rows.toDF("id", "grp", "text"), "grp", "id", "text")
    val b = DataManifest.manifest(
      rows.reverse.toDF("id", "grp", "text").repartition(7),
      "grp", "id", "text")
    assert(a.collect().toSeq === b.collect().toSeq)
    // and it DETECTS a content change
    val c = DataManifest.manifest(
      Seq((1L, "g", "alpha"), (2L, "g", "beta"), (3L, "g", "gamma!"))
        .toDF("id", "grp", "text"), "grp", "id", "text")
    assert(a.select("content_digest").head().getLong(0) !==
      c.select("content_digest").head().getLong(0))
  }

  test("manifest content_sum catches even-count duplicates xor cancels") {
    import graft.operators.DataManifest
    // A and B agree on n_rows, n_chars, min/max id AND the xor digest
    // (the doubled rows cancel out of it) — only the multiplicity-
    // sensitive sum separates them
    val a = DataManifest.manifest(
      Seq((1L, "g", "aa"), (2L, "g", "bb"), (2L, "g", "bb"),
        (5L, "g", "cc")).toDF("id", "grp", "text"), "grp", "id", "text")
      .head()
    val b = DataManifest.manifest(
      Seq((1L, "g", "aa"), (4L, "g", "dd"), (4L, "g", "dd"),
        (5L, "g", "cc")).toDF("id", "grp", "text"), "grp", "id", "text")
      .head()
    assert(a.getAs[Long]("n_rows") === b.getAs[Long]("n_rows"))
    assert(a.getAs[Long]("n_chars") === b.getAs[Long]("n_chars"))
    assert(a.getAs[Long]("min_id") === b.getAs[Long]("min_id"))
    assert(a.getAs[Long]("max_id") === b.getAs[Long]("max_id"))
    assert(a.getAs[Long]("content_digest") ===
      b.getAs[Long]("content_digest"))
    assert(a.getAs[Long]("content_sum") !== b.getAs[Long]("content_sum"))
  }

  // ---- TextFunctions.normalizeText --------------------------------------

  test("normalizeText composes, strips controls, lowercases, collapses") {
    import graft.functions.TextFunctions
    val raw = "CAFÉ  du\t\tMonde \n"
    val got = Seq(raw).toDF("t")
      .select(TextFunctions.normalizeText(col("t")))
      .head().getString(0)
    assert(got === "café du monde")
    // whitespace controls (\t \n) survive the control strip so the
    // collapse step still separates tokens
    val tabbed = Seq("a\tb").toDF("t")
      .select(TextFunctions.normalizeText(col("t")))
      .head().getString(0)
    assert(tabbed === "a b")
    // decomposed A + combining ring composes to precomposed å; the
    // C0 control is stripped entirely
    val decomposed = Seq("A\u030a\u0001x").toDF("t")
      .select(TextFunctions.normalizeText(col("t")))
      .head().getString(0)
    assert(decomposed === "åx")
    assert(decomposed.length === 2)
  }

  test("curriculumStages: null weights get a null stage, skew nothing") {
    val docs = Seq((1L, Some(1L)), (2L, Some(2L)), (3L, Some(3L)),
      (4L, Some(4L)), (5L, None), (6L, None))
      .toDF("doc_id", "w")
    val got = Sampling.curriculumStages(docs, "w", 2)
      .select("doc_id", "stage")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // the 4 real weights split 2/2 as if the nulls did not exist;
    // null-weight rows survive with a null stage
    assert(got === Map(1L -> Some(0L), 2L -> Some(0L), 3L -> Some(1L),
      4L -> Some(1L), 5L -> None, 6L -> None))
  }

  // ---- EventFlows.sequenceExamples --------------------------------------

  test("sequenceExamples emits full-context next-token pairs only") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    val events = Seq(
      (1L, 101L, "a", t(0)), (1L, 102L, "b", t(1)),
      (1L, 103L, "c", t(2)), (1L, 104L, "d", t(3)),
      (1L, 105L, "e", t(4)),
      (2L, 201L, "x", t(0)), (2L, 202L, "y", t(1)),
      (2L, 203L, "z", t(2)) // only 2 predecessors: no example
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = EventFlows
      .sequenceExamples(events, "user_id", "event_id", "event_type",
        "ts", contextLen = 3)
      .select("event_id", "context", "target")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got === Set(
      (104L, "a>b>c", "d"),
      (105L, "b>c>d", "e")
    ))
  }

  test("sequenceExamples: a null event type nulls the context, never truncates") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    val events = Seq(
      (1L, 101L, Some("a"), t(0)), (1L, 102L, None, t(1)),
      (1L, 103L, Some("c"), t(2)), (1L, 104L, Some("d"), t(3))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = EventFlows
      .sequenceExamples(events, "user_id", "event_id", "event_type",
        "ts", contextLen = 3)
      .select("event_id", "context", "target")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1), r.getString(2)))
      .toSet
    // event 104's window is [a, null, c]: the context must be NULL
    // (like SQL's null-propagating ||), NOT the truncated "a>c" that
    // concat_ws alone would fabricate
    assert(got === Set((104L, null, "d")))
  }

  test("sequenceExamples breaks equal-timestamp ties by id") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = Seq(
      (1L, 4L, "d", ts0), (1L, 3L, "c", ts0),
      (1L, 2L, "b", ts0), (1L, 1L, "a", ts0)
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = EventFlows
      .sequenceExamples(events, "user_id", "event_id", "event_type",
        "ts", contextLen = 3)
      .select("context", "target")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    assert(got === Set(("a>b>c", "d")))
  }
}
