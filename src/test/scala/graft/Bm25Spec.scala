package graft

import graft.functions.TextFunctions
import graft.operators.Bm25
import graft.queries.RetrievalQueries
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpecBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark spark spark join window"), // tf-heavy on the rare term
    (2L, "spark join table table table table table table table table"),
    (3L, "table scan filter merge hash"),
    (4L, "window window window window window window window window"),
    (5L, "the quick brown fox")
  ).toDF("doc_id", "text")

  private def run(terms: Seq[(Long, String)], logIdf: Boolean) =
    Bm25.topK(corpus, "doc_id", "text", TextFunctions.tokens,
      TextFunctions.tokensLocal, terms.toDF("query_id", "term"),
      "query_id", "term", k = 10, logIdf = logIdf)

  test("tokensLocal matches the tokens column expression exactly") {
    // the traps: SQL trim strips only ' ' (Java trim eats \t\n\r too);
    // Spark split keeps trailing empties (Java default drops them)
    val texts = Seq("a b", "  a  b  ", "\ta b", "a b\n", "a\tb", "", "  ",
      "\t", "one", " lead", "trail ")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val viaColumn = df
      .select($"id", TextFunctions.tokens($"t").as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList)
      .toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(TextFunctions.tokensLocal(t).toList === viaColumn(i.toLong),
        s"text=${t.replace("\t", "\\t").replace("\n", "\\n")}")
    }
    assert(TextFunctions.tokensLocal(null).isEmpty)
  }

  test("docs sharing no query term never appear; matches rank by score") {
    val got = run(Seq(1L -> "spark", 1L -> "join"), logIdf = true)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(2)).toSet === Set(1L, 2L)) // never 3,4,5
    // doc 1: spark tf=3 + join; doc 2: spark tf=1 diluted by length
    assert(got.head.getLong(2) === 1L)
    assert(got.map(_.getLong(1)).toSeq === Seq(1L, 2L))
    assert(got.forall(_.getDouble(3) > 0.0))
  }

  test("rarer term outweighs common term at equal tf and length") {
    // "scan" appears in 1 doc, "window" in 2 → one occurrence of scan
    // must score higher than one of window for the same doc shape
    val byTerm = run(Seq(10L -> "scan", 20L -> "join"), logIdf = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // doc 3 is the only scan doc; join appears in docs 1 and 2
    assert(byTerm(10L) > 0.0 && byTerm(20L) > 0.0)
  }

  test("tf saturation: 8x tf gains less than 8x score") {
    // doc 4 is pure "window" tf=8; doc 1 has tf=1 (longer dl though) —
    // saturation bounds the ratio well under 8
    val scores = run(Seq(1L -> "window"), logIdf = true)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(scores(4L) > scores(1L))
    assert(scores(4L) < 8 * scores(1L))
  }

  test("rational and ln idf produce the same per-term doc ordering") {
    // single-term queries: ln is monotone in the odds, so orderings match
    for (term <- Seq("spark", "table", "window", "join")) {
      val a = run(Seq(1L -> term), logIdf = true)
        .orderBy("rank").collect().map(_.getLong(2)).toSeq
      val b = run(Seq(1L -> term), logIdf = false)
        .orderBy("rank").collect().map(_.getLong(2)).toSeq
      assert(a === b, s"term=$term")
    }
  }

  test("RRF fuses two lists: both-list docs beat single-list docs") {
    import graft.operators.RankFusion
    // doc 1 ranks 1st in A and 3rd in B; doc 2 only 2nd in A; doc 3
    // only 1st in B. 1/(60+1)+1/(60+3) > 1/(60+1) > 1/(60+2)
    val ranked = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "a"),
      (1L, 3L, 1L, "b"), (1L, 1L, 3L, "b")
    ).toDF("q", "d", "r", "s")
    val got = RankFusion.rrf(ranked, "q", "d", "r", "s", k = 10)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(1L, 3L, 2L))
    val s = got.map(_.getDouble(3))
    assert(s(0) === 1.0 / 61 + 1.0 / 63)
    assert(s(1) === 1.0 / 61 && s(2) === 1.0 / 62)
  }

  test("q103 on sf0.001: fused top-10 per query, unique docs") {
    val got = RetrievalQueries.qHybridRrf(spark, "/root/testdata/sf0.001")
      .collect()
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(1L, 2L, 3L))
    for ((q, rows) <- byQ) {
      assert(rows.length === 10, s"query $q")
      assert(rows.map(_.getLong(2)).distinct.length === 10)
      val sorted = rows.sortBy(_.getLong(1))
      val s = sorted.map(_.getDouble(3)).toSeq
      assert(s === s.sorted.reverse)
    }
  }

  test("RetrievalEval: recall and mrr on a hand-checked fixture") {
    import graft.operators.RetrievalEval
    val ranked = Seq(
      (1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L), // rel: 11 @2, 12 @3
      (2L, 1L, 20L), (2L, 2L, 21L) // no relevant retrieved
    ).toDF("q", "r", "d")
    val rel = Seq((1L, 11L), (1L, 12L), (1L, 99L), (2L, 77L))
      .toDF("q", "d")
    val got = RetrievalEval.metrics(ranked, "q", "r", "d", rel, "q", "d")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got(1L) === ((3L, 2L, 2.0 / 3.0, 0.5))) // first hit at rank 2
    assert(got(2L) === ((1L, 0L, 0.0, 0.0)))
  }

  test("q104 on sf0.001: one row per query, metrics in range") {
    val got = RetrievalQueries.qRetrievalEval(spark, "/root/testdata/sf0.001")
      .collect()
    assert(got.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    got.foreach { r =>
      assert(r.getLong(1) > 0) // every label has >1 member
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("IndexStats: incremental df equals full recompute, all change kinds") {
    import graft.operators.{IndexStats, MergeOps}
    val docs = Seq(
      (1L, "alpha beta"), (2L, "beta gamma"), (3L, "alpha alpha delta"),
      (4L, "solo")
    ).toDF("doc_id", "text")
    // update replacing text (drops beta, adds zeta), plus a new doc
    val updates = Seq((2L, "zeta gamma"), (9L, "alpha zeta"))
      .toDF("doc_id", "text")
    val spec = MergeOps.MergeSpec(Seq("doc_id"))
    val incr = IndexStats.applyChanges(
      IndexStats.termDf(docs, "text", TextFunctions.tokensLocal),
      MergeOps.changeFeed(docs, updates, spec),
      "text", TextFunctions.tokensLocal)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = IndexStats.termDf(
      MergeOps.merge(docs, updates, spec), "text",
      TextFunctions.tokensLocal)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(incr === full)
    assert(incr("beta") === 1L) // dropped from doc 2, kept in doc 1
    assert(incr("zeta") === 2L) // doc 2 update + doc 9 insert
    assert(!incr.contains("")) // no empty terms, no zero-df residue
  }

  test("q101 on sf0.001: k ranks per query, unique docs, sorted scores") {
    val got = RetrievalQueries.qBm25TopK(spark, "/root/testdata/sf0.001")
      .collect()
    assert(got.nonEmpty)
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(1L, 2L, 3L))
    for ((q, rows) <- byQ) {
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length).toSeq)
      assert(sorted.map(_.getLong(2)).distinct.length === sorted.length)
      // scores non-increasing with rank
      val s = sorted.map(_.getDouble(3)).toSeq
      assert(s === s.sorted.reverse, s"query $q not sorted: $s")
    }
  }
}
