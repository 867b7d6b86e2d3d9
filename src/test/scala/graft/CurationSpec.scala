package graft

import graft.operators.{BpeVocab, CountMinSketch, GraphOps, NearDedup, QualityRules, Tokenize}
import graft.queries.CurationQueries
import org.apache.spark.sql.functions._

/** Round-6 curation operators: Gopher quality-rule kernel, paragraph-level
  * dedup, integer-exact PageRank, and the MAD-outlier query invariants.
  */
class CurationSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def stats(text: String, stop: Seq[String] = QualityRules.StopWords) =
    QualityRules.statsLocal(text,
      stop.map(w => java.util.regex.Pattern.compile("\\b" + w + "\\b")).toArray)

  test("quality kernel counts words, symbols, lines, bullets, ellipses") {
    val t = "- the quick #item\n* another line...\nplain text with … end\n\nthe be to"
    val (nW, wc, nSym, nL, nB, nE, nStop) = stats(t)
    assert(nW === 15L) // whitespace tokens of trimmed text
    assert(wc === t.count(c => !c.isWhitespace).toLong)
    assert(nSym === 3L) // one '#', one '...', one '…'
    assert(nL === 5L) // 4 newlines
    assert(nB === 2L) // '-' and '*' lines
    assert(nE === 1L) // only the '...' line ends with an ellipsis
    assert(nStop === 4L) // the, be, to, with
  }

  test("ellipsis rule only fires at line END; bullet allows indent") {
    val (_, _, _, _, nB, nE, _) = stats("  \t- indented\nmid ... dots\nends...")
    assert(nB === 1L)
    assert(nE === 1L)
  }

  test("kernel mirrors SQL trim/whitespace semantics, not Java's") {
    // SQL trim strips only SPACES: a trailing newline survives the trim
    // and the regex split then yields a trailing empty token — Java's
    // String.trim would eat it and undercount by one
    val (nW, wc, _, _, _, _, _) = stats("foo bar\n")
    assert(nW === 3L) // ['foo', 'bar', '']
    assert(wc === 6L)
    // vertical tab: NOT whitespace in RE2 — it's a word char and a glue
    val (nW2, wc2, _, _, _, _, _) = stats("a\u000Bb")
    assert(nW2 === 1L)
    assert(wc2 === 3L)
    // non-BMP char counts as ONE word char (code points, not UTF-16 units)
    val (_, wc3, _, _, _, _, _) = stats("a𝒳b")
    assert(wc3 === 3L)
  }

  test("empty and null-ish text behave like the SQL formulas") {
    val (nW, wc, _, nL, _, _, nStop) = stats("")
    assert(nW === 1L) // split('') == [''] — same as DuckDB string_split_regex
    assert(wc === 0L)
    assert(nL === 1L)
    assert(nStop === 0L)
  }

  test("keep verdict uses integer cross-multiplication, no float ratios") {
    import spark.implicits._
    // 9 words of 3 chars: mean length exactly 3.0 — boundary must KEEP
    val doc = Seq.fill(4)("the and").mkString(" ") + " the"
    val df = QualityRules.withQualityRules(
      Seq((1L, doc)).toDF("doc_id", "text"), "text", minWords = 5L)
    val r = df.select("n_words", "word_chars", "keep").head()
    assert(r.getLong(0) === 9L && r.getLong(1) === 27L)
    assert(r.getBoolean(2) === true)
    // 9 words of 2 chars: mean 2.0 < 3 — must DROP (stopwords still ≥2)
    val df2 = QualityRules.withQualityRules(
      Seq((1L, Seq.fill(4)("to be").mkString(" ") + " to")).toDF("doc_id", "text"),
      "text", minWords = 5L)
    assert(df2.select("keep").head().getBoolean(0) === false)
  }

  test("paragraph dedup keeps first corpus-wide occurrence") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta\n\nshared para\n\ngamma"),
      (2L, "shared para\n\ndelta"),
      (3L, "  shared para  \n\nalpha beta")
    ).toDF("id", "text")
    val pd = NearDedup.paragraphDedup(docs, "id", "text")
      .select("id", "idx", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pd((1L, 0L)) === 1L) // first "alpha beta"
    assert(pd((1L, 1L)) === 1L) // first "shared para"
    assert(pd((2L, 0L)) === 2L) // dup of doc 1's paragraph
    assert(pd((3L, 0L)) === 3L) // trimmed to the same paragraph → third copy
    assert(pd((3L, 1L)) === 2L) // "alpha beta" dup
  }

  test("pageRank one iteration matches the hand-computed integer recurrence") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    val got = GraphOps.pageRank(edges, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // n=3, init=333333333333, base=150000000000//3=50000000000
    // node1 ← r2 div 2: 50000000000 + 85*166666666666//100 = 191666666666
    // node2 ← r1 div 1: 50000000000 + 85*333333333333//100 = 333333333333
    // node3 ← r2 div 2: same as node 1
    assert(got === Map(1L -> 191666666666L, 2L -> 333333333333L,
      3L -> 191666666666L))
  }

  test("pageRank conserves bounded mass and is deterministic across runs") {
    import spark.implicits._
    val edges = (0L until 60L).map(i => (i, (i * 7 + 3) % 60)).toDF("src", "dst")
    val a = GraphOps.pageRank(edges, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraphOps.pageRank(edges, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    val total = a.values.sum
    assert(total > 0L && total <= 1000000000000L) // floor divisions only lose mass
  }

  test("q123 MAD outliers: med/mad are actual data values, flags consistent") {
    val rows = CurationQueries.qMadOutliers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_events")
      val nOut = r.getAs[Long]("n_outliers")
      assert(nOut >= 0L && nOut < n) // an outlier rule can't flag everything
      assert(r.getAs[Double]("mad") >= 0.0)
    }
  }

  test("triangles: oriented wedge join finds exactly the closed triples") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles) + a pendant edge + a hub star that
    // closes nothing
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (9L, 10L), (9L, 11L), (9L, 12L)).toDF("src", "dst")
    val got = GraphOps.triangles(edges, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("triangles: direction and duplicate edges do not change the set") {
    import spark.implicits._
    val a = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val b = Seq((2L, 1L), (3L, 2L), (1L, 3L), (1L, 2L), (1L, 1L)).toDF("src", "dst")
    val ta = GraphOps.triangles(a, "src", "dst").collect().toSeq.map(_.toSeq)
    val tb = GraphOps.triangles(b, "src", "dst").collect().toSeq.map(_.toSeq)
    assert(ta === Seq(Seq(1L, 2L, 3L)) && tb === ta)
  }

  test("BPE distributed trainer equals the single-machine reference") {
    import spark.implicits._
    val wc = Seq(("lower", 5L), ("lowest", 2L), ("newer", 6L), ("wider", 3L))
    val got = BpeVocab.train(spark, wc.toDF("w", "cnt"), "w", "cnt", merges = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val want = BpeVocab.trainLocal(wc, merges = 6)
    assert(got === want)
    // classic example: 'er' merges first (lower 5 + newer 6 + wider 3 = 14)
    assert(got.head._2 == "e" && got.head._3 == "r" && got.head._4 == 14L)
  }

  test("BPE stops when no pairs remain") {
    import spark.implicits._
    val got = BpeVocab.train(spark, Seq(("ab", 3L)).toDF("w", "cnt"),
      "w", "cnt", merges = 5).collect()
    assert(got.length === 1) // after merging 'a b' the word is one symbol
  }

  test("q186 forced-merge derivation matches the single-machine trainer") {
    // the q186 oracle's hand-derived rule sequence, with n0..n3 = 1 —
    // the derivation is class-size-free as long as tiers dominate
    val wc = Seq(("aaaa", 1000L), ("aabb", 100L), ("abab", 10L), ("bbba", 1L))
    val got = BpeVocab.trainLocal(wc, merges = 8)
    val want = Seq(
      (1, "a", "a", 3 * 1000L + 100L),
      (2, "aa", "aa", 1000L),
      (3, "b", "b", 100L + 2 * 1L),
      (4, "aa", "bb", 100L),
      (5, "a", "b", 2 * 10L),
      (6, "ab", "ab", 10L),
      (7, "b", "a", 1L), // count tie vs (bb,b) — UTF-8 pair-key order
      (8, "bb", "ba", 1L))
    assert(got === want)
    // and the q187 5-rule encode segmentation per class word
    val rank = want.take(5).map(t => (t._2, t._3)).zipWithIndex.toMap
    val toks = Seq("aaaa", "aabb", "abab", "bbba")
      .map(w => Tokenize.encodeWord(w, rank).length)
    assert(toks === Seq(1, 1, 2, 3))
  }

  test("q127 merge rules on the corpus are deterministic across runs") {
    val a = CurationQueries.qBpeVocab(spark, sf).collect().map(_.toSeq).toSeq
    val b = CurationQueries.qBpeVocab(spark, sf).collect().map(_.toSeq).toSeq
    assert(a === b && a.nonEmpty)
  }

  test("count-min sketch never undercounts and is exact without collisions") {
    import spark.implicits._
    val keyed = Seq(("a", 100L), ("b", 40L), ("c", 7L)).toDF("k", "w")
    val sk = CountMinSketch.build(keyed, "k", "w", depth = 4, width = 1024)
    val est = CountMinSketch.probe(sk, Seq("a", "b", "c").toDF("k"), "k",
      depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 keys in 4×1024 cells: no collisions, estimates exact
    assert(est === Map("a" -> 100L, "b" -> 40L, "c" -> 7L))
    // total mass per depth row equals the input mass
    val perDepth = sk.groupBy("depth").sum("cnt").collect()
      .map(r => r.getLong(1)).toSeq
    assert(perDepth === Seq.fill(4)(147L))
  }

  test("count-min sketch: absent keys probe to zero, not silence") {
    import spark.implicits._
    val sk = CountMinSketch.build(
      Seq(("a", 5L)).toDF("k", "w"), "k", "w", depth = 4, width = 1024)
    val est = CountMinSketch.probe(sk, Seq("a", "never-seen").toDF("k"), "k",
      depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("a" -> 5L, "never-seen" -> 0L))
  }

  test("BPE handles non-BMP symbols as whole code points") {
    import spark.implicits._
    val wc = Seq(("𝒳a", 5L), ("𝒳b", 3L))
    val got = BpeVocab.train(spark, wc.toDF("w", "cnt"), "w", "cnt", merges = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    val want = BpeVocab.trainLocal(wc, merges = 1)
      .map(t => (t._2, t._3, t._4))
    assert(got.toSeq === want)
    assert(got.head._1 === "𝒳") // the surrogate pair stays whole
  }

  test("count-min sketch under heavy collision still upper-bounds") {
    import spark.implicits._
    val keyed = (1 to 500).map(i => (s"k$i", 1L)).toDF("k", "w")
    val sk = CountMinSketch.build(keyed, "k", "w", depth = 4, width = 8)
    val est = CountMinSketch.probe(sk, Seq("k1", "k499").toDF("k"), "k",
      depth = 4, width = 8)
      .collect().map(r => r.getLong(1))
    assert(est.forall(_ >= 1L)) // never undercounts the true count of 1
  }

  test("q129 drift effect ranking is integer-exact and symmetric") {
    val rows = CurationQueries.qDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ca, cb) = (r.getAs[Long]("cnt_a"), r.getAs[Long]("cnt_b"))
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(r.getAs[Long]("effect") === math.abs(ca * nb - cb * na))
    }
    val effects = rows.map(_.getAs[Long]("effect")).toSeq
    assert(effects === effects.sorted.reverse)
  }

  test("join discovery: identical value sets match on every salt") {
    import spark.implicits._
    val a = (1 to 100).map(_.toString).toDF("x")
    val b = (1 to 100).map(_.toString).toDF("y")
    val c = (900 to 999).map(_.toString).toDF("z")
    val m = graft.operators.JoinDiscovery.matchMatrix(spark,
      Seq(("t.a", a, "x"), ("t.b", b, "y"), ("t.c", c, "z")), k = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(m(("t.a", "t.b")) === 16L) // same set → all minima equal
    assert(m(("t.a", "t.c")) === 0L) // disjoint sets → no matches
  }

  test("join discovery: q132 finds the real FK relationships") {
    val rows = CurationQueries.qJoinDiscovery(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // o_custkey values ⊂ c_custkey: high overlap; nation keys identical
    assert(rows(("customer.c_nationkey", "nation.n_nationkey")) >= 24L)
    assert(rows(("customer.c_custkey", "orders.o_custkey")) >= 16L)
    // unrelated domains (custkey vs orderkey) overlap at most by chance
    assert(rows(("customer.c_custkey", "orders.o_orderkey")) <= 8L)
  }

  test("shortest paths: weighted relaxation finds the cheap detour") {
    import spark.implicits._
    // 0→1 costs 10 direct, but 0→2→1 costs 1+2=3; node 3 unreachable
    val edges = Seq((0L, 1L, 10L), (0L, 2L, 1L), (2L, 1L, 2L), (3L, 0L, 1L))
      .toDF("src", "dst", "w")
    val got = GraphOps.shortestPaths(edges, "src", "dst", Some("w"),
      source = 0L, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 3L, 2L -> 1L,
      3L -> GraphOps.Unreachable))
  }

  test("shortest paths: parallel edges keep the minimum weight") {
    import spark.implicits._
    val edges = Seq((0L, 1L, 9L), (0L, 1L, 4L)).toDF("src", "dst", "w")
    val got = GraphOps.shortestPaths(edges, "src", "dst", Some("w"),
      source = 0L, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 4L)
  }

  test("shortest paths: unweighted hop counts on a chain need the rounds") {
    import spark.implicits._
    val chain = (0L until 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = GraphOps.shortestPaths(chain, "src", "dst", None,
      source = 0L, iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 6L).forall(i => got(i) === i))
    // too few rounds: the far end stays unreached — the iters contract
    val short = GraphOps.shortestPaths(chain, "src", "dst", None,
      source = 0L, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(short(6L) === GraphOps.Unreachable)
  }

  test("q122 co-occurrence counts are symmetric-upper and df-bounded") {
    val rows = CurationQueries.qCooccur(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("term_a"), r.getAs[String]("term_b"))
      assert(a < b)
      val nAb = r.getAs[Long]("n_ab")
      assert(nAb <= math.min(r.getAs[Long]("df_a"), r.getAs[Long]("df_b")))
    }
  }
}
