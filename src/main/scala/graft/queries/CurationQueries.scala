package graft.queries

import graft.functions.TextFunctions._
import graft.operators.{BpeVocab, CountMinSketch, GraphOps, JoinDiscovery, NearDedup, QualityRules, Tokenize}
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 corpus-curation operators: Gopher quality rules, paragraph-level
  * dedup, integer-exact PageRank centrality, co-occurrence statistics, and
  * robust (median/MAD) outlier flagging. Every query is oracle-checked —
  * the float-nondeterminism traps (ratio thresholds, interpolated medians,
  * re-ordered float sums) are designed out with integer cross-
  * multiplication, discrete medians, and integer micro-rank arithmetic.
  */
object CurationQueries {

  /** Corpus-tuned stopword list for the synthetic `documents` vocabulary
    * (the Gopher defaults are web-English; this corpus is a ~40-word
    * synthetic vocabulary, so presence checks use its frequent terms).
    */
  private val CorpusStop = Seq("the", "a", "and", "of", "to", "data", "value", "table")

  /** q119 — Gopher-style quality-rule battery over `documents`: integer
    * metric counts plus the exact cross-multiplied keep verdict.
    */
  def qGopherRules(spark: SparkSession, dir: String): DataFrame =
    QualityRules
      .withQualityRules(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")),
        "text", minWords = 30L, maxWords = 100000L, stopwords = CorpusStop)
      .select(col("doc_id"), col("n_words"), col("word_chars"), col("n_sym"),
        col("n_lines"), col("n_bullet"), col("n_ellip"), col("n_stop"),
        col("keep"))
      .orderBy("doc_id")

  val qGopherRulesSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
      |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS word_chars,
      |  CAST(length(text) - length(replace(text, '#', ''))
      |     + len(regexp_extract_all(text, '\.\.\.'))
      |     + length(text) - length(replace(text, '…', '')) AS BIGINT) AS n_sym,
      |  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
      |  CAST(len(list_filter(string_split(text, chr(10)),
      |       l -> regexp_matches(l, '^[ \t\r]*[-*•]'))) AS BIGINT) AS n_bullet,
      |  CAST(len(list_filter(string_split(text, chr(10)),
      |       l -> regexp_matches(l, '(\.\.\.|…)[ \t\r]*$'))) AS BIGINT) AS n_ellip,
      |  CAST((CASE WHEN regexp_matches(lower(text), '\bthe\b') THEN 1 ELSE 0 END)
      |     + (CASE WHEN regexp_matches(lower(text), '\ba\b') THEN 1 ELSE 0 END)
      |     + (CASE WHEN regexp_matches(lower(text), '\band\b') THEN 1 ELSE 0 END)
      |     + (CASE WHEN regexp_matches(lower(text), '\bof\b') THEN 1 ELSE 0 END)
      |     + (CASE WHEN regexp_matches(lower(text), '\bto\b') THEN 1 ELSE 0 END)
      |     + (CASE WHEN regexp_matches(lower(text), '\bdata\b') THEN 1 ELSE 0 END)
      |     + (CASE WHEN regexp_matches(lower(text), '\bvalue\b') THEN 1 ELSE 0 END)
      |     + (CASE WHEN regexp_matches(lower(text), '\btable\b') THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_stop,
      |  (n_words >= 30 AND n_words <= 100000
      |   AND 3 * n_words <= word_chars AND word_chars <= 10 * n_words
      |   AND 10 * n_sym <= n_words
      |   AND 10 * n_bullet <= 9 * n_lines
      |   AND 10 * n_ellip <= 3 * n_lines
      |   AND n_stop >= 2) AS keep
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q120 — corpus-wide paragraph-level exact dedup. The synthetic docs are
    * single-line, so multi-paragraph "pages" are built deterministically
    * (three consecutive docs joined on blank lines, every 7th page also
    * re-keyed as an exact copy); the operator then keeps each paragraph's
    * first corpus-wide occurrence and reports per-page survivor stats.
    */
  def qParaDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val pages = docs
      .groupBy(expr("doc_id div 3").as("page_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          s => s.getField("text")),
        "\n\n").as("text"))
    val copies = pages.filter(col("page_id") % 7 === 0)
      .withColumn("page_id", col("page_id") + lit(2000000L))
    val all = pages.unionByName(copies)
    NearDedup.paragraphDedup(all, "page_id", "text")
      .groupBy(col("id").as("page_id"))
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_paras"),
        sum(when(col("rn") === 1, col("plen")).otherwise(0L)).as("kept_chars"))
      .orderBy("page_id")
  }

  val qParaDedupSql: String =
    """WITH pages AS (
      |  SELECT doc_id // 3 AS page_id,
      |         string_agg(text, chr(10)||chr(10) ORDER BY doc_id) AS text
      |  FROM documents GROUP BY doc_id // 3),
      |alldocs AS (
      |  SELECT page_id, text FROM pages
      |  UNION ALL
      |  SELECT page_id + 2000000, text FROM pages WHERE page_id % 7 = 0),
      |p0 AS (
      |  SELECT page_id,
      |         unnest(string_split_regex(text, '\n\n')) AS para,
      |         generate_subscripts(string_split_regex(text, '\n\n'), 1) AS idx
      |  FROM alldocs),
      |p AS (SELECT page_id, idx, trim(para) AS para
      |      FROM p0 WHERE length(trim(para)) > 0),
      |r AS (SELECT page_id, idx, length(para) AS plen,
      |        ROW_NUMBER() OVER (PARTITION BY md5(para) ORDER BY page_id, idx) AS rn
      |      FROM p)
      |SELECT page_id, CAST(COUNT(*) AS BIGINT) AS n_paras,
      |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paras,
      |  CAST(SUM(CASE WHEN rn = 1 THEN plen ELSE 0 END) AS BIGINT) AS kept_chars
      |FROM r GROUP BY page_id ORDER BY page_id""".stripMargin

  /** q121 — PageRank over the customer-nation → supplier-nation trade graph
    * (distinct nation pairs that actually traded), 5 iterations of
    * [[GraphOps.pageRank]]'s integer micro-rank recurrence — bit-exact
    * against the unrolled oracle below.
    */
  def qPageRank(spark: SparkSession, dir: String): DataFrame =
    GraphOps.pageRank(tradeEdges(spark, dir), "src", "dst", iters = 5)
      .orderBy("node")

  private def prIterSql(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT nd.node,
       |    (150000000000 // p.n) + (85 * COALESCE(s.inr, 0)) // 100 AS rank
       |  FROM nodes nd CROSS JOIN params p LEFT JOIN (
       |    SELECT e.dst AS node, CAST(SUM(r.rank // d.deg) AS BIGINT) AS inr
       |    FROM edges e JOIN $prev r ON e.src = r.node
       |    JOIN deg d ON e.src = d.src
       |    GROUP BY e.dst) s ON nd.node = s.node)""".stripMargin

  val qPageRankSql: String = {
    val iters = (0 until 5)
      .map(i => prIterSql(s"r$i", s"r${i + 1}")).mkString(",\n")
    s"""WITH edges AS (
       |  SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
       |                  CAST(s.s_nationkey AS BIGINT) AS dst
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
       |        FROM edges GROUP BY src),
       |params AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
       |r0 AS (SELECT node, 1000000000000 // p.n AS rank
       |       FROM nodes CROSS JOIN params p),
       |$iters
       |SELECT node, CAST(rank AS BIGINT) AS rank FROM r5 ORDER BY node""".stripMargin
  }

  /** q122 — document co-occurrence statistics for the top-50 vocabulary:
    * for every vocab pair, in how many documents both terms appear. All
    * outputs are integer counts (the consumer derives PMI from them), so
    * the oracle is exact. The pair stage self-joins per doc_id over the
    * ≤50-term vocab intersection — bounded ≤1225 pairs per doc, shuffled
    * on doc_id, with the vocab side broadcast.
    */
  def qCooccur(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("term"))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term").asc)
      .limit(50)
      .localCheckpoint(true) // 50 rows; avoids re-running the token scan per reuse
    val vt = toks.join(broadcast(vocab.select("term")), Seq("term"))
    val pairs = vt.select(col("doc_id"), col("term").as("term_a"))
      .join(vt.select(col("doc_id"), col("term").as("term_b")), Seq("doc_id"))
      .filter(col("term_a") < col("term_b"))
      .groupBy("term_a", "term_b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 5)
    pairs
      .join(broadcast(vocab.select(col("term").as("term_a"), col("df").as("df_a"))), Seq("term_a"))
      .join(broadcast(vocab.select(col("term").as("term_b"), col("df").as("df_b"))), Seq("term_b"))
      .orderBy(col("n_ab").desc, col("term_a").asc, col("term_b").asc)
      .limit(100)
      .select("term_a", "term_b", "n_ab", "df_a", "df_b")
  }

  val qCooccurSql: String =
    """WITH toks AS (
      |  SELECT DISTINCT doc_id,
      |         unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |vocab AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
      |          FROM toks GROUP BY term ORDER BY df DESC, term ASC LIMIT 50),
      |vt AS (SELECT t.doc_id, t.term FROM toks t JOIN vocab v ON t.term = v.term),
      |p AS (SELECT a.term AS term_a, b.term AS term_b,
      |             CAST(COUNT(*) AS BIGINT) AS n_ab
      |      FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.term < b.term
      |      GROUP BY a.term, b.term
      |      HAVING COUNT(*) >= 5)
      |SELECT p.term_a, p.term_b, p.n_ab, va.df AS df_a, vb.df AS df_b
      |FROM p JOIN vocab va ON p.term_a = va.term
      |       JOIN vocab vb ON p.term_b = vb.term
      |ORDER BY p.n_ab DESC, p.term_a ASC, p.term_b ASC LIMIT 100""".stripMargin

  /** q123 — robust outlier detection per event type: DISCRETE median (the
    * order statistic at position ⌈n/2⌉, an actual data value — no
    * interpolation, so engines can't disagree), MAD from it the same way,
    * and the |v − med| > 3·MAD flag. Two window passes + one broadcast
    * join; the per-type medians are grouped order statistics, never a
    * driver sort.
    */
  def qMadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
    def discMedian(df: DataFrame, valCol: String, outCol: String): DataFrame = {
      val w = Window.partitionBy("event_type").orderBy(col(valCol))
      val wAll = Window.partitionBy("event_type")
      df.withColumn("__rn", row_number().over(w).cast("long"))
        .withColumn("__n", count(lit(1)).over(wAll))
        .filter(col("__rn") === expr("(__n + 1) div 2"))
        .select(col("event_type"), col(valCol).as(outCol))
    }
    val med = discMedian(ev, "value", "med")
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = discMedian(dev.select(col("event_type"), col("dev")), "dev", "mad")
    dev.join(broadcast(mad), Seq("event_type"))
      .withColumn("is_out", col("dev") > lit(3.0) * col("mad"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"),
        min(when(col("is_out"), col("value"))).as("min_out"),
        max(when(col("is_out"), col("value"))).as("max_out"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"))
      .orderBy("event_type")
  }

  /** The nation-trade edge frame shared by q121/q124: distinct
    * (customer nation, supplier nation) pairs that actually traded.
    */
  private def tradeEdges(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .select(c("c_nationkey").as("src"), s("s_nationkey").as("dst"))
      .distinct()
  }

  /** q124 — triangle enumeration over the undirected nation-trade graph
    * ([[GraphOps.triangles]], degree-oriented wedge join). The oracle is
    * the naive a<b<c three-way join — same triangle set, which is exactly
    * what the orientation rewrite must preserve.
    */
  def qTriangles(spark: SparkSession, dir: String): DataFrame =
    GraphOps.triangles(tradeEdges(spark, dir), "src", "dst")
      .orderBy("ta", "tb", "tc")

  val qTrianglesSql: String =
    """WITH raw AS (
      |  SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
      |                  CAST(s.s_nationkey AS BIGINT) AS dst
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
      |ce AS (
      |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |  FROM raw WHERE src <> dst)
      |SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
      |FROM ce e1
      |JOIN ce e2 ON e2.a = e1.b
      |JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b
      |ORDER BY ta, tb, tc""".stripMargin

  /** q125 — pairwise corpus-overlap matrix between sources: distinct
    * 3-token shingles per source, then |A∩B| / |A| / |B| / |A∪B| as exact
    * integer counts for every source pair. The pair stage joins on the
    * GRAM key (each gram meets only the sources containing it), never
    * all-pairs on documents.
    */
  def qSourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("source"), explode(wordNgramsKernel(col("text"), 3)).as("g"))
      .distinct()
      .localCheckpoint(true) // reused by sizes + both join sides
    val sizes = grams.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = grams.select(col("source").as("src_a"), col("g"))
      .join(grams.select(col("source").as("src_b"), col("g")), Seq("g"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("n_a"))), Seq("src_a"))
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("n_b"))), Seq("src_b"))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .select("src_a", "src_b", "n_inter", "n_a", "n_b", "n_union")
      .orderBy("src_a", "src_b")
  }

  val qSourceOverlapSql: String =
    """WITH toks AS (
      |  SELECT source, string_split_regex(trim(text), '\s+') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT DISTINCT source,
      |    unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
      |      i -> array_to_string(t[i:i+2], ' '))) AS g
      |  FROM toks),
      |sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
      |          FROM grams GROUP BY source),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b,
      |         CAST(COUNT(*) AS BIGINT) AS n_inter
      |  FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
      |  GROUP BY a.source, b.source)
      |SELECT i.src_a, i.src_b, i.n_inter, sa.n AS n_a, sb.n AS n_b,
      |  sa.n + sb.n - i.n_inter AS n_union
      |FROM inter i JOIN sizes sa ON i.src_a = sa.source
      |             JOIN sizes sb ON i.src_b = sb.source
      |ORDER BY src_a, src_b""".stripMargin

  /** q126 — n-gram novelty curve: for each doc (in doc_id order), how many
    * of its distinct 3-grams were never seen in any earlier doc. One
    * gram-keyed min-aggregate + one join back; the standard corpus-growth
    * diagnostic for dataset curation.
    */
  def qNovelty(spark: SparkSession, dir: String): DataFrame = {
    // distinct (doc, gram) pairs once; first_doc via a window over the
    // gram key — one gram-keyed shuffle + one doc-keyed aggregate, no
    // second evaluation of the gram pipeline for a join build side
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(array_distinct(wordNgramsKernel(col("text"), 3))).as("g"))
    grams
      .withColumn("first_doc",
        min(col("doc_id")).over(Window.partitionBy("g")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .orderBy("doc_id")
  }

  val qNoveltySql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
      |      i -> array_to_string(t[i:i+2], ' '))) AS g
      |  FROM toks),
      |first AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g)
      |SELECT gr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |  CAST(SUM(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_novel
      |FROM grams gr JOIN first f ON gr.g = f.g
      |GROUP BY gr.doc_id ORDER BY gr.doc_id""".stripMargin

  /** q127 — BPE vocabulary induction over the corpus word-frequency
    * dictionary ([[BpeVocab.train]], 8 merges). No oracle: the merge loop
    * is iterative argmax state the driver's SQL gate can't express;
    * CurationSpec pins the distributed trainer against the single-machine
    * reference implementation instead (rows-only gate).
    */
  def qBpeVocab(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    BpeVocab.train(spark, words, "w", "cnt", merges = 8)
  }

  /** q186 — forced-merge BPE trainer gate (the q152/q185 id-class trick
    * applied to q127's rows-only justification): per doc_id-mod-4 class
    * a fixed word (`aaaa`/`aabb`/`abab`/`bbba`) weighted by a 1000×/
    * 100×/10×/1× count tier, so every one of the 8 merge rounds has a
    * tier-separated argmax and the WINNING pair sequence — including
    * one deliberate count tie broken by the UTF-8 pair-key order
    * (round 7: `(b,a)` vs `(bb,b)`, both t3) — is hand-derivable. The
    * oracle recomputes each rule's frequency from the class counts
    * (e.g. step 1 `(a,a)` = 3·t0 + t1), so the distributed pair-count
    * aggregate, the argmax ordering, the greedy leftmost merge AND the
    * tie-break are all hash-exact cross-engine; q127 (real corpus)
    * keeps exercising the trainer at vocabulary scale.
    */
  def qBpeForced(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .groupBy((col("doc_id") % 4).as("cls")).agg(count(lit(1)).as("n"))
      .select(
        when(col("cls") === 0, "aaaa").when(col("cls") === 1, "aabb")
          .when(col("cls") === 2, "abab").otherwise("bbba").as("w"),
        (col("n") * when(col("cls") === 0, 1000L)
          .when(col("cls") === 1, 100L).when(col("cls") === 2, 10L)
          .otherwise(1L)).as("cnt"))
    BpeVocab.train(spark, words, "w", "cnt", merges = 8)
  }

  val qBpeForcedSql: String =
    """WITH c AS (
      |  SELECT doc_id % 4 AS cls, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM documents GROUP BY 1),
      |t AS (SELECT
      |  MAX(CASE WHEN cls = 0 THEN n END) * 1000 AS t0,
      |  MAX(CASE WHEN cls = 1 THEN n END) * 100 AS t1,
      |  MAX(CASE WHEN cls = 2 THEN n END) * 10 AS t2,
      |  MAX(CASE WHEN cls = 3 THEN n END) AS t3 FROM c)
      |SELECT 1 AS step, 'a' AS "left", 'a' AS "right", 3 * t0 + t1 AS freq FROM t
      |UNION ALL SELECT 2, 'aa', 'aa', t0 FROM t
      |UNION ALL SELECT 3, 'b', 'b', t1 + 2 * t3 FROM t
      |UNION ALL SELECT 4, 'aa', 'bb', t1 FROM t
      |UNION ALL SELECT 5, 'a', 'b', 2 * t2 FROM t
      |UNION ALL SELECT 6, 'ab', 'ab', t2 FROM t
      |UNION ALL SELECT 7, 'b', 'a', t3 FROM t
      |UNION ALL SELECT 8, 'bb', 'ba', t3 FROM t""".stripMargin

  /** q187 — forced-merge BPE ENCODE gate (the q186 corpus at 5 merges,
    * where the classes segment differently): rules 1–5 leave class-0/1
    * words as 1 token, class 2 as `[ab, ab]` (2) and class 3 as
    * `[bb, b, a]` (3), so the rank-greedy encoder's per-class token
    * counts are pure id arithmetic the oracle reproduces — gating
    * [[graft.operators.Tokenize.encodeCountsUdf]]'s rank selection and
    * greedy-leftmost application cross-engine (q139's real-corpus
    * encode stays rows-only on top of this).
    */
  def qBpeEncodeForced(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val words = docs
      .groupBy((col("doc_id") % 4).as("cls")).agg(count(lit(1)).as("n"))
      .select(
        when(col("cls") === 0, "aaaa").when(col("cls") === 1, "aabb")
          .when(col("cls") === 2, "abab").otherwise("bbba").as("w"),
        (col("n") * when(col("cls") === 0, 1000L)
          .when(col("cls") === 1, 100L).when(col("cls") === 2, 10L)
          .otherwise(1L)).as("cnt"))
    val rules = BpeVocab.train(spark, words, "w", "cnt", merges = 5)
      .orderBy("step").collect() // bounded: exactly 5 rule rows
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Tokenize.encodeCountsUdf(rules)
    docs
      .select((col("doc_id") % 4).as("cls"),
        enc(when(col("doc_id") % 4 === 0, "aaaa")
          .when(col("doc_id") % 4 === 1, "aabb")
          .when(col("doc_id") % 4 === 2, "abab").otherwise("bbba")).as("e"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_docs"), sum(col("e._2")).as("n_tokens"))
  }

  val qBpeEncodeForcedSql: String =
    """SELECT doc_id % 4 AS cls, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(*) * CASE WHEN doc_id % 4 IN (0, 1) THEN 1
      |                       WHEN doc_id % 4 = 2 THEN 2
      |                       ELSE 3 END AS BIGINT) AS n_tokens
      |FROM documents GROUP BY doc_id % 4""".stripMargin

  /** q128 — count-min sketch build + probe ([[CountMinSketch]]): term
    * frequencies sketched into a 4×256 table, top-20 true terms probed
    * back. Estimates can only overcount, and because the md5-60 hash
    * family is SQL-expressible the whole sketch — not just an error
    * bound — is oracle-exact.
    */
  def qCmsFreq(spark: SparkSession, dir: String): DataFrame = {
    val terms = Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("true_cnt"))
      .localCheckpoint(true) // vocab-sized; feeds sketch AND probe set
    val sketch = CountMinSketch.build(terms, "term", "true_cnt")
    val top = terms.orderBy(col("true_cnt").desc, col("term").asc).limit(20)
    CountMinSketch.probe(sketch, top.select("term"), "term")
      .join(broadcast(top), Seq("term"))
      .select(col("term"), col("true_cnt"), col("est_cnt"))
      .orderBy(col("true_cnt").desc, col("term").asc)
  }

  val qCmsFreqSql: String =
    """WITH terms AS (
      |  SELECT term, CAST(COUNT(*) AS BIGINT) AS true_cnt FROM (
      |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
      |    FROM documents)
      |  GROUP BY term),
      |ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
      |cells AS (
      |  SELECT d,
      |    ('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || term), 1, 15))::BIGINT
      |      % 256 AS bucket,
      |    CAST(SUM(true_cnt) AS BIGINT) AS cnt
      |  FROM terms CROSS JOIN ds GROUP BY 1, 2),
      |top AS (SELECT term, true_cnt FROM terms
      |        ORDER BY true_cnt DESC, term ASC LIMIT 20),
      |est AS (
      |  SELECT t.term, MIN(c.cnt) AS est_cnt
      |  FROM top t CROSS JOIN ds
      |  JOIN cells c ON c.d = ds.d AND c.bucket =
      |    ('0x' || substr(md5(CAST(ds.d AS VARCHAR) || ':' || t.term), 1, 15))::BIGINT
      |      % 256
      |  GROUP BY t.term)
      |SELECT t.term, t.true_cnt, e.est_cnt
      |FROM top t JOIN est e ON t.term = e.term
      |ORDER BY t.true_cnt DESC, t.term ASC""".stripMargin

  /** q129 — distribution drift between two corpus partitions (even vs odd
    * doc_id): per-term counts on each side ranked by the CROSS-MULTIPLIED
    * effect size |cnt_a·n_b − cnt_b·n_a| — the integer-exact analogue of
    * the per-term chi-square contribution, so the ranking needs no float
    * arithmetic anywhere. The training-data drift monitor between two
    * snapshots/sources.
    */
  def qDrift(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select((col("doc_id") % 2 === 0).as("in_a"),
        explode(tokens(col("text"))).as("term"))
    val counts = toks.groupBy("term").agg(
      sum(when(col("in_a"), 1L).otherwise(0L)).as("cnt_a"),
      sum(when(!col("in_a"), 1L).otherwise(0L)).as("cnt_b"))
      // vocabulary-sized; totals AND the effect join reference it, so
      // unmaterialized the corpus token explode would run twice
      .localCheckpoint(true)
    val totals = counts.agg(
      sum(col("cnt_a")).as("n_a"), sum(col("cnt_b")).as("n_b"))
    counts.crossJoin(broadcast(totals))
      .withColumn("effect",
        abs(col("cnt_a") * col("n_b") - col("cnt_b") * col("n_a")))
      .orderBy(col("effect").desc, col("term").asc)
      .limit(20)
      .select("term", "cnt_a", "cnt_b", "n_a", "n_b", "effect")
  }

  val qDriftSql: String =
    """WITH toks AS (
      |  SELECT doc_id % 2 = 0 AS in_a,
      |    unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |counts AS (
      |  SELECT term,
      |    CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
      |    CAST(SUM(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
      |  FROM toks GROUP BY term),
      |totals AS (
      |  SELECT CAST(SUM(cnt_a) AS BIGINT) AS n_a,
      |         CAST(SUM(cnt_b) AS BIGINT) AS n_b FROM counts)
      |SELECT term, cnt_a, cnt_b, n_a, n_b,
      |  abs(cnt_a * n_b - cnt_b * n_a) AS effect
      |FROM counts CROSS JOIN totals
      |ORDER BY effect DESC, term ASC LIMIT 20""".stripMargin

  /** The (name, table, column) candidates q132 profiles — every key
    * column of the TPC-H-ish lake.
    */
  private val JoinCandidates: Seq[(String, String)] = Seq(
    "customer.c_custkey" -> "c_custkey",
    "orders.o_custkey" -> "o_custkey",
    "customer.c_nationkey" -> "c_nationkey",
    "supplier.s_nationkey" -> "s_nationkey",
    "nation.n_nationkey" -> "n_nationkey",
    "part.p_partkey" -> "p_partkey",
    "lineitem.l_partkey" -> "l_partkey",
    "orders.o_orderkey" -> "o_orderkey",
    "lineitem.l_orderkey" -> "l_orderkey")

  /** q132 — joinable-column discovery ([[JoinDiscovery.matchMatrix]]):
    * 32 salted minhash minima per key column across the lake's tables,
    * pairwise match counts as the join-ability score. The md5-60 family
    * makes the full sketch and match matrix oracle-exact.
    */
  def qJoinDiscovery(spark: SparkSession, dir: String): DataFrame = {
    val cols = JoinCandidates.map { case (name, c) =>
      val table = name.split("\\.")(0)
      (name, Tables.load(spark, dir, table), c)
    }
    JoinDiscovery.matchMatrix(spark, cols, k = 32)
      .orderBy("col_a", "col_b")
  }

  val qJoinDiscoverySql: String = {
    val sketches = JoinCandidates.map { case (name, c) =>
      val table = name.split("\\.")(0)
      s"""  SELECT '$name' AS name, salt,
         |    MIN(('0x' || substr(d, 1, 15))::BIGINT
         |        + salt * (('0x' || substr(d, 16, 8))::BIGINT % 1073741824)) AS mh
         |  FROM (SELECT DISTINCT md5(CAST($c AS VARCHAR)) AS d FROM $table
         |        WHERE $c IS NOT NULL) CROSS JOIN ds GROUP BY salt""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ds AS (SELECT unnest(range(0, 32)) AS salt),
       |sk AS (
       |$sketches)
       |SELECT a.name AS col_a, b.name AS col_b,
       |  CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_match
       |FROM sk a JOIN sk b ON a.salt = b.salt AND a.name < b.name
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** q133 — single-source shortest paths over the weighted trade graph
    * (weight = distinct orders between the nation pair; source = nation
    * 0), 3 Bellman-Ford rounds of [[GraphOps.shortestPaths]] — pure
    * integer relaxation, bit-exact against the unrolled oracle. Three
    * rounds are exact here: the trade graph is near-complete (hop
    * diameter ≤ 2), and CurationSpec pins the exact-once-converged
    * contract on chains that DO need more rounds.
    */
  def qSssp(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val edges = l
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .groupBy(c("c_nationkey").as("src"), s("s_nationkey").as("dst"))
      .agg(countDistinct(o("o_orderkey")).as("w"))
    GraphOps.shortestPaths(edges, "src", "dst", Some("w"),
      source = 0L, iters = 3).orderBy("node")
  }

  private def ssspIterSql(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT n.node,
       |    least(d.dist, COALESCE(r.cand, 1000000000000000)) AS dist
       |  FROM nodes n JOIN $prev d ON n.node = d.node
       |  LEFT JOIN (
       |    SELECT e.dst AS node, MIN(d.dist + e.w) AS cand
       |    FROM e JOIN $prev d ON e.src = d.node
       |    WHERE d.dist < 1000000000000000
       |    GROUP BY e.dst) r ON n.node = r.node)""".stripMargin

  val qSsspSql: String = {
    val iters = (0 until 3)
      .map(i => ssspIterSql(s"d$i", s"d${i + 1}")).mkString(",\n")
    s"""WITH e AS (
       |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
       |         CAST(s.s_nationkey AS BIGINT) AS dst,
       |         COUNT(DISTINCT o.o_orderkey) AS w
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  GROUP BY 1, 2),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |d0 AS (SELECT node,
       |         CASE WHEN node = 0 THEN 0 ELSE 1000000000000000 END AS dist
       |       FROM nodes),
       |$iters
       |SELECT node, CAST(dist AS BIGINT) AS dist FROM d3 ORDER BY node""".stripMargin
  }

  /** q134 — per-document keyword extraction: terms ranked inside each doc
    * by (tf desc, df asc, term asc) — high frequency in the doc, rare in
    * the corpus — top 3 per doc. The float-free integer analogue of
    * tf-idf keyword ranking, so the oracle is exact.
    */
  def qKeywords(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(broadcast(dfreq), Seq("term"))
      .withColumn("kw_rank", row_number().over(w).cast("long"))
      .filter(col("kw_rank") <= 3)
      .select("doc_id", "kw_rank", "term", "tf", "df")
      .orderBy("doc_id", "kw_rank")
  }

  val qKeywordsSql: String =
    """WITH tf AS (
      |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
      |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      |    FROM documents)
      |  GROUP BY doc_id, term),
      |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
      |          FROM tf GROUP BY term)
      |SELECT doc_id, kw_rank, term, tf, df FROM (
      |  SELECT t.doc_id, t.term, t.tf, d.df,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY t.doc_id
      |      ORDER BY t.tf DESC, d.df ASC, t.term ASC) AS BIGINT) AS kw_rank
      |  FROM tf t JOIN dfreq d ON t.term = d.term)
      |WHERE kw_rank <= 3 ORDER BY doc_id, kw_rank""".stripMargin

  val qMadOutliersSql: String =
    """WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
      |med AS (
      |  SELECT event_type, value AS med FROM (
      |    SELECT event_type, value,
      |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
      |      COUNT(*) OVER (PARTITION BY event_type) AS n
      |    FROM ev)
      |  WHERE rn = (n + 1) // 2),
      |dev AS (
      |  SELECT e.event_type, e.value, abs(e.value - m.med) AS dev, m.med
      |  FROM ev e JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type, dev AS mad FROM (
      |    SELECT event_type, dev,
      |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
      |      COUNT(*) OVER (PARTITION BY event_type) AS n
      |    FROM dev)
      |  WHERE rn = (n + 1) // 2)
      |SELECT d.event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CASE WHEN d.dev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  MIN(CASE WHEN d.dev > 3 * m.mad THEN d.value END) AS min_out,
      |  MAX(CASE WHEN d.dev > 3 * m.mad THEN d.value END) AS max_out,
      |  ANY_VALUE(d.med) AS med,
      |  ANY_VALUE(m.mad) AS mad
      |FROM dev d JOIN mad m USING (event_type)
      |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin

  /** q160 — classifier calibration against the rule battery: the q136
    * hashing-trick scores bucketed into width-5 bins, each bin
    * reporting how often the q119 Gopher rules agree ("keep" rate) —
    * the reliability table that tells a pipeline operator whether a
    * learned filter's score actually orders quality before they trust
    * a threshold. Every quantity is integer (counts) or an exact
    * integer-ratio double; floor(score/5.0) is exact at bin
    * boundaries (multiples of 5 divide exactly in binary), so the
    * whole table is oracle-reproducible.
    */
  def qCalibration(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scores = docs
      .select(col("doc_id"),
        graft.operators.QualityClassifier.score(col("text")).as("s"))
      .select(col("doc_id"), col("s._2").as("score"))
    val labels = QualityRules
      .withQualityRules(docs.select(col("doc_id"), col("text")), "text",
        minWords = 30L, maxWords = 100000L, stopwords = CorpusStop)
      .select(col("doc_id"), col("keep"))
    scores.join(labels, "doc_id")
      .withColumn("bin", floor(col("score") / lit(5.0)).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_rule_keep"))
      .withColumn("rule_rate",
        col("n_rule_keep").cast("double") / col("n").cast("double"))
      .orderBy("bin")
  }

  // assembled from the two proven oracles: q119's rule battery as a
  // CTE (ORDER BY stripped) + q136's scoring CTEs
  val qCalibrationSql: String = {
    val rules = qGopherRulesSql.replace(
      "FROM documents ORDER BY doc_id", "FROM documents")
    s"""WITH rules AS ($rules),
       |toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+'))
       |    AS term
       |  FROM documents WHERE trim(text) <> ''),
       |scored AS (
       |  SELECT doc_id,
       |    CAST(SUM(
       |      ('0x' || substr(md5('w:' || CAST(
       |         ('0x' || substr(md5(term), 1, 15))::BIGINT % 64 AS VARCHAR)),
       |       1, 8))::BIGINT % 21 - 10) AS BIGINT) AS score
       |  FROM toks GROUP BY doc_id),
       |sc AS (
       |  SELECT d.doc_id, COALESCE(s.score, 0) AS score
       |  FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id),
       |j AS (
       |  SELECT sc.score, r.keep FROM sc
       |  JOIN rules r ON sc.doc_id = r.doc_id)
       |SELECT CAST(floor(score / 5.0) AS BIGINT) AS bin,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_rule_keep,
       |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS rule_rate
       |FROM j GROUP BY 1 ORDER BY bin""".stripMargin
  }

  /** q161 — unigram-LM vocabulary induction
    * ([[graft.operators.UnigramLm.train]]): the SentencePiece-style EM
    * trainer over the corpus word dictionary — substring seed, Viterbi
    * E-step (distributed kernel pass, vocab broadcast), count M-step,
    * quartile pruning with unconditional single-char coverage.
    * Rows-only gate like the q127 BPE trainer (iterative EM with
    * transcendental log-probs); UnigramLmSpec pins the distributed
    * trainer against an independent single-machine reference.
    */
  def qUnigramVocab(spark: SparkSession, dir: String): DataFrame =
    graft.operators.UnigramLm
      .train(Tables.documents(spark, dir).select(col("text")), "text",
        maxPieceLen = 5, seedMinCount = 5L, targetSize = 60,
        emRounds = 3)
      .orderBy("rank")

  /** q162 — unigram encode (the inference twin, like q139 for BPE):
    * every document segmented under the q161 vocabulary. Rows-only;
    * the spec pins losslessness and determinism.
    */
  def qUnigramEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val vocab = graft.operators.UnigramLm
      .train(docs.select(col("text")), "text", maxPieceLen = 5,
        seedMinCount = 5L, targetSize = 60, emRounds = 3)
    graft.operators.UnigramLm
      .encode(docs, "doc_id", "text", vocab, maxPieceLen = 5)
      .select(col("doc_id"), col("n_pieces"),
        concat_ws(" ", col("pieces")).as("segmented"))
      .orderBy("doc_id")
  }

  /** The q188/q189 forced corpus: per doc_id-mod-3 class a synthetic
    * text whose word-frequency TIER comes from in-doc repetition
    * (`de`×100 / `fgh`×10 / `gf`×1), with all-distinct chars per word
    * so no split of a word can out-score its full piece (a k≥2-piece
    * Viterbi path multiplies k probabilities < 1). The EM/prune trace
    * is then fully forced at (maxPieceLen=3, targetSize=7,
    * emRounds=3, pruneFrac=0.5): round 1 keeps {de, fgh, gf}, round 2
    * prunes `gf` (keepN = max(7−5 chars, ⌈3·0.5⌉) = 2), round 3
    * re-routes `gf` through its coverage chars — so the final
    * (piece, count, rank) table is pure class-count arithmetic.
    * Derivation pinned single-machine in CurationSpec.
    */
  private def unigramForcedCorpus(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 3).as("cls"))
      .withColumn("text",
        when(col("cls") === 0, lit(Seq.fill(100)("de").mkString(" ")))
          .when(col("cls") === 1, lit(Seq.fill(10)("fgh").mkString(" ")))
          .otherwise(lit("gf")))

  /** q188 — forced unigram-LM trainer gate (the q186 trick for the EM
    * family): seeds, three E-step Viterbi segmentations, both prune
    * rounds and the final (−count, piece) rank order are hand-derived
    * on the forced corpus, so the whole trainer — MINUS the
    * transcendental logp column, which stays spec-pinned — is oracle
    * hash-exact. q161 (real corpus) keeps exercising it at scale.
    */
  def qUnigramForced(spark: SparkSession, dir: String): DataFrame =
    graft.operators.UnigramLm
      .train(unigramForcedCorpus(spark, dir).select(col("text")), "text",
        maxPieceLen = 3, seedMinCount = 2L, targetSize = 7,
        emRounds = 3, pruneFrac = 0.5)
      .select(col("piece"), col("count"), col("rank"))

  val qUnigramForcedSql: String =
    """WITH c AS (
      |  SELECT doc_id % 3 AS cls, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM documents GROUP BY 1),
      |t AS (SELECT
      |  MAX(CASE WHEN cls = 0 THEN n END) AS n0,
      |  MAX(CASE WHEN cls = 1 THEN n END) AS n1,
      |  MAX(CASE WHEN cls = 2 THEN n END) AS n2 FROM c)
      |SELECT 'de' AS piece, 100 * n0 AS "count",
      |  CAST(1 AS BIGINT) AS "rank" FROM t
      |UNION ALL SELECT 'fgh', 10 * n1, 2 FROM t
      |UNION ALL SELECT 'f', n2, 3 FROM t
      |UNION ALL SELECT 'g', n2, 4 FROM t
      |UNION ALL SELECT 'd', 0, 5 FROM t
      |UNION ALL SELECT 'e', 0, 6 FROM t
      |UNION ALL SELECT 'h', 0, 7 FROM t""".stripMargin

  /** q189 — forced unigram ENCODE gate: segmenting the forced corpus
    * under the q188 vocabulary gives 100/10/2 pieces per doc by class
    * (class 2's `gf` piece was pruned in round 2, so it must route
    * through the coverage chars) — [[graft.operators.UnigramLm.encode]]'s
    * Viterbi + fallback path is oracle-gated; q162 stays rows-only on
    * the real corpus.
    */
  def qUnigramEncodeForced(spark: SparkSession, dir: String): DataFrame = {
    val docs = unigramForcedCorpus(spark, dir)
    val vocab = graft.operators.UnigramLm
      .train(docs.select(col("text")), "text", maxPieceLen = 3,
        seedMinCount = 2L, targetSize = 7, emRounds = 3, pruneFrac = 0.5)
    graft.operators.UnigramLm
      .encode(docs, "doc_id", "text", vocab, maxPieceLen = 3)
      .join(docs.select(col("doc_id"), col("cls")), Seq("doc_id"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_pieces")).as("n_pieces"))
  }

  val qUnigramEncodeForcedSql: String =
    """SELECT doc_id % 3 AS cls, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(*) * CASE WHEN doc_id % 3 = 0 THEN 100
      |                       WHEN doc_id % 3 = 1 THEN 10
      |                       ELSE 2 END AS BIGINT) AS n_pieces
      |FROM documents GROUP BY doc_id % 3""".stripMargin

  /** q165 — CCNet-style boilerplate removal
    * ([[graft.operators.Boilerplate.flagBoilerplate]]): pages are built
    * per source with an injected nav header and footer paragraph (the
    * q120 synthesis pattern); a paragraph is boilerplate when it appears
    * in ≥ half of its source's pages — so the header/footer are stripped
    * from EVERY page while unique body paragraphs survive. Distinct from
    * q120's global first-occurrence dedup: the df-threshold rule drops
    * all occurrences, which is what kills template text in web corpora.
    */
  def qBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val pages = docs
      .groupBy(col("source"), expr("doc_id div 100").as("grp"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          s => s.getField("text")),
        "\n\n").as("body"))
      .select(col("source"), col("grp"),
        concat_ws("\n\n",
          concat(col("source"), lit(" nav home about contact")),
          col("body"),
          concat(col("source"), lit(" footer copyright terms"))).as("text"))
      .withColumn("page_id", concat_ws("#", col("source"), col("grp")))
    graft.operators.Boilerplate
      .flagBoilerplate(pages, "page_id", "source", "text",
        minNum = 1L, minDen = 2L)
      .groupBy(col("id").as("page_id"))
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("n_boiler"),
        sum(when(col("boiler"), 0L).otherwise(col("plen"))).as("kept_chars"))
      .orderBy("page_id")
  }

  val qBoilerplateSql: String =
    """WITH bodies AS (
      |  SELECT source, doc_id // 100 AS grp,
      |         string_agg(text, chr(10)||chr(10) ORDER BY doc_id) AS body
      |  FROM documents GROUP BY source, doc_id // 100),
      |pages AS (
      |  SELECT source, source || '#' || CAST(grp AS VARCHAR) AS page_id,
      |         source || ' nav home about contact' || chr(10)||chr(10) ||
      |         body || chr(10)||chr(10) ||
      |         source || ' footer copyright terms' AS text
      |  FROM bodies),
      |paras AS (
      |  SELECT source, page_id, trim(para) AS para
      |  FROM (SELECT source, page_id,
      |          unnest(string_split_regex(text, '\n\n')) AS para
      |        FROM pages)
      |  WHERE len(trim(para)) > 0),
      |pdf AS (
      |  SELECT source, md5(para) AS h,
      |         count(DISTINCT page_id) AS para_docs
      |  FROM paras GROUP BY source, md5(para)),
      |srcn AS (
      |  SELECT source, count(DISTINCT page_id) AS src_docs
      |  FROM pages GROUP BY source),
      |flag AS (
      |  SELECT p.page_id, len(p.para) AS plen,
      |         (2 * d.para_docs >= 1 * s.src_docs) AS boiler
      |  FROM paras p
      |  JOIN pdf d ON d.source = p.source AND d.h = md5(p.para)
      |  JOIN srcn s ON s.source = p.source)
      |SELECT page_id,
      |  CAST(count(*) AS BIGINT) AS n_paras,
      |  CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
      |  CAST(sum(CASE WHEN boiler THEN 0 ELSE plen END) AS BIGINT)
      |    AS kept_chars
      |FROM flag GROUP BY page_id ORDER BY page_id""".stripMargin
}
