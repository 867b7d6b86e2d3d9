package graft.queries

import graft.functions.TextFunctions
import graft.operators.{Bm25, IndexStats, InvertedIndex, MergeOps, Mining,
  Prf, RankFusion, RetrievalEval, Similarity}
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexical retrieval over the `documents` table (SURVEY §7.5 extension:
  * the search/ranking operator a RAG or eval pipeline runs next to the
  * embedding ANN path).
  */
object RetrievalQueries {

  /** The fixed benchmark query set: (query_id, term) rows, terms drawn
    * from the synthetic corpus vocabulary. Kept literal so the DuckDB
    * oracle can embed the same VALUES.
    */
  private val querySet: Seq[(Long, String)] = Seq(
    1L -> "spark", 1L -> "join", 1L -> "window",
    2L -> "vector", 2L -> "hash", 2L -> "merge",
    3L -> "table", 3L -> "scan")

  /** q101 — BM25 top-10 docs per query ([[Bm25.topK]]) in the
    * cross-engine-exact rational-idf form (`logIdf = false`; see the
    * operator scaladoc for why `ln` can't be oracle-hashed). The ln
    * variant is Bm25Spec territory.
    */
  def qBm25TopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val queries = querySet.toDF("query_id", "term")
    Bm25.topK(
      Tables.documents(spark, dir), "doc_id", "text",
      TextFunctions.tokens, TextFunctions.tokensLocal,
      queries, "query_id", "term",
      k = 10, logIdf = false)
  }

  /** The BM25 scoring CTE chain (stats → tf → df → per-(query, doc)
    * scores) parameterized over the query-set relation `qName` — ONE
    * statement of the scoring convention, shared by the q101/q103/q117
    * oracles (literal query set) and the q118 second pass (expanded
    * query set), so a fix lands in all of them. The `trim(text) = ''`
    * guards mirror Spark's `tokens` (empty → 0 tokens), where DuckDB's
    * split of an empty string would yield [''] (1 token).
    */
  private def bm25ChainSql(qName: String): String =
    s"""stats AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN trim(text) = '' THEN 0
      |      ELSE len(string_split_regex(trim(text), '\\s+')) END)
      |      AS BIGINT) AS t
      |  FROM documents),
      |docterm AS (
      |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, unnest(tk) AS term
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
      |        FROM documents WHERE trim(text) <> '')),
      |tf AS (
      |  SELECT doc_id, term, dl, COUNT(*) AS tf FROM docterm
      |  WHERE term IN (SELECT DISTINCT term FROM $qName)
      |  GROUP BY doc_id, term, dl),
      |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      |contrib AS (
      |  SELECT doc_id, term,
      |    (CAST(2 * (n + 1) AS DOUBLE) / CAST(2 * df + 1 AS DOUBLE)) *
      |    (CAST(44 * tf * t AS DOUBLE) /
      |     CAST(20 * tf * t + 6 * t + 18 * dl * n AS DOUBLE)) AS c
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
      |qscore AS (
      |  SELECT qq.query_id, c.doc_id,
      |    list_reduce(list(c.c ORDER BY c.term), (a, b) -> a + b) AS score
      |  FROM $qName qq JOIN contrib c USING (term)
      |  GROUP BY qq.query_id, c.doc_id)""".stripMargin

  /** The literal benchmark-query VALUES CTE, shared with the q118
    * oracle's union.
    */
  private val querySetValuesSql: String =
    """(VALUES
      |  (1, 'spark'), (1, 'join'), (1, 'window'),
      |  (2, 'vector'), (2, 'hash'), (2, 'merge'),
      |  (3, 'table'), (3, 'scan'))""".stripMargin

  private val bm25CtesSql: String =
    s"""q(query_id, term) AS $querySetValuesSql,
      |${bm25ChainSql("q")}""".stripMargin

  val qBm25TopKSql: String =
    s"""WITH $bm25CtesSql
      |SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id, score
      |FROM (
      |  SELECT query_id, doc_id, score,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY score DESC, doc_id ASC) AS rank
      |  FROM qscore)
      |WHERE rank <= 10""".stripMargin

  /** Per-query anchor documents for the dense half of the hybrid
    * search: "docs like this seed AND matching these keywords".
    * doc_id and vec_id are aligned in the synthetic tables.
    */
  private val anchors: Seq[(Long, Long)] = Seq(1L -> 7L, 2L -> 42L,
    3L -> 123L)

  /** q103 — hybrid retrieval: BM25 top-20 (rational idf, [[Bm25.topK]])
    * and anchor-embedding cosine top-20 ([[Similarity.bruteForceTopK]])
    * fused with RRF ([[RankFusion.rrf]], c = 60) into a top-10. Every
    * stage is the cross-engine-exact form, so the oracle hash-checks
    * lexical ranking, dense ranking, and fusion in one query.
    */
  def qHybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val queries = querySet.toDF("query_id", "term")
    val lexical = Bm25.topK(
      Tables.documents(spark, dir), "doc_id", "text",
      TextFunctions.tokens, TextFunctions.tokensLocal,
      queries, "query_id", "term",
      k = 20, logIdf = false)
      .select(col("query_id"), col("doc_id"), col("rank"),
        lit("bm25").as("src"))
    val emb = Tables.embeddings(spark, dir)
    val anchorDf = anchors.toDF("fused_qid", "anchor")
    val dense = Similarity.bruteForceTopK(
      emb, "vec_id", "embedding",
      emb.join(anchorDf, col("vec_id") === col("anchor"))
        .select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", k = 20)
      .join(anchorDf, col("query_id") === col("anchor"))
      .select(col("fused_qid").as("query_id"),
        col("neighbor_id").as("doc_id"),
        col("rank"), lit("dense").as("src"))
    RankFusion.rrf(lexical.unionByName(dense),
      "query_id", "doc_id", "rank", "src", k = 10)
  }

  val qHybridRrfSql: String =
    s"""WITH $bm25CtesSql,
      |anchors(query_id, anchor) AS (VALUES (1, 7), (2, 42), (3, 123)),
      |lexical AS (
      |  SELECT query_id, doc_id, rank, 'bm25' AS src FROM (
      |    SELECT query_id, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY query_id
      |        ORDER BY score DESC, doc_id ASC) AS rank
      |    FROM qscore)
      |  WHERE rank <= 20),
      |dense AS (
      |  SELECT query_id, doc_id, rank, 'dense' AS src FROM (
      |    SELECT a.query_id, c.vec_id AS doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY a.query_id
      |        ORDER BY list_cosine_similarity(
      |          e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
      |        c.vec_id ASC) AS rank
      |    FROM anchors a
      |    JOIN embeddings e ON e.vec_id = a.anchor
      |    CROSS JOIN embeddings c
      |    WHERE c.vec_id <> a.anchor)
      |  WHERE rank <= 20),
      |unioned AS (
      |  SELECT * FROM lexical UNION ALL SELECT * FROM dense),
      |fused AS (
      |  SELECT query_id, doc_id,
      |    list_reduce(
      |      list(CAST(1 AS DOUBLE) / CAST(60 + rank AS DOUBLE)
      |        ORDER BY src), (a, b) -> a + b) AS rrf_score
      |  FROM unioned GROUP BY query_id, doc_id)
      |SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id, rrf_score
      |FROM (
      |  SELECT query_id, doc_id, rrf_score,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY rrf_score DESC, doc_id ASC) AS rank
      |  FROM fused)
      |WHERE rank <= 10""".stripMargin

  /** q104 — retrieval evaluation ([[RetrievalEval.metrics]]): the q103
    * hybrid top-10 scored against cluster-label relevance (a doc is
    * relevant to a query iff it shares the anchor's embedding `label`,
    * anchor excluded). recall@k and MRR are exact integer ratios, so
    * the oracle hash-checks the whole rank→judge→score chain.
    */
  def qRetrievalEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val anchorDf = anchors.toDF("query_id", "anchor")
    val anchorLabels = emb.join(anchorDf, col("vec_id") === col("anchor"))
      .select(col("query_id"), col("anchor"), col("label").as("__albl"))
    val relevant = emb.join(broadcast(anchorLabels),
      col("label") === col("__albl") && col("vec_id") =!= col("anchor"))
      .select(col("query_id"), col("vec_id").as("doc_id"))
    RetrievalEval.metrics(
      qHybridRrf(spark, dir), "query_id", "rank", "doc_id",
      relevant, "query_id", "doc_id")
  }

  val qRetrievalEvalSql: String = {
    val fusedTop10 = qHybridRrfSql
    s"""WITH fused_top AS ($fusedTop10),
      |anch(query_id, anchor) AS (VALUES (1, 7), (2, 42), (3, 123)),
      |relevant AS (
      |  SELECT CAST(a.query_id AS BIGINT) AS query_id,
      |    e.vec_id AS doc_id
      |  FROM anch a
      |  JOIN embeddings al ON al.vec_id = a.anchor
      |  JOIN embeddings e ON e.label = al.label AND e.vec_id <> a.anchor),
      |nrel AS (
      |  SELECT query_id, COUNT(*) AS n_relevant FROM relevant
      |  GROUP BY query_id),
      |hits AS (
      |  SELECT f.query_id, COUNT(*) AS hits, MIN(f.rank) AS minrank
      |  FROM fused_top f JOIN relevant r
      |    ON f.query_id = r.query_id AND f.doc_id = r.doc_id
      |  GROUP BY f.query_id)
      |SELECT n.query_id, n.n_relevant,
      |  COALESCE(h.hits, 0) AS hits,
      |  CAST(COALESCE(h.hits, 0) AS DOUBLE) / CAST(n.n_relevant AS DOUBLE)
      |    AS recall_at_k,
      |  CASE WHEN h.minrank IS NULL THEN 0.0
      |    ELSE CAST(1 AS DOUBLE) / CAST(h.minrank AS DOUBLE) END AS mrr
      |FROM nrel n LEFT JOIN hits h ON n.query_id = h.query_id""".stripMargin
  }

  /** q105 — incremental index-stats maintenance
    * ([[IndexStats.applyChanges]]): a deterministic merge batch
    * (modified docs get a new token appended; brand-new docs insert)
    * flows through [[MergeOps.changeFeed]] and updates the df table at
    * O(changes) cost. The oracle recomputes df from the merged corpus —
    * incremental must equal full recompute exactly.
    */
  def qIndexStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val modified = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("text", concat(col("text"), lit(" graftnewterm")))
    val added = docs.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("brand new doc "), col("doc_id").cast("string"))
          .as("text"))
    val updates = modified.unionByName(added)
    val spec = MergeOps.MergeSpec(Seq("doc_id"))
    val base = IndexStats.termDf(docs, "text", TextFunctions.tokensLocal)
    val changes = MergeOps.changeFeed(docs, updates, spec)
    IndexStats.applyChanges(base, changes, "text",
      TextFunctions.tokensLocal)
  }

  /** q108 — blocked inverted-index construction
    * ([[InvertedIndex.buildBlocks]]): term → 32-entry posting blocks of
    * (doc, 1-based position), with per-term document frequency. The
    * whole build — posexplode, per-term numbering, block packing, df —
    * is hash-checked against DuckDB computing the same postings with
    * window functions.
    */
  def qInvertedIndex(spark: SparkSession, dir: String): DataFrame =
    InvertedIndex.buildBlocks(
      Tables.documents(spark, dir), "doc_id", "text",
      TextFunctions.tokens, blockSize = 32)

  val qInvertedIndexSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      |  FROM documents WHERE trim(text) <> ''),
      |posting AS (
      |  SELECT u.term AS term, doc_id, u.pos AS pos FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(tk,
      |        (x, i) -> struct_pack(term := x, pos := i))) AS u
      |    FROM tok)),
      |numbered AS (
      |  SELECT term, doc_id, pos,
      |    ROW_NUMBER() OVER (PARTITION BY term
      |      ORDER BY doc_id, pos) AS rn
      |  FROM posting),
      |blocks AS (
      |  SELECT term, CAST((rn - 1) // 32 AS BIGINT) AS block,
      |    COUNT(*) AS n_in_block,
      |    string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR),
      |      ',' ORDER BY doc_id, pos) AS postings
      |  FROM numbered GROUP BY term, (rn - 1) // 32),
      |dfreq AS (
      |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM posting
      |  GROUP BY term)
      |SELECT b.term, b.block, d.df, b.n_in_block, b.postings
      |FROM blocks b JOIN dfreq d USING (term)""".stripMargin

  /** q110 — hard-negative mining ([[Mining.hardNegatives]]): the
    * anchors' dense top-20 with same-label (relevant) docs anti-joined
    * away, top-5 negatives per query re-ranked — the contrastive
    * training-triple builder over the q103 dense ranking.
    */
  def qHardNegatives(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val anchorDf = anchors.toDF("fused_qid", "anchor")
    val dense = Similarity.bruteForceTopK(
      emb, "vec_id", "embedding",
      emb.join(anchorDf, col("vec_id") === col("anchor"))
        .select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", k = 20)
      .join(anchorDf, col("query_id") === col("anchor"))
      .select(col("fused_qid").as("query_id"),
        col("neighbor_id").as("doc_id"), col("rank"))
    val anchorLabels = emb.join(anchorDf, col("vec_id") === col("anchor"))
      .select(col("fused_qid"), col("anchor"), col("label").as("__albl"))
    val relevant = emb.join(broadcast(anchorLabels),
      col("label") === col("__albl") && col("vec_id") =!= col("anchor"))
      .select(col("fused_qid").as("query_id"), col("vec_id").as("doc_id"))
    Mining.hardNegatives(dense, "query_id", "doc_id", "rank",
      relevant, "query_id", "doc_id", nNeg = 5)
  }

  val qHardNegativesSql: String =
    """WITH anchors(query_id, anchor) AS (VALUES (1, 7), (2, 42), (3, 123)),
      |dense AS (
      |  SELECT query_id, doc_id, rank FROM (
      |    SELECT a.query_id, c.vec_id AS doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY a.query_id
      |        ORDER BY list_cosine_similarity(
      |          e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
      |        c.vec_id ASC) AS rank
      |    FROM anchors a
      |    JOIN embeddings e ON e.vec_id = a.anchor
      |    CROSS JOIN embeddings c
      |    WHERE c.vec_id <> a.anchor)
      |  WHERE rank <= 20),
      |relevant AS (
      |  SELECT a.query_id, e.vec_id AS doc_id
      |  FROM anchors a
      |  JOIN embeddings al ON al.vec_id = a.anchor
      |  JOIN embeddings e ON e.label = al.label AND e.vec_id <> a.anchor),
      |negs AS (
      |  SELECT d.query_id, d.doc_id, d.rank,
      |    ROW_NUMBER() OVER (PARTITION BY d.query_id
      |      ORDER BY d.rank) AS neg_rank
      |  FROM dense d
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM relevant r
      |    WHERE r.query_id = d.query_id AND r.doc_id = d.doc_id))
      |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
      |  CAST(rank AS BIGINT) AS orig_rank, CAST(neg_rank AS BIGINT)
      |    AS neg_rank
      |FROM negs WHERE neg_rank <= 5""".stripMargin

  /** q117 — pseudo-relevance-feedback query expansion
    * ([[Prf.expansionTerms]]): each query's BM25 top-10 docs vote for
    * expansion terms by exact occurrence count, original query terms
    * excluded, top-5 kept. The oracle recomputes the whole chain
    * (ranking → feedback tokens → counts → exclusion → rank) in SQL.
    */
  /** The q117 chain with an optional shared corpus-stats frame (the
    * RM3 loop runs two BM25 passes over the SAME corpus — q118 passes
    * the stats in so the full stats scan happens once, not per pass).
    */
  private def prfExpansionWith(
      spark: SparkSession,
      dir: String,
      stats: Option[DataFrame]): DataFrame = {
    import spark.implicits._
    val queries = querySet.toDF("query_id", "term")
    val docs = Tables.documents(spark, dir)
    val ranked = Bm25.topK(
      docs, "doc_id", "text",
      TextFunctions.tokens, TextFunctions.tokensLocal,
      queries, "query_id", "term",
      k = 10, logIdf = false, precomputedStats = stats)
    Prf.expansionTerms(ranked, "query_id", "doc_id", "rank",
      docs, "doc_id", "text", TextFunctions.tokens,
      queries, "query_id", "term", fbDocs = 10, nTerms = 5)
  }

  def qPrfExpansion(spark: SparkSession, dir: String): DataFrame =
    prfExpansionWith(spark, dir, None)

  val qPrfExpansionSql: String =
    s"""WITH $bm25CtesSql,
      |fb AS (
      |  SELECT query_id, doc_id FROM (
      |    SELECT query_id, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY query_id
      |        ORDER BY score DESC, doc_id ASC) AS rank
      |    FROM qscore)
      |  WHERE rank <= 10),
      |fbterm AS (
      |  SELECT f.query_id,
      |    unnest(string_split_regex(trim(d.text), '\\s+')) AS term
      |  FROM fb f JOIN documents d ON d.doc_id = f.doc_id
      |  WHERE trim(d.text) <> ''),
      |counted AS (
      |  SELECT query_id, term, COUNT(*) AS fb_count FROM fbterm
      |  GROUP BY query_id, term),
      |expansions AS (
      |  SELECT c.query_id, c.term, c.fb_count,
      |    ROW_NUMBER() OVER (PARTITION BY c.query_id
      |      ORDER BY c.fb_count DESC, c.term ASC) AS exp_rank
      |  FROM counted c
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM q
      |    WHERE q.query_id = c.query_id AND q.term = c.term))
      |SELECT CAST(query_id AS BIGINT) AS query_id, term, fb_count,
      |  CAST(exp_rank AS BIGINT) AS exp_rank
      |FROM expansions WHERE exp_rank <= 5""".stripMargin

  /** q118 — the PRF SECOND pass: BM25 re-run with each query's
    * vocabulary grown by its q117 expansion terms (the RM3 loop
    * closed: rank → feedback → expand → re-rank). The second-pass
    * query set is data-dependent, which the oracle reproduces by
    * nesting the full q117 chain as a subquery and unioning it with
    * the literal terms.
    */
  def qPrfSecondPass(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val queries = querySet.toDF("query_id", "term")
    val docs = Tables.documents(spark, dir)
    // ONE corpus-stats scan shared by both BM25 passes (materialized:
    // it is a one-row frame referenced from two plan subtrees, and
    // Spark does not share aggregate subplans — without this the
    // stats scan, a FULL corpus read at deployment scale, runs twice)
    val stats = Bm25.corpusStats(docs, "text", TextFunctions.tokens)
      .localCheckpoint(true)
    val expanded = queries
      .unionByName(prfExpansionWith(spark, dir, Some(stats))
        .select("query_id", "term"))
      .distinct()
    Bm25.topK(
      docs, "doc_id", "text",
      TextFunctions.tokens, TextFunctions.tokensLocal,
      expanded, "query_id", "term",
      k = 10, logIdf = false, precomputedStats = Some(stats))
  }

  val qPrfSecondPassSql: String =
    s"""WITH q2 AS (
      |  SELECT CAST(query_id AS BIGINT) AS query_id, term
      |  FROM $querySetValuesSql v(query_id, term)
      |  UNION
      |  SELECT query_id, term FROM ($qPrfExpansionSql)),
      |${bm25ChainSql("q2")}
      |SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id, score
      |FROM (
      |  SELECT query_id, doc_id, score,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY score DESC, doc_id ASC) AS rank
      |  FROM qscore)
      |WHERE rank <= 10""".stripMargin

  val qIndexStatsSql: String =
    """WITH docs AS (SELECT doc_id, text FROM documents),
      |u AS (
      |  SELECT doc_id, text || ' graftnewterm' AS text FROM docs
      |  WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |    'brand new doc ' || CAST(doc_id AS VARCHAR) AS text
      |  FROM docs WHERE doc_id % 17 = 0),
      |merged AS (
      |  SELECT COALESCE(u.doc_id, d.doc_id) AS doc_id,
      |    CASE WHEN u.doc_id IS NOT NULL THEN u.text ELSE d.text END
      |      AS text
      |  FROM docs d FULL OUTER JOIN u ON d.doc_id = u.doc_id)
      |SELECT term, COUNT(*) AS df FROM (
      |  SELECT doc_id,
      |    unnest(list_distinct(string_split_regex(trim(text), '\s+')))
      |      AS term
      |  FROM merged WHERE trim(text) <> '')
      |GROUP BY term""".stripMargin
}
