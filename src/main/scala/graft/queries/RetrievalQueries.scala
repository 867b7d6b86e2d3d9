package graft.queries

import graft.functions.TextFunctions
import graft.operators.Bm25
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

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
      TextFunctions.tokens, queries, "query_id", "term",
      k = 10, logIdf = false)
  }

  val qBm25TopKSql: String =
    """WITH q(query_id, term) AS (VALUES
      |  (1, 'spark'), (1, 'join'), (1, 'window'),
      |  (2, 'vector'), (2, 'hash'), (2, 'merge'),
      |  (3, 'table'), (3, 'scan')),
      |stats AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
      |      AS t
      |  FROM documents),
      |docterm AS (
      |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, unnest(tk) AS term
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      |        FROM documents)),
      |tf AS (
      |  SELECT doc_id, term, dl, COUNT(*) AS tf FROM docterm
      |  WHERE term IN (SELECT DISTINCT term FROM q)
      |  GROUP BY doc_id, term, dl),
      |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      |contrib AS (
      |  SELECT doc_id, term,
      |    (CAST(2 * (n + 1) AS DOUBLE) / CAST(2 * df + 1 AS DOUBLE)) *
      |    (CAST(44 * tf * t AS DOUBLE) /
      |     CAST(20 * tf * t + 6 * t + 18 * dl * n AS DOUBLE)) AS c
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
      |qscore AS (
      |  SELECT q.query_id, c.doc_id,
      |    list_reduce(list(c.c ORDER BY c.term), (a, b) -> a + b) AS score
      |  FROM q JOIN contrib c USING (term)
      |  GROUP BY q.query_id, c.doc_id)
      |SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id, score
      |FROM (
      |  SELECT query_id, doc_id, score,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY score DESC, doc_id ASC) AS rank
      |  FROM qscore)
      |WHERE rank <= 10""".stripMargin
}
