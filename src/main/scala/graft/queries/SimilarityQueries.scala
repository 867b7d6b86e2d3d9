package graft.queries

import graft.operators.Similarity
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search queries over the `embeddings` table. */
object SimilarityQueries {

  /** q30 — exact brute-force cosine top-5 for every vector (self
    * excluded). Output is (query_id, rank, neighbor_id) only — the float
    * similarity itself is engine-rounding-sensitive, the ranking is not
    * (ties broken by neighbor_id).
    */
  def qCosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", emb, "vec_id",
        "embedding", k = 5)
      .select("query_id", "rank", "neighbor_id")
  }

  val qCosineTopKSql: String =
    """SELECT query_id, rank, neighbor_id FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(
      |        q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
      |      c.vec_id ASC) AS rank
      |  FROM embeddings q, embeddings c
      |  WHERE q.vec_id <> c.vec_id)
      |WHERE rank <= 5""".stripMargin

  /** q34 — embedding-cosine near-duplicate pairs: all (a < b) pairs with
    * cosine ≥ 0.4, ids only (threshold membership is float-stable at
    * this data's similarity gaps; both engines compute in double).
    * Exact form for the oracle; the bucketed path (q31) is the
    * approximate scale variant of the same operator.
    */
  def qEmbedNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosinePairsAbove(
      Tables.embeddings(spark, dir), "vec_id", "embedding", tau = 0.4)

  val qEmbedNearDupSql: String =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |FROM embeddings a, embeddings b
      |WHERE a.vec_id < b.vec_id
      |  AND list_cosine_similarity(
      |        a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4""".stripMargin

  /** q31 — LSH-bucketed approximate top-5 (rows-only: bucketing depends
    * on engine-seeded hyperplanes; recall vs the exact baseline is
    * asserted in SimilaritySpec).
    */
  def qAnnTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity
      .annTopK(emb, "vec_id", "embedding", emb, "vec_id", "embedding",
        dim = 64, k = 5, planes = 6)
      .select("query_id", "rank", "neighbor_id")
  }

  /** q39 — IVF (centroid-partitioned) approximate top-5, the second ANN
    * family beside q31's hyperplane LSH (rows-only: trained centroids
    * are engine-internal; recall vs the exact baseline is asserted in
    * SimilaritySpec).
    */
  def qIvfTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity
      .ivfTopK(emb, "vec_id", "embedding", emb, "vec_id", "embedding",
        dim = 64, k = 5, nlist = 16, nprobe = 4)
      .select("query_id", "rank", "neighbor_id")
  }

  /** q32 — per-label centroids (mean pooling), exact-checkable form:
    * each (label, dimension) sums `floor(component × 1e6)` as integers —
    * float→double widening and the double multiply are bit-identical
    * across engines, and integer sums are order-independent, so the
    * result hash-matches DuckDB regardless of partial-agg order (a raw
    * double sum would not). One posexplode + one hash-aggregate: scales
    * as rows×dim with full map-side combine.
    */
  def qLabelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(spark, dir)
      .select(col("label"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), (col("pos") + 1).cast("long").as("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("v").cast("double") * 1000000).cast("long"))
          .as("sum_micro")
      )

  val qLabelCentroidsSql: String =
    """SELECT label, dim, COUNT(*) AS n,
      |  CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
      |    AS BIGINT) AS sum_micro
      |FROM (
      |  SELECT label, generate_subscripts(embedding, 1) AS dim,
      |    unnest(embedding) AS v
      |  FROM embeddings)
      |GROUP BY label, dim""".stripMargin
}
