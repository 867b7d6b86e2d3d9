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

  /** q81 — SemDeDup-style semantic dedup verdicts: a vector is a
    * duplicate iff a lower-id vector in the SAME cluster (the `label`
    * column — deterministic, so the oracle sees identical clusters) has
    * cosine ≥ 0.4 with it. The scale story vs q34's broadcast-exact
    * pairs: the quadratic stage is scoped to one cluster's block after
    * a single shuffle on the cluster key, which is how embedding dedup
    * stays feasible when the corpus stops being broadcastable.
    */
  def qSemanticDedup(spark: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedup(
      Tables.embeddings(spark, dir), "vec_id", "embedding",
      "label", tau = 0.4)

  val qSemanticDedupSql: String =
    """SELECT e.vec_id, e.label,
      |  EXISTS(SELECT 1 FROM embeddings o
      |         WHERE o.label = e.label AND o.vec_id < e.vec_id
      |           AND list_cosine_similarity(
      |                 o.embedding::DOUBLE[], e.embedding::DOUBLE[])
      |               >= 0.4) AS is_dup
      |FROM embeddings e""".stripMargin

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
      // nprobe 6/16: +0.14 recall@5 over 4/16 (0.59 → 0.73, SimilaritySpec pin)
      // for scanning 3/8 of the lists instead of 1/4 — the knee of the
      // measured probe-budget curve (8/16 reads half the corpus)
      .ivfTopK(emb, "vec_id", "embedding", emb, "vec_id", "embedding",
        dim = 64, k = 5, nlist = 16, nprobe = 6)
      .select("query_id", "rank", "neighbor_id")
  }

  /** q73 — product-quantization approximate top-5, the third ANN family
    * (q31 hyperplane LSH, q39 IVF): the search pass reads m=8 centroid
    * codes per corpus row instead of 64 floats — the 100 TB shape where
    * the original vectors no longer fit hot storage. Rows-only (trained
    * codebooks are engine-internal); recall vs exact asserted in
    * SimilaritySpec.
    */
  def qPqTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity
      // ksub 64 (6-bit codes): recall@5 0.66 → 0.88 (SimilaritySpec pin) for the
      // same m-code scan — codebook resolution is nearly free at query
      // time (the per-query LUT is m×ksub dots), the faiss lesson of
      // defaulting to wide codebooks. rerank stays 8: doubling it buys
      // +0.10 recall but doubles the shortlist shuffle (measured +1s
      // at sf0.1's 5000-query stress shape)
      .pqTopK(emb, "vec_id", "embedding", emb, "vec_id", "embedding",
        dim = 64, k = 5, m = 8, ksub = 64)
      .select("query_id", "rank", "neighbor_id")
  }

  /** q79 — IVF-PQ approximate top-5: coarse inverted lists × residual
    * PQ codes, the standard billion-scale index composition (probe
    * nprobe lists, m-byte ADC scan within them, exact re-rank).
    * Rows-only; recall vs exact asserted in SimilaritySpec.
    */
  def qIvfPqTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity
      // nprobe 6 + 64-wide residual codebooks: recall@5 0.66 → 0.70 at
      // sf0.01 (SimilaritySpec pin) — the same wide-codebook lesson as
      // q73, and the cost is query-side LUTs only (scan stays m=8
      // bytes/row). Measured-and-rejected alternatives: nprobe 8
      // reaches 0.78 but probes half the lists (wrong shape to scale);
      // m=16 reaches 0.72 but doubles code bytes and ADC adds per row;
      // ksub 128/256 plateau at 0.72 for 2-4x the LUT build. The
      // residual ADC caps the gain vs raw-vector PQ (q73) because the
      // shortlist competes across differently-centered lists
      .ivfPqTopK(emb, "vec_id", "embedding", emb, "vec_id", "embedding",
        dim = 64, k = 5, nlist = 16, nprobe = 6, m = 8, ksub = 64)
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

  /** q49 — k-means assignment step (cosine): every embedding labeled
    * with its nearest of 8 fixed centroids (the vectors with vec_id<8 —
    * deterministic seeds both engines construct identically, the
    * k-means++-style "seed then assign" E step). Output is ids only:
    * ranking is float-stable at this data's similarity gaps, the raw
    * cosine is engine-rounding-sensitive (same contract as q30).
    * The operator broadcasts centroids and streams the corpus once —
    * no shuffle.
    */
  def qKmeansAssign(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity
      .kmeansAssign(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 8), "vec_id", "embedding")
      .select(col("vec_id"), col("cluster"))
  }

  val qKmeansAssignSql: String =
    """SELECT vec_id, cluster FROM (
      |  SELECT e.vec_id, c.vec_id AS cluster,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |      ORDER BY list_cosine_similarity(
      |        e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
      |      c.vec_id ASC) AS rn
      |  FROM embeddings e, embeddings c WHERE c.vec_id < 8)
      |WHERE rn = 1""".stripMargin

  /** q46 — int8 embedding quantization (per-vector symmetric scale),
    * oracle-exact: scale, position-weighted checksum of the quantized
    * codes, and code range per vector. Every step (float→double abs
    * max, division, floor(x+0.5), clip) is IEEE-identical on both
    * engines.
    */
  def qQuantizeI8(spark: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(spark, dir)
      .select(col("vec_id"),
        Similarity.quantizeI8Udf(col("embedding")).as("q"))
      .select(
        col("vec_id"),
        col("q._1").as("scale"),
        col("q._2").as("qsum"),
        col("q._3").cast("long").as("qmin"),
        col("q._4").cast("long").as("qmax")
      )

  val qQuantizeI8Sql: String =
    """WITH v AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |s AS (
      |  SELECT vec_id, e,
      |    list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
      |  FROM v),
      |q AS (
      |  SELECT vec_id, scale,
      |    list_transform(range(1, len(e) + 1), i ->
      |      CASE WHEN scale = 0 THEN 0
      |        ELSE greatest(-127, least(127,
      |          CAST(floor(e[i] / scale + 0.5) AS BIGINT)))
      |      END) AS qs
      |  FROM s)
      |SELECT vec_id, scale,
      |  CAST(list_sum(list_transform(range(1, len(qs) + 1),
      |    i -> qs[i] * i)) AS BIGINT) AS qsum,
      |  CAST(list_min(list_concat(qs, [0])) AS BIGINT) AS qmin,
      |  CAST(list_max(list_concat(qs, [0])) AS BIGINT) AS qmax
      |FROM q""".stripMargin

  /** q131 — PCA of the embedding column ([[graft.operators.Pca]]):
    * fit d components in one moment-accumulation pass, project every
    * vector, and emit each row's projected squared L2 norm (rounded).
    * The eigenvectors themselves are engine-internal numerics, but at
    * k=d they form an orthonormal basis, so per row
    * ‖P(v)‖² == ‖v − mean‖² EXACTLY (norm preservation) — a quantity
    * the oracle recomputes from the raw parquet in pure SQL. Every
    * defect in the pipeline (moment accumulation, Jacobi eigenbasis
    * losing orthonormality, mean-centering, projection kernel) breaks
    * the equality, so the gate went from rows-only to hash-exact
    * without comparing eigen numerics cross-engine. Quantization:
    * `floor(‖P(v)‖²·1e4)` as BIGINT. The grid is sized against the
    * cross-engine summation-order slack (~1e-12 absolute on a ~1.0
    * value): flip-a-bucket probability ≈ 2·1e-12/1e-4 = 2e-8 per row,
    * ~1e-4 per 5,000-row corpus. (A per-row GUARD BAND cannot do
    * better here: any band wide enough to out-margin the slack gets
    * hit by a legitimate value at ~band×rows odds — both the 1e-3
    * band and r7's round(·,6) drew real values at sf0.1. Coarsening
    * the grid is the only move that shrinks BOTH failure modes.)
    * Four decimals still pin norm preservation far below any real
    * defect — a degraded eigenbasis or wrong mean shifts norms at
    * percent level. PcaSpec still pins orthonormality, descending
    * variances, projected-variance == eigenvalue, and k=d
    * reconstruction.
    */
  def qPcaEmbed(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{aggregate, col, floor, lit}
    val emb = graft.tables.Tables.embeddings(spark, dir)
    val model = graft.operators.Pca.fit(emb, "embedding", k = 64)
    val norm2 = aggregate(col("pca"), lit(0.0),
      (acc, x) => acc + x * x)
    graft.operators.Pca.transform(emb, "embedding", model)
      .select(col("vec_id"),
        floor(norm2 * lit(1e4)).cast("long").as("cnorm2_q4"))
  }

  val qPcaEmbedSql: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |u AS (SELECT vec_id, i, e[i] AS x FROM v, range(1, 65) t(i)),
      |m AS (SELECT i, avg(x) AS mu FROM u GROUP BY i)
      |SELECT u.vec_id,
      |  CAST(floor(sum((u.x - m.mu) * (u.x - m.mu)) * 1e4) AS BIGINT)
      |    AS cnorm2_q4
      |FROM u JOIN m USING (i) GROUP BY u.vec_id""".stripMargin

  /** q171 — IVF index EXACTNESS gate: [[Similarity.ivfTopK]] probing
    * ALL nlist lists must equal brute force exactly — every corpus row
    * is assigned to exactly one list, every list is scanned with the
    * exact cosine kernel, and the cross-list merge + (cosine desc,
    * neighbor asc) tie-break must reproduce q30's ranking. The trained
    * centroids stay engine-internal, but at nprobe == nlist the RESULT
    * is centroid-independent, so the whole index machinery (training
    * plumbing, list assignment, probe routing, per-list heaps, final
    * ranking) is driver-verified against the exact-top-k oracle. The
    * approximate-recall operating point stays q39 + SimilaritySpec.
    */
  def qIvfExact(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.tables.Tables.embeddings(spark, dir)
    Similarity
      .ivfTopK(emb, "vec_id", "embedding", emb, "vec_id", "embedding",
        dim = 64, k = 5, nlist = 16, nprobe = 16)
      .select("query_id", "rank", "neighbor_id")
  }

  /** q172 — LSH multi-probe EXACTNESS gate: at planes=2 the probe set
    * (own bucket + both single-plane flips + the pair flip) covers all
    * 4 buckets, so [[Similarity.annTopK]] must equal brute force — the
    * hyperplane hashing, XOR probe-mask expansion, per-bucket query
    * index, and candidate merge are all on the hook, with no bucket
    * left unprobed to hide a routing bug behind "approximate". Same
    * oracle as q30/q171; the recall-<1 operating point stays q31 +
    * SimilaritySpec.
    */
  def qLshExact(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.tables.Tables.embeddings(spark, dir)
    Similarity
      .annTopK(emb, "vec_id", "embedding", emb, "vec_id", "embedding",
        dim = 64, k = 5, planes = 2)
      .select("query_id", "rank", "neighbor_id")
  }

  /** q174 — PQ exactness gate (the q171/q172 discipline for the third
    * ANN family): with the re-rank shortlist sized to cover the WHOLE
    * corpus, [[Similarity.pqTopK]]'s two-stage pipeline (codebook
    * train → encode → ADC scan → exact cosine re-rank) must reproduce
    * brute force exactly, independent of codebook quality — encode
    * plumbing, shortlist routing, the re-rank kernel and its
    * tie-breaks are all driver-verified. The query side is bounded to
    * every-100th vector because an all-corpus shortlist is O(n) PER
    * QUERY by construction — the full-query-side operating point with
    * a tight shortlist stays q73 + SimilaritySpec recall pins.
    */
  def qPqExact(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val emb = graft.tables.Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val n = emb.count()
    Similarity
      .pqTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
        dim = 64, k = 5, m = 8, ksub = 16,
        rerank = ((n + 4) / 5).toInt + 1)
      .select("query_id", "rank", "neighbor_id")
  }

  /** q175 — IVF-PQ exactness gate: all nlist lists probed AND the
    * re-rank shortlist covering the corpus ⇒ the coarse+residual
    * composition must equal brute force exactly (the q174 rationale
    * applied to the fourth family; residual ADC scores become
    * routing-only when everything survives to the exact re-rank).
    * With q171/q172/q174 this puts a hash-exact driver gate on ALL
    * FOUR ANN families; approximate operating points stay q31/q39/
    * q73/q79 + spec recall pins.
    */
  def qIvfPqExact(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val emb = graft.tables.Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val n = emb.count()
    Similarity
      .ivfPqTopK(emb, "vec_id", "embedding", queries, "vec_id",
        "embedding", dim = 64, k = 5, nlist = 16, nprobe = 16, m = 8,
        ksub = 16, rerank = ((n + 4) / 5).toInt + 1)
      .select("query_id", "rank", "neighbor_id")
  }

  /** q196 — IVF OPERATING-POINT gate: per-query integer confusion
    * counts (truth/approx/tp/fn) of the shipped IVF search pass at a
    * REAL partial-probe budget (nprobe 6 of 16 — the q39 knee) against
    * exhaustive truth. q171 proved the machinery exact at nprobe ==
    * nlist; this pins the approximation itself: with a DETERMINISTIC
    * coarse quantizer (the 16 lowest-id corpus vectors — the sampled-
    * quantizer IVF variant) the oracle recomputes list assignment
    * (argmin L2, lowest-index ties), probe routing, the per-list
    * ranking AND the exact truth in SQL, so recall at the shipped
    * operating point is itself a hash-checked CORRECTNESS row, not a
    * spec assertion. (The Lloyd-TRAINED quantizer stays engine-internal
    * → its operating point remains q39 + SimilaritySpec.)
    */
  def qIvfConfusion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val emb = graft.tables.Tables.embeddings(spark, dir)
    val cents: Array[Array[Double]] = emb
      .select(col("vec_id").cast("long"), col("embedding"))
      .orderBy("vec_id").limit(16)
      .as[(Long, Array[Float])].collect()
      .sortBy(_._1)
      .map(_._2.map(_.toDouble))
    val approx = Similarity
      .ivfTopKWithCentroids(emb, "vec_id", "embedding", emb, "vec_id",
        "embedding", k = 5, centroids = cents, nprobe = 6)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("a"))
    val exact = Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", emb, "vec_id",
        "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("t"))
    exact
      .join(approx, Seq("query_id", "neighbor_id"), "full_outer")
      .groupBy("query_id")
      .agg(
        sum(when(col("t").isNotNull, 1L).otherwise(0L)).as("n_truth"),
        sum(when(col("a").isNotNull, 1L).otherwise(0L)).as("n_approx"),
        sum(when(col("t").isNotNull && col("a").isNotNull, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("t").isNotNull && col("a").isNull, 1L)
          .otherwise(0L)).as("fn"))
  }

  /** Full recompute of the q196 pipeline: quantizer = 16 lowest-id
    * vectors, L2 assignment/probing (lowest-index ties), cosine
    * ranking within probed lists, confusion vs the q30 exhaustive
    * truth.
    */
  val qIvfConfusionSql: String =
    """WITH cents AS (
      |  SELECT embedding,
      |    ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS ci
      |  FROM embeddings ORDER BY vec_id LIMIT 16),
      |assign AS (
      |  SELECT e.vec_id, (
      |    SELECT ci FROM cents c
      |    ORDER BY list_distance(e.embedding::DOUBLE[],
      |                           c.embedding::DOUBLE[]), c.ci
      |    LIMIT 1) AS list
      |  FROM embeddings e),
      |probes AS (
      |  SELECT vec_id AS query_id, ci FROM (
      |    SELECT q.vec_id, c.ci,
      |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_distance(q.embedding::DOUBLE[],
      |                               c.embedding::DOUBLE[]), c.ci) AS pr
      |    FROM embeddings q CROSS JOIN cents c)
      |  WHERE pr <= 6),
      |approx AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
      |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
      |          e.embedding::DOUBLE[]) DESC, e.vec_id ASC) AS rank
      |    FROM embeddings q
      |    JOIN probes p ON p.query_id = q.vec_id
      |    JOIN assign a ON a.list = p.ci
      |    JOIN embeddings e ON e.vec_id = a.vec_id
      |    WHERE e.vec_id <> q.vec_id)
      |  WHERE rank <= 5),
      |exact AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
      |          c.embedding::DOUBLE[]) DESC, c.vec_id ASC) AS rank
      |    FROM embeddings q, embeddings c
      |    WHERE q.vec_id <> c.vec_id)
      |  WHERE rank <= 5),
      |m AS (
      |  SELECT COALESCE(t.query_id, a.query_id) AS query_id,
      |    t.query_id IS NOT NULL AS ist,
      |    a.query_id IS NOT NULL AS isa
      |  FROM exact t FULL OUTER JOIN approx a
      |    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id)
      |SELECT query_id,
      |  CAST(COUNT(*) FILTER (ist) AS BIGINT) AS n_truth,
      |  CAST(COUNT(*) FILTER (isa) AS BIGINT) AS n_approx,
      |  CAST(COUNT(*) FILTER (ist AND isa) AS BIGINT) AS tp,
      |  CAST(COUNT(*) FILTER (ist AND NOT isa) AS BIGINT) AS fn
      |FROM m GROUP BY query_id""".stripMargin

  /** Oracle for q174/q175: exact top-5 restricted to the every-100th
    * query subset (the q30 SQL with the same query-side predicate).
    */
  val qSubsetTopKSql: String =
    """SELECT query_id, rank, neighbor_id FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(
      |        q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
      |      c.vec_id ASC) AS rank
      |  FROM embeddings q, embeddings c
      |  WHERE q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id)
      |WHERE rank <= 5""".stripMargin
}
