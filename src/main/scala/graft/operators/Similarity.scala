package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path (SURVEY §7.5).
  */
object Similarity {

  /** Row cap for [[cosinePairsAbove]]'s driver-collected corpus: 100k
    * rows of 100-dim float vectors ≈ 40 MB broadcast, comfortably
    * inside default driver/executor memory; anything larger belongs on
    * the distributed paths (semanticDedup / annTopK).
    */
  val CosinePairsMaxRows: Long = 100000L

  /** Vector kernels. Implemented as compact JVM loops behind UDFs rather
    * than `aggregate`/`zip_with` trees: ArrayAggregate is CodegenFallback
    * (interpreted — measured ~34µs per 64-dim cosine at sf0.1), while the
    * primitive-array loop runs ~100× faster with the SAME left-to-right
    * fold order, so results stay bit-identical to the DuckDB oracle.
    */
  private def floats(a: scala.collection.Seq[Float]): Array[Float] = a match {
    case w: scala.collection.mutable.ArraySeq.ofFloat => w.array
    case other => other.toArray
  }

  private val dotUdf = udf { (a: scala.collection.Seq[Float], b: scala.collection.Seq[Float]) =>
    val xa = floats(a); val xb = floats(b)
    var s = 0.0
    var i = 0
    val n = math.min(xa.length, xb.length)
    while (i < n) { s += xa(i).toDouble * xb(i).toDouble; i += 1 }
    s
  }

  private val cosineUdf = udf { (a: scala.collection.Seq[Float], b: scala.collection.Seq[Float]) =>
    val xa = floats(a); val xb = floats(b)
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    // fail fast on ragged vectors, mirroring VectorKernels.cosine
    require(xa.length == xb.length,
      s"cosine: dimension mismatch ${xa.length} vs ${xb.length}")
    val n = xa.length
    while (i < n) {
      val x = xa(i).toDouble
      val y = xb(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    val norm = math.sqrt(na) * math.sqrt(nb)
    if (norm == 0.0) 0.0 else d / norm
  }

  /** Generic dot (mixed element types, e.g. float vectors × double
    * hyperplanes in [[lshBucket]]): expression fold, interpreted but only
    * evaluated `planes` times per row. Hot pairwise paths use the UDF.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  /** Fast float-vector dot for pairwise scoring. */
  def dotF(a: Column, b: Column): Column = dotUdf(a, b)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine as a NATIVE codegen'd Catalyst expression
    * ([[graft.functions.FloatVecCosine]]) — stays inside whole-stage
    * codegen where the UDF form would fence it; same fold order, so
    * values are bit-identical to [[cosineUdf]] and the SQL oracle.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.FloatVecCosine(a, b)

  /** The Scala-UDF form of [[cosine]], kept for the A/B in PERF.md. */
  def cosineViaUdf(a: Column, b: Column): Column = cosineUdf(a, b)

  /** Exact top-k neighbors of every query vector against the corpus.
    *
    * Queries are broadcast (the small side by contract); the corpus
    * streams through one partitioned pass — cost |corpus| × |queries|
    * FLOPs but never a shuffled cross product of the corpus with itself.
    * Ranking window partitions by query id only, so the shuffle key count
    * equals |queries|.
    *
    * Output: (query id, rank 1..k, neighbor id, cosine) with a
    * deterministic (cosine desc, neighbor asc) tie-break.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int,
      excludeSelf: Boolean = true
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    // queries are the small side by contract: collected once, normalized,
    // and broadcast as primitive arrays
    val qData: Array[(Long, Array[Float], Double)] = queries
      .select(col(queryId).cast("long"), col(queryVec))
      .as[(Long, Array[Float])]
      .collect()
      .map { case (id, v) =>
        var n = 0.0
        var i = 0
        while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
        (id, v, math.sqrt(n))
      }
    val bc = spark.sparkContext.broadcast(qData)

    // one streaming pass over the corpus; per (partition, query) a
    // bounded heap keeps only k candidates, so the shuffle into the
    // final ranking carries partitions×|queries|×k rows instead of
    // |corpus|×|queries| — the difference between 320k and 4M rows at
    // sf0.1, and between feasible and not at 100 TB.
    val partials = corpus
      .select(col(corpusId).cast("long"), col(corpusVec))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val qs = bc.value
        // worst-first ordering: smaller cosine first; ties prefer LARGER
        // neighbor id first so eviction keeps the smaller id
        implicit val worstFirst: Ordering[(Double, Long)] =
          Ordering.fromLessThan { (a, b) =>
            a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)
          }
        val heaps = Array.fill(qs.length)(
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
            worstFirst.reverse))
        rows.foreach { case (cid, cv) =>
          var cn = 0.0
          var i = 0
          while (i < cv.length) {
            cn += cv(i).toDouble * cv(i).toDouble; i += 1
          }
          val cNorm = math.sqrt(cn)
          var qi = 0
          while (qi < qs.length) {
            val (qid, qv, qNorm) = qs(qi)
            if (!(excludeSelf && qid == cid)) {
              var d = 0.0
              var j = 0
              val n = math.min(cv.length, qv.length)
              while (j < n) { d += cv(j).toDouble * qv(j).toDouble; j += 1 }
              val denom = cNorm * qNorm
              val cos = if (denom == 0.0) 0.0 else d / denom
              val h = heaps(qi)
              if (h.size < k) h.enqueue((cos, cid))
              else if (worstFirst.gt((cos, cid), h.head)) {
                h.dequeue(); h.enqueue((cos, cid))
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          val qid = qs(qi)._1
          h.iterator.map { case (cos, cid) => (qid, cid, cos) }
        }
      }
      .toDF("query_id", "neighbor_id", "cosine")

    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    partials
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** All (a < b) pairs with cosine ≥ tau — the exact embedding-near-dup
    * operator. The full vector set is broadcast as primitive arrays and
    * each partition streams its rows against it (n²/2 dot products
    * spread across tasks, no materialized cross join). For corpora too
    * big to broadcast, use [[annTopK]]'s bucketed path instead.
    */
  def cosinePairsAbove(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double,
      maxRows: Long = CosinePairsMaxRows
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // ENFORCE the small-frame contract instead of documenting it: the
    // corpus is collected and broadcast below, so a caller pointing this
    // at a real corpus would get a driver OOM, not an error. The count
    // is cheap (column-pruned scan) relative to the n² work that follows.
    val n = df.count()
    require(n <= maxRows,
      s"cosinePairsAbove collects the corpus to the driver and got " +
        s"$n rows (cap $maxRows): use semanticDedup (cluster-scoped " +
        s"pairs) or annTopK (bucketed) for corpora beyond broadcast size")
    val all: Array[(Long, Array[Float], Double)] = df
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .collect()
      .map { case (id, v) =>
        var n = 0.0
        var i = 0
        while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
        (id, v, math.sqrt(n))
      }
    val bc = spark.sparkContext.broadcast(all)
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val others = bc.value
        rows.flatMap { case (ida, va) =>
          var na = 0.0
          var i = 0
          while (i < va.length) {
            na += va(i).toDouble * va(i).toDouble; i += 1
          }
          val aNorm = math.sqrt(na)
          others.iterator.filter(_._1 > ida).flatMap {
            case (idb, vb, bNorm) =>
              var d = 0.0
              var j = 0
              val n = math.min(va.length, vb.length)
              while (j < n) { d += va(j).toDouble * vb(j).toDouble; j += 1 }
              val denom = aNorm * bNorm
              val cos = if (denom == 0.0) 0.0 else d / denom
              if (cos >= tau) Some((ida, idb)) else None
          }
        }
      }
      .toDF("id_a", "id_b")
  }

  /** SemDeDup-style cluster-scoped near-duplicate verdicts: a row is a
    * duplicate iff some LOWER-id row in the SAME cluster has cosine ≥
    * tau with it (keep-lowest survivor policy). The quadratic pair work
    * is bounded per cluster — the whole point of clustering before
    * deduplicating — so the plan is one shuffle of each side on the
    * cluster key into an equi-join (AQE splits skewed clusters), with
    * the native codegen'd [[cosine]] expression as the pair filter —
    * the same left-to-right double fold as [[bruteForceTopK]], so
    * scores match a SQL `list_cosine_similarity` oracle bit-for-bit.
    */
  def semanticDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      clusterCol: String,
      tau: Double
  ): DataFrame = {
    val a = df.select(col(idCol).cast("long").as("id_a"),
      col(clusterCol).as("__c"), col(vecCol).as("__va"))
    val b = df.select(col(idCol).cast("long").as("id_b"),
      col(clusterCol).as("__c"), col(vecCol).as("__vb"))
    val dupIds = a
      .join(b, Seq("__c"))
      .filter(col("id_b") > col("id_a") &&
        cosine(col("__va"), col("__vb")) >= tau)
      .select(col("id_b").as("__dup_id"))
      .distinct()
    df.select(col(idCol).cast("long").as(idCol), col(clusterCol))
      .join(dupIds.withColumn("__d", lit(true)),
        col(idCol) === col("__dup_id"), "left")
      .select(col(idCol), col(clusterCol),
        coalesce(col("__d"), lit(false)).as("is_dup"))
  }

  /** One k-means assignment (E) step over cosine similarity: every row
    * is labeled with the id of its nearest centroid. Centroids are the
    * small side by contract (k vectors) — collected, sorted by id, and
    * broadcast as primitive arrays; the data streams through one
    * embarrassingly-parallel pass (no shuffle at all), which is the
    * shape that holds at any corpus size. Ties (equal cosine) keep the
    * lowest centroid id, so the assignment is deterministic and matches
    * a `ROW_NUMBER() OVER (ORDER BY cos DESC, centroid_id ASC)` oracle.
    *
    * The cosine kernel uses the same left-to-right fold as
    * [[bruteForceTopK]], so scores are bit-identical to that baseline.
    */
  def kmeansAssign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      centroidId: String,
      centroidVec: String
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cData: Array[(Long, Array[Float], Double)] = centroids
      .select(col(centroidId).cast("long"), col(centroidVec))
      .as[(Long, Array[Float])]
      .collect()
      .sortBy(_._1)
      .map { case (id, v) =>
        var n = 0.0
        var i = 0
        while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
        (id, v, math.sqrt(n))
      }
    require(cData.nonEmpty, "kmeansAssign needs at least one centroid")
    val dim = cData(0)._2.length
    require(cData.forall(_._2.length == dim),
      s"centroid vectors disagree on dimension (expected $dim)")
    val bc = spark.sparkContext.broadcast(cData)
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val cs = bc.value
        rows.map { case (id, v) =>
          var vn = 0.0
          var i = 0
          while (i < v.length) { vn += v(i).toDouble * v(i).toDouble; i += 1 }
          val vNorm = math.sqrt(vn)
          // mismatched dims would silently truncate the dot product to
          // a wrong-but-plausible cosine; fail fast like the oracle's
          // list_cosine_similarity does
          require(v.length == cs(0)._2.length,
            s"row $id vector has dimension ${v.length}, " +
              s"centroids have ${cs(0)._2.length}")
          var best = cs(0)._1
          var bestCos = Double.NegativeInfinity
          var ci = 0
          while (ci < cs.length) {
            val (cid, cv, cNorm) = cs(ci)
            var d = 0.0
            var j = 0
            val n = v.length
            while (j < n) { d += v(j).toDouble * cv(j).toDouble; j += 1 }
            val denom = vNorm * cNorm
            val cos = if (denom == 0.0) 0.0 else d / denom
            // strict > keeps the first (lowest-id) centroid on ties
            if (cos > bestCos) { bestCos = cos; best = cid }
            ci += 1
          }
          (id, best, bestCos)
        }
      }
      .toDF(idCol, "cluster", "cosine")
  }

  /** IVF (inverted-file) top-k — the centroid-partitioned ANN variant
    * beside the hyperplane-LSH one ([[annTopK]]): train `nlist` coarse
    * centroids with a few Lloyd iterations, assign every corpus row to
    * its nearest centroid (the inverted lists), and answer each query
    * from the `nprobe` lists whose centroids are nearest to it.
    *
    * Scale shape: training is ONE bounded-sample collect + driver-side
    * Lloyd ([[trainCoarse]]) — O(1) in corpus size; search is the
    * same ONE streaming corpus pass + per-(partition, query) bounded
    * heaps as the other kernels — zero shuffled candidates. Centroid
    * seeds are chosen by a deterministic md5 order; an approximate
    * operator: rows-only gate + recall assertion in SimilaritySpec,
    * like q31.
    */
  def ivfTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      dim: Int,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 3
  ): DataFrame =
    ivfTopKWithCentroids(corpus, corpusId, corpusVec, queries, queryId,
      queryVec, k,
      trainCoarse(corpus, corpusId, corpusVec, dim, nlist, iters), nprobe)

  /** [[ivfTopK]]'s search pass with a CALLER-SUPPLIED coarse quantizer
    * (one double vector per list, list id = array index). Two uses: a
    * pre-trained/persisted quantizer (the production shape — indexes
    * are trained once, searched for months), and the q196 operating-
    * point gate, where a deterministic quantizer (the nlist lowest-id
    * corpus vectors) makes the whole approximate result — assignment,
    * probe choice, per-list ranking — recomputable by the DuckDB
    * oracle, so the shipped search pass itself is hash-checked.
    */
  def ivfTopKWithCentroids(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int,
      centroids: Array[Array[Double]],
      nprobe: Int
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val ds = corpus
      .select(col(corpusId).cast("long"), col(corpusVec))
      .as[(Long, Array[Float])]

    // per query: the nprobe nearest centroid ids
    val hs = centroids
    val qData: Array[(Long, Array[Float], Double, Array[Int])] = queries
      .select(col(queryId).cast("long"), col(queryVec))
      .as[(Long, Array[Float])]
      .collect()
      .map { case (id, v) =>
        var n = 0.0
        var i = 0
        while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
        val probes = hs.indices
          .sortBy(ci => (dist2(v, hs(ci)), ci))
          .take(nprobe).toArray
        (id, v, math.sqrt(n), probes)
      }
    val byList: Map[Int, Array[Int]] = qData.zipWithIndex
      .flatMap { case ((_, _, _, ps), qi) => ps.map(_ -> qi) }
      .groupBy(_._1)
      .map { case (c, xs) => c -> xs.map(_._2) }
    val bcQ = spark.sparkContext.broadcast(qData)
    val bcIdx = spark.sparkContext.broadcast(byList)
    val bcC = spark.sparkContext.broadcast(centroids)

    val partials = ds
      .mapPartitions { rows =>
        val qs = bcQ.value
        val idx = bcIdx.value
        val cs = bcC.value
        implicit val worstFirst: Ordering[(Double, Long)] =
          Ordering.fromLessThan { (a, b) =>
            a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)
          }
        val heaps = scala.collection.mutable.HashMap
          .empty[Int, scala.collection.mutable.PriorityQueue[(Double, Long)]]
        rows.foreach { case (cid, cv) =>
          if (cv != null) {
          var cn = 0.0
          var i = 0
          while (i < cv.length) {
            cn += cv(i).toDouble * cv(i).toDouble; i += 1
          }
          val cNorm = math.sqrt(cn)
          idx.getOrElse(nearest(cv, cs), Array.empty[Int]).foreach { qi =>
            val (qid, qv, qNorm, _) = qs(qi)
            if (qid != cid) {
              var d = 0.0
              var j = 0
              val n = math.min(cv.length, qv.length)
              while (j < n) { d += cv(j).toDouble * qv(j).toDouble; j += 1 }
              val denom = cNorm * qNorm
              val cos = if (denom == 0.0) 0.0 else d / denom
              val h = heaps.getOrElseUpdate(qi,
                scala.collection.mutable.PriorityQueue
                  .empty[(Double, Long)](worstFirst.reverse))
              if (h.size < k) h.enqueue((cos, cid))
              else if (worstFirst.gt((cos, cid), h.head)) {
                h.dequeue(); h.enqueue((cos, cid))
              }
            }
          }
          }
        }
        heaps.iterator.flatMap { case (qi, h) =>
          val qid = bcQ.value(qi)._1
          h.iterator.map { case (cos, cid) => (qid, cid, cos) }
        }
      }
      .toDF("query_id", "neighbor_id", "cosine")
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    partials
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  // ---- shared coarse-centroid kernels (IVF, IVF-PQ) ----------------------

  private def dist2(v: Array[Float], c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(v.length, c.length)
    while (i < n) { val d = v(i).toDouble - c(i); s += d * d; i += 1 }
    s
  }

  private def nearest(v: Array[Float], cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var ci = 0
    while (ci < cs.length) {
      val d = dist2(v, cs(ci))
      if (d < bestD) { bestD = d; best = ci }
      ci += 1
    }
    best
  }

  /** Rows a k-means trainer reads, tops out here regardless of corpus
    * size — the faiss discipline: codebooks are trained on a bounded
    * sample and applied to everything. At 100 TB the alternative
    * (`iters` full corpus passes per trained structure) would dominate
    * the whole index build; a 16k sample is statistically identical
    * for ≤256 centroids and makes training cost O(1) in corpus size.
    */
  private val MaxTrainSample = 16384

  /** Deterministic bounded training sample: rows in md5(id) order (the
    * same order the seed picks always used, so seeds are a prefix of
    * the sample), nulls skipped, wrong dimensions fail fast. ONE Spark
    * job; Lloyd iterations then run driver-side on the sample.
    */
  private def trainSample(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      maxRows: Int = MaxTrainSample
  ): Array[Array[Float]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .filter(col("v").isNotNull)
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(maxRows)
      .as[(Long, Array[Float])]
      .collect()
    sample.foreach { case (id, v) =>
      require(v.length == dim,
        s"row $id vector has dimension ${v.length}, expected $dim")
    }
    sample.map(_._2)
  }

  /** Driver-side Lloyd over a training sample: seeds are the first `k`
    * sample rows (md5-order prefix, matching the historical seed
    * pick), `iters` assignment/average passes in memory.
    */
  private def lloydInMemory(
      sample: Array[Array[Float]],
      dim: Int,
      k: Int,
      iters: Int
  ): Array[Array[Double]] = {
    require(sample.nonEmpty, "k-means training needs at least one row")
    val centroids: Array[Array[Double]] =
      sample.take(k).map(_.map(_.toDouble))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      var r = 0
      while (r < sample.length) {
        val v = sample(r)
        val ci = nearest(v, centroids)
        val s = sums(ci)
        var i = 0
        while (i < dim) { s(i) += v(i).toDouble; i += 1 }
        counts(ci) += 1
        r += 1
      }
      var ci = 0
      while (ci < centroids.length) {
        if (counts(ci) > 0) {
          val s = sums(ci)
          val c = new Array[Double](dim)
          var i = 0
          while (i < dim) { c(i) = s(i) / counts(ci); i += 1 }
          centroids(ci) = c
        }
        ci += 1
      }
      it += 1
    }
    centroids
  }

  /** Coarse k-means training shared by [[ivfTopK]] and [[ivfPqTopK]]:
    * one bounded-sample collect ([[trainSample]]), then driver-side
    * Lloyd ([[lloydInMemory]]). Returns fewer than `nlist` centroids
    * when the corpus is smaller — callers size downstream structures
    * by the returned length, not by nlist.
    */
  private def trainCoarse(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nlist: Int,
      iters: Int
  ): Array[Array[Double]] =
    lloydInMemory(trainSample(corpus, idCol, vecCol, dim), dim, nlist,
      iters)

  /** |cb(s)(c)|² per (subspace, centroid) — shared by the ADC scorers
    * of [[pqTopK]] and [[ivfPqTopK]] so the table math can never drift
    * between the two PQ paths.
    */
  private def codebookNorm2(
      cb: Array[Array[Array[Double]]]): Array[Array[Double]] =
    cb.map(_.map { c =>
      var n = 0.0
      var j = 0
      while (j < c.length) { n += c(j) * c(j); j += 1 }
      n
    })

  /** Per-query ADC lookup table `lut(s)(c) = q_sub(s) · cb(s)(c)` —
    * shared by [[pqTopK]] and [[ivfPqTopK]].
    */
  private def queryLut(
      v: Array[Float],
      cb: Array[Array[Array[Double]]]): Array[Array[Double]] =
    Array.tabulate(cb.length, cb(0).length) { (s, c) =>
      val subDim = cb(s)(c).length
      var d = 0.0
      var j = 0
      while (j < subDim) { d += v(s * subDim + j).toDouble * cb(s)(c)(j); j += 1 }
      d
    }

  /** Nearest sub-centroid of subspace `s` for vector `v` — shared by
    * training and encoding so assignment (incl. the lowest-index
    * tie-break of strict `<`) can never desynchronize between them.
    */
  private def subNearest(v: Array[Float], s: Int,
      cb: Array[Array[Array[Double]]]): Int = {
    val subDim = cb(s)(0).length
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cb(s).length) {
      var d = 0.0
      var j = 0
      while (j < subDim) {
        val x = v(s * subDim + j).toDouble - cb(s)(c)(j)
        d += x * x
        j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Product-quantization codebooks: `m` subspaces × `ksub` centroids ×
    * (dim/m) dims, trained per subspace by driver-side Lloyd over a
    * bounded md5-ordered sample ([[trainSample]]) — one Spark job
    * total, O(1) in corpus size. Seeds are the first `ksub` sample
    * rows, like [[ivfTopK]].
    */
  def pqTrain(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      ksub: Int,
      iters: Int
  ): Array[Array[Array[Double]]] =
    pqTrainOnSample(trainSample(corpus, idCol, vecCol, dim), dim, m,
      ksub, iters)

  /** Driver-side PQ training over an already-collected sample: per
    * subspace, seeds are the sub-vectors of the first `ksub` sample
    * rows, then `iters` Lloyd passes in memory. Shared by [[pqTrain]]
    * and [[ivfPqTopK]] (which trains on driver-computed residuals of
    * the same coarse-training sample — zero extra Spark jobs).
    */
  private def pqTrainOnSample(
      sample: Array[Array[Float]],
      dim: Int,
      m: Int,
      ksub: Int,
      iters: Int
  ): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    require(sample.length >= ksub, s"need at least $ksub training rows")
    val subDim = dim / m
    // codebooks(s)(c) = centroid c of subspace s
    val codebooks: Array[Array[Array[Double]]] = Array.tabulate(m, ksub) {
      (s, c) =>
        Array.tabulate(subDim)(j => sample(c)(s * subDim + j).toDouble)
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(m, ksub)(new Array[Double](subDim))
      val counts = Array.fill(m, ksub)(0L)
      var r = 0
      while (r < sample.length) {
        val v = sample(r)
        var s = 0
        while (s < m) {
          val c = subNearest(v, s, codebooks)
          val acc = sums(s)(c)
          var j = 0
          while (j < subDim) {
            acc(j) += v(s * subDim + j).toDouble; j += 1
          }
          counts(s)(c) += 1
          s += 1
        }
        r += 1
      }
      var s = 0
      while (s < m) {
        var c = 0
        while (c < ksub) {
          if (counts(s)(c) > 0) {
            val acc = sums(s)(c)
            val cent = new Array[Double](subDim)
            var j = 0
            while (j < subDim) { cent(j) = acc(j) / counts(s)(c); j += 1 }
            codebooks(s)(c) = cent
          }
          c += 1
        }
        s += 1
      }
      it += 1
    }
    codebooks
  }

  /** PQ-encode a corpus: every vector becomes `m` small centroid codes
    * (m bytes at ksub ≤ 256) — a 32× memory cut for 64-dim floats at
    * m=8. The scan side of [[pqTopK]], exposed for storage use.
    */
  def pqEncode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      codebooks: Array[Array[Array[Double]]]
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    val dim = m * subDim
    val bc = spark.sparkContext.broadcast(codebooks)
    corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val cb = bc.value
        rows.collect {
          // null vectors are un-encodable and skipped (documented);
          // wrong dimensions fail fast — silent truncation would
          // produce wrong-but-plausible codes
          case (id, v) if v != null =>
            require(v.length == dim,
              s"row $id vector has dimension ${v.length}, expected $dim")
            val codes = new Array[Int](m)
            var s = 0
            while (s < m) {
              codes(s) = subNearest(v, s, cb)
              s += 1
            }
            (id, codes)
        }
      }
      .toDF(idCol, "codes")
  }

  /** PQ approximate top-k (asymmetric distance computation with exact
    * re-ranking): corpus vectors are scanned as `m` centroid codes;
    * every query pre-computes an m×ksub lookup table of partial dot
    * products (plus centroid norms), so scoring a corpus row is m table
    * adds — no float-vector reads at all in the shortlist pass. The ADC
    * shortlist (`rerank`×k per query) then joins back to the original
    * vectors for exact cosine re-ranking — the standard two-stage PQ
    * pipeline: the cheap code scan touches everything, the expensive
    * float reads touch only the shortlist. Third ANN variant beside
    * hyperplane-LSH ([[annTopK]]) and IVF ([[ivfTopK]]); approximate by
    * construction, so rows-only gate + recall assertion in
    * SimilaritySpec.
    */
  def pqTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      dim: Int,
      k: Int,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 3,
      rerank: Int = 8
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val shortK = k * rerank
    val codebooks = pqTrain(corpus, corpusId, corpusVec, dim, m, ksub, iters)
    val codes = pqEncode(corpus, corpusId, corpusVec, codebooks)
      .as[(Long, Array[Int])]

    // per-query ADC tables: dot(s)(c) = q_sub·centroid, plus centroid
    // norm² per (s, c) for the denominator estimate
    val norm2 = codebookNorm2(codebooks)
    // ONE driver collect builds both the ADC tables and the re-rank
    // vector map (norms shared too)
    val qRaw: Array[(Long, Array[Float], Double)] = queries
      .select(col(queryId).cast("long"), col(queryVec))
      .as[(Long, Array[Float])]
      .collect()
      .map { case (id, v) =>
        require(v != null && v.length == dim,
          s"query $id vector has dimension " +
            s"${if (v == null) "null" else v.length}, expected $dim")
        var n = 0.0
        var i = 0
        while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
        (id, v, math.sqrt(n))
      }
    val qData: Array[(Long, Array[Array[Double]], Double)] =
      qRaw.map { case (id, v, norm) => (id, queryLut(v, codebooks), norm) }
    val bcQ = spark.sparkContext.broadcast(qData)
    val bcN = spark.sparkContext.broadcast(norm2)

    val partials = codes
      .mapPartitions { rows =>
        val qs = bcQ.value
        val n2 = bcN.value
        implicit val worstFirst: Ordering[(Double, Long)] =
          Ordering.fromLessThan { (a, b) =>
            a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)
          }
        val heaps = Array.fill(qs.length)(
          scala.collection.mutable.PriorityQueue
            .empty[(Double, Long)](worstFirst.reverse))
        rows.foreach { case (cid, cs) =>
          // reconstructed norm is query-independent: compute once
          var vn = 0.0
          var s = 0
          while (s < m) { vn += n2(s)(cs(s)); s += 1 }
          val vNorm = math.sqrt(vn)
          var qi = 0
          while (qi < qs.length) {
            val (qid, lut, qNorm) = qs(qi)
            if (qid != cid) {
              var d = 0.0
              var t = 0
              while (t < m) { d += lut(t)(cs(t)); t += 1 }
              val denom = vNorm * qNorm
              val score = if (denom == 0.0) 0.0 else d / denom
              val h = heaps(qi)
              if (h.size < shortK) h.enqueue((score, cid))
              else if (worstFirst.gt((score, cid), h.head)) {
                h.dequeue(); h.enqueue((score, cid))
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (score, cid) => (qs(qi)._1, cid) }
        }
      }
      .toDF("query_id", "neighbor_id")
    // ADC shortlist (≤ partitions×shortK rows per query), then exact
    // re-rank: only shortlisted ids read their float vectors again
    rerankExact(partials.dropDuplicates("query_id", "neighbor_id"),
      corpus, corpusId, corpusVec, qRaw, k)
  }

  /** Exact cosine re-ranking of an ANN shortlist (query_id,
    * neighbor_id): join back to the corpus vectors (only shortlisted
    * ids read floats again), score against the broadcast query
    * vectors, keep top-k per query. Shared by [[pqTopK]] and
    * [[ivfPqTopK]].
    */
  private def rerankExact(
      shortlist: DataFrame,
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      qRaw: Array[(Long, Array[Float], Double)],
      k: Int
  ): DataFrame = {
    val spark = corpus.sparkSession
    val qVecs: Map[Long, (Array[Float], Double)] =
      qRaw.map { case (id, v, norm) => id -> (v, norm) }.toMap
    val bcV = spark.sparkContext.broadcast(qVecs)
    val exactCos = udf { (qid: Long, v: scala.collection.Seq[Float]) =>
      val (qv, qNorm) = bcV.value(qid)
      // corpus dims were validated at encode time; no silent truncation
      require(v.length == qv.length,
        s"re-rank vector has dimension ${v.length}, expected ${qv.length}")
      var d = 0.0
      var vn = 0.0
      var i = 0
      while (i < qv.length) {
        val x = v(i).toDouble
        d += x * qv(i).toDouble
        vn += x * x
        i += 1
      }
      val denom = math.sqrt(vn) * qNorm
      if (denom == 0.0) 0.0 else d / denom
    }
    val reranked = shortlist
      .join(corpus.select(col(corpusId).cast("long").as("neighbor_id"),
        col(corpusVec).as("__v")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        exactCos(col("query_id"), col("__v")).as("cosine"))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    reranked
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** IVF-PQ top-k — the standard billion-scale composition of the two
    * index halves: coarse centroids partition the corpus into inverted
    * lists ([[ivfTopK]]'s role), and each row stores only the PQ codes
    * of its RESIDUAL (vector − its list centroid), which quantize far
    * tighter than raw vectors because residuals concentrate near zero.
    * Queries probe `nprobe` lists; within a probed list the ADC score
    * reconstructs `dot(q, c_list + recon(codes))` and
    * `|c_list + recon(codes)|²` from three lookup tables (query·codebook,
    * centroid·codebook, codebook norms — all tiny and driver-built), so
    * the scan still reads m bytes per row. The ADC shortlist re-ranks
    * exactly, like [[pqTopK]]. Rows-only gate + recall assertion in
    * SimilaritySpec (trained structures are engine-internal).
    */
  def ivfPqTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      dim: Int,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 3,
      rerank: Int = 8
  ): DataFrame = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val spark = corpus.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val shortK = k * rerank

    // ONE bounded-sample collect trains BOTH halves of the index:
    // coarse centroids from the sample, then residual PQ codebooks
    // from the sample's own residuals (computed driver-side) — the
    // faiss training discipline, zero full-corpus training passes.
    val sample = trainSample(corpus, corpusId, corpusVec, dim)
    val coarse = lloydInMemory(sample, dim, nlist, iters)
    val resSample: Array[Array[Float]] = sample.map { v =>
      val c = coarse(nearest(v, coarse))
      val r = new Array[Float](dim)
      var i = 0
      while (i < dim) { r(i) = (v(i).toDouble - c(i)).toFloat; i += 1 }
      r
    }
    val pq = pqTrainOnSample(resSample, dim, m, ksub, iters)
    val bcCoarse = spark.sparkContext.broadcast(coarse)
    val bcPq = spark.sparkContext.broadcast(pq)

    // (id, list, codes) in ONE fused corpus pass: coarse-assign,
    // residual, and residual-encode per row, nothing materialized
    val codes = corpus
      .select(col(corpusId).cast("long"), col(corpusVec))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val csr = bcCoarse.value
        val cb = bcPq.value
        rows.collect {
          case (id, v) if v != null =>
            require(v.length == dim,
              s"row $id vector has dimension ${v.length}, expected $dim")
            val li = nearest(v, csr)
            val c = csr(li)
            val r = new Array[Float](dim)
            var i = 0
            while (i < dim) { r(i) = (v(i).toDouble - c(i)).toFloat; i += 1 }
            val codesArr = new Array[Int](m)
            var s = 0
            while (s < m) { codesArr(s) = subNearest(r, s, cb); s += 1 }
            (id, li, codesArr)
        }
      }

    // driver-built lookup tables (all tiny):
    //   n2(s)(c)        = |cb(s)(c)|²
    //   cross(l)(s)(c)  = c_list(l)_sub(s) · cb(s)(c)
    //   cNorm2(l)       = |c_list(l)|²
    // sized by coarse.length, NOT nlist — trainCoarse returns fewer
    // centroids than requested on small corpora
    val n2 = codebookNorm2(pq)
    val cross: Array[Array[Array[Double]]] =
      Array.tabulate(coarse.length, m, ksub) { (l, s, c) =>
        var d = 0.0
        var j = 0
        while (j < subDim) { d += coarse(l)(s * subDim + j) * pq(s)(c)(j); j += 1 }
        d
      }
    val cNorm2: Array[Double] = coarse.map { c =>
      var n = 0.0
      var i = 0
      while (i < c.length) { n += c(i) * c(i); i += 1 }
      n
    }

    // per query: norm, nprobe lists, q·c_list per probed list, and the
    // residual LUT q_sub·cb(s)(c) — ONE collect builds everything
    val qRaw: Array[(Long, Array[Float], Double)] = queries
      .select(col(queryId).cast("long"), col(queryVec))
      .as[(Long, Array[Float])]
      .collect()
      .map { case (id, v) =>
        require(v != null && v.length == dim,
          s"query $id vector has dimension " +
            s"${if (v == null) "null" else v.length}, expected $dim")
        var n = 0.0
        var i = 0
        while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
        (id, v, math.sqrt(n))
      }
    val qProbe: Array[(Long, Double, Array[Int], Array[Double],
      Array[Array[Double]])] = qRaw.map { case (id, v, norm) =>
      val probes = coarse.indices
        .sortBy(l => (dist2(v, coarse(l)), l))
        .take(nprobe).toArray
      val qc = coarse.map { c =>
        var d = 0.0
        var i = 0
        while (i < c.length) { d += v(i).toDouble * c(i); i += 1 }
        d
      }
      (id, norm, probes, qc, queryLut(v, pq))
    }
    val byList: Map[Int, Array[Int]] = qProbe.zipWithIndex
      .flatMap { case ((_, _, ps, _, _), qi) => ps.map(_ -> qi) }
      .groupBy(_._1)
      .map { case (l, xs) => l -> xs.map(_._2) }
    val bcQ = spark.sparkContext.broadcast(qProbe)
    val bcIdx = spark.sparkContext.broadcast(byList)
    val bcN2 = spark.sparkContext.broadcast(n2)
    val bcCross = spark.sparkContext.broadcast(cross)
    val bcCN = spark.sparkContext.broadcast(cNorm2)

    val partials = codes
      .mapPartitions { rows =>
        val qs = bcQ.value
        val idx = bcIdx.value
        val nn2 = bcN2.value
        val cx = bcCross.value
        val cn = bcCN.value
        implicit val worstFirst: Ordering[(Double, Long)] =
          Ordering.fromLessThan { (a, b) =>
            a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)
          }
        val heaps = scala.collection.mutable.HashMap
          .empty[Int, scala.collection.mutable.PriorityQueue[(Double, Long)]]
        rows.foreach { case (cid, li, cs) =>
          val qis = idx.getOrElse(li, null)
          if (qis != null) {
            // reconstructed norm² of this row — query-independent
            var vn = cn(li)
            var s = 0
            while (s < m) {
              vn += 2.0 * cx(li)(s)(cs(s)) + nn2(s)(cs(s))
              s += 1
            }
            val vNorm = math.sqrt(math.max(vn, 0.0))
            qis.foreach { qi =>
              val (qid, qNorm, _, qc, lut) = qs(qi)
              if (qid != cid) {
                var d = qc(li)
                var t = 0
                while (t < m) { d += lut(t)(cs(t)); t += 1 }
                val denom = vNorm * qNorm
                val score = if (denom == 0.0) 0.0 else d / denom
                val h = heaps.getOrElseUpdate(qi,
                  scala.collection.mutable.PriorityQueue
                    .empty[(Double, Long)](worstFirst.reverse))
                if (h.size < shortK) h.enqueue((score, cid))
                else if (worstFirst.gt((score, cid), h.head)) {
                  h.dequeue(); h.enqueue((score, cid))
                }
              }
            }
          }
        }
        heaps.iterator.flatMap { case (qi, h) =>
          h.iterator.map { case (_, cid) => (bcQ.value(qi)._1, cid) }
        }
      }
      .toDF("query_id", "neighbor_id")

    rerankExact(partials.dropDuplicates("query_id", "neighbor_id"),
      corpus, corpusId, corpusVec, qRaw, k)
  }

  /** Symmetric int8 quantization of a float vector — the standard 4×
    * memory reduction for large ANN corpora: per-vector
    * `scale = max|v|/127`, `q_i = clip(floor(v_i/scale + 0.5), ±127)`.
    * `floor(x+0.5)` rather than `round` so Spark and DuckDB agree at
    * .5 boundaries (their `round` tie-break modes differ); every step
    * is IEEE-double-exact, so quantization is oracle-checkable.
    *
    * Returns (scale, weighted checksum Σ q_i·(i+1), min q, max q) —
    * the checksum is position-weighted so any reordering or off-by-one
    * breaks the hash compare.
    */
  val quantizeI8Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (a: scala.collection.Seq[Float]) =>
      val v = floats(a)
      var amax = 0.0
      var i = 0
      while (i < v.length) {
        val x = math.abs(v(i).toDouble)
        if (x > amax) amax = x
        i += 1
      }
      val scale = amax / 127.0
      var qsum = 0L
      var qmin = 0
      var qmax = 0
      i = 0
      while (i < v.length) {
        val q =
          if (scale == 0.0) 0
          else {
            val r = math.floor(v(i).toDouble / scale + 0.5).toInt
            math.max(-127, math.min(127, r))
          }
        qsum += q.toLong * (i + 1)
        if (q < qmin) qmin = q
        if (q > qmax) qmax = q
        i += 1
      }
      (scale, qsum, qmin, qmax)
    }

  /** Deterministic random hyperplanes for LSH bucketing. */
  private def hyperplanes(dim: Int, planes: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection bucket id (0 .. 2^planes-1) for a vector:
    * bit i = sign(v · h_i). Vectors in the same bucket are likely
    * cosine-close; with `planes` small the corpus shards into 2^planes
    * partitions that can be searched independently.
    *
    * One closure UDF computes all `planes` projections in a single pass
    * over the vector (the hyperplane matrix is captured driver-side and
    * ships with the task closure). The expression form — `planes`
    * interpreted `aggregate` folds per row — was the dominant cost of
    * the ANN query at sf0.1; the loop keeps the identical index-order
    * accumulation, so bucket assignments are unchanged.
    */
  def lshBucket(vec: Column, dim: Int, planes: Int = 8,
      seed: Long = 42L): Column = {
    val hs: Array[Array[Double]] =
      hyperplanes(dim, planes, seed).map(_.toArray).toArray
    val f = udf { (a: scala.collection.Seq[Float]) =>
      val xa = floats(a)
      var bucket = 0L
      var p = 0
      while (p < hs.length) {
        val h = hs(p)
        var d = 0.0
        var i = 0
        val n = math.min(xa.length, h.length)
        while (i < n) { d += xa(i).toDouble * h(i); i += 1 }
        if (d >= 0) bucket |= (1L << p)
        p += 1
      }
      bucket
    }
    f(vec)
  }

  /** ANN top-k: candidates restricted to the query's LSH bucket (plus all
    * hamming-1 neighbor buckets — multi-probe, which multiplies recall at
    * the cost of `planes` extra probe rows per QUERY, not per corpus row),
    * ranked by exact cosine within the probed buckets. Recall < 1 by
    * construction (asserted against the exact baseline in SimilaritySpec).
    *
    * Id contract: like [[bruteForceTopK]], ids are cast to long for the
    * primitive kernel — numeric ids only (string-keyed corpora should
    * carry a surrogate long, standard practice for vector indexes).
    */
  def annTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      dim: Int,
      k: Int,
      planes: Int = 8,
      seed: Long = 42L,
      multiProbe: Boolean = true
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    // queries are the broadcastable side by contract (same as the
    // brute-force path): collect, normalize, hash, and index by every
    // bucket they probe (own bucket + hamming-1 neighbors)
    val hs: Array[Array[Double]] =
      hyperplanes(dim, planes, seed).map(_.toArray).toArray
    def planeDots(v: Array[Float]): Array[Double] =
      hs.map { h =>
        var d = 0.0
        var i = 0
        val n = math.min(v.length, h.length)
        while (i < n) { d += v(i).toDouble * h(i); i += 1 }
        d
      }
    def bucketFromDots(dots: Array[Double]): Long = {
      var bucket = 0L
      var p = 0
      while (p < dots.length) {
        if (dots(p) >= 0) bucket |= (1L << p)
        p += 1
      }
      bucket
    }
    def bucketOf(v: Array[Float]): Long = bucketFromDots(planeDots(v))
    val qData: Array[(Long, Array[Float], Double, Long)] = queries
      .select(col(queryId).cast("long"), col(queryVec))
      .as[(Long, Array[Float])]
      .collect()
      .map { case (id, v) =>
        var n = 0.0
        var i = 0
        while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
        (id, v, math.sqrt(n), bucketOf(v))
      }
    // Query-directed multi-probe (Lv et al., VLDB 2007): beyond the own
    // bucket and every single-plane flip, also probe pair-flips of the
    // LEAST-CONFIDENT planes (smallest |dot| — the boundaries this query
    // sits closest to, where its true neighbors most likely fell on the
    // other side). All probe cost is per QUERY (more buckets in the
    // broadcast index); the corpus-side pass still hashes each row once.
    val qDots: Array[Array[Double]] = qData.map(q => planeDots(q._2))
    def probeMasksFor(qi: Int): Array[Long] =
      if (!multiProbe) Array(0L)
      else {
        val singles = Array.tabulate(planes)(i => 1L << i)
        val closest = qDots(qi).zipWithIndex
          .sortBy { case (d, i) => (math.abs(d), i) }
          .take(math.min(4, planes))
          .map(_._2)
        val pairs = for {
          a <- closest.indices.iterator
          b <- (a + 1) until closest.length
        } yield (1L << closest(a)) | (1L << closest(b))
        (0L +: singles) ++ pairs.toArray
      }
    // bucket → dense query index list; ~2^planes entries, each query in
    // `probes` lists — tiny next to the corpus. Distinct masks per query
    // keep the one-meeting-per-pair guarantee (no dedup stage needed).
    val byBucket: Map[Long, Array[Int]] = qData.zipWithIndex
      .flatMap { case ((_, _, _, b0), qi) =>
        probeMasksFor(qi).map(m => (b0 ^ m) -> qi)
      }
      .groupBy(_._1)
      .map { case (b, xs) => b -> xs.map(_._2) }
    val bcQ = spark.sparkContext.broadcast(qData)
    val bcIdx = spark.sparkContext.broadcast(byBucket)

    // ONE streaming pass over the corpus, zero shuffled candidates: per
    // row, hash to its (single) bucket, score only the queries probing
    // that bucket with a primitive dot, feed per-(partition, query)
    // bounded heaps — the brute-force kernel restricted by the index.
    // A (query, neighbor) pair can only meet once (one bucket per row,
    // distinct probe masks), so no dedup stage is needed.
    val partials = corpus
      .select(col(corpusId).cast("long"), col(corpusVec))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val qs = bcQ.value
        val idx = bcIdx.value
        implicit val worstFirst: Ordering[(Double, Long)] =
          Ordering.fromLessThan { (a, b) =>
            a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)
          }
        val heaps = scala.collection.mutable.HashMap
          .empty[Int, scala.collection.mutable.PriorityQueue[(Double, Long)]]
        rows.foreach { case (cid, cv) =>
          var cn = 0.0
          var i = 0
          while (i < cv.length) {
            cn += cv(i).toDouble * cv(i).toDouble; i += 1
          }
          val cNorm = math.sqrt(cn)
          idx.getOrElse(bucketOf(cv), Array.empty[Int]).foreach { qi =>
            val (qid, qv, qNorm, _) = qs(qi)
            if (qid != cid) {
              var d = 0.0
              var j = 0
              val n = math.min(cv.length, qv.length)
              while (j < n) { d += cv(j).toDouble * qv(j).toDouble; j += 1 }
              val denom = cNorm * qNorm
              val cos = if (denom == 0.0) 0.0 else d / denom
              val h = heaps.getOrElseUpdate(qi,
                scala.collection.mutable.PriorityQueue
                  .empty[(Double, Long)](worstFirst.reverse))
              if (h.size < k) h.enqueue((cos, cid))
              else if (worstFirst.gt((cos, cid), h.head)) {
                h.dequeue(); h.enqueue((cos, cid))
              }
            }
          }
        }
        heaps.iterator.flatMap { case (qi, h) =>
          val qid = bcQ.value(qi)._1
          h.iterator.map { case (cos, cid) => (qid, cid, cos) }
        }
      }
      .toDF("query_id", "neighbor_id", "cosine")
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    partials
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }
}
