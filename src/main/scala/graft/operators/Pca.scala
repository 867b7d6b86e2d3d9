package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA over an embedding column — dimensionality reduction for the
  * similarity stack (compaction before ANN indexing / semantic dedup,
  * the faiss `PCAMatrix` slot).
  *
  * Scale shape: ONE pass over the corpus accumulating per-partition
  * (count, sum, upper-triangular second-moment) — d(d+1)/2 + d doubles
  * of accumulator per partition, ~17 KB at d=64 — tree-reduced to the
  * driver; the d×d eigenproblem is solved there with cyclic Jacobi
  * (deterministic, no LAPACK dependency). No shuffle of raw vectors at
  * any point; projection is a broadcast-model map. This is the faiss
  * discipline: train small on bounded state, apply distributed.
  */
object Pca {

  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]], // k rows, each length d
      variances: Array[Double] // descending eigenvalues
  )

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvectors-as-columns) unsorted.
    */
  private[graft] def jacobi(aIn: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = Array.tabulate(d, d)((i, j) => aIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          off = math.max(off, math.abs(a(p)(q)))
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Fit on `df(vecCol): array<float>`; all vectors must share one
    * dimension. `k` components, ordered by descending explained
    * variance; each component's sign is fixed so its largest-magnitude
    * entry is positive (deterministic orientation).
    */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val nonNull = df.filter(col(vecCol).isNotNull)
    val first = nonNull.select(size(col(vecCol))).limit(1).collect()
    require(first.nonEmpty, "PCA fit on an empty frame (or all-null vectors)")
    val d = first(0).getInt(0)
    require(k >= 1 && k <= d, s"k out of range: $k (d=$d)")
    val vecs = nonNull.select(col(vecCol)).rdd
      .map(_.getSeq[Float](0))
    val (n, sums, mom) = vecs
      .mapPartitions { it =>
        val s = new Array[Double](d)
        val m = Array.ofDim[Double](d, d)
        var cnt = 0L
        it.foreach { v =>
          require(v.length == d,
            s"vector dimension ${v.length} != $d")
          cnt += 1
          var i = 0
          while (i < d) {
            val vi = v(i).toDouble
            s(i) += vi
            var j = i
            while (j < d) { m(i)(j) += vi * v(j); j += 1 }
            i += 1
          }
        }
        Iterator.single((cnt, s, m))
      }
      .treeReduce { (x, y) =>
        val (n1, s1, m1) = x; val (n2, s2, m2) = y
        var i = 0
        while (i < d) {
          s1(i) += s2(i)
          var j = i
          while (j < d) { m1(i)(j) += m2(i)(j); j += 1 }
          i += 1
        }
        (n1 + n2, s1, m1)
      }
    require(n > 1, s"PCA needs at least 2 rows, got $n")
    val mean = sums.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = mom(i)(j) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobi(cov)
    val order = (0 until d).sortBy(c => (-evals(c), c))
    val top = order.take(k)
    val components = top.map { c =>
      val comp = Array.tabulate(d)(r => evecs(r)(c))
      val mx = comp.maxBy(math.abs)
      if (mx < 0) comp.map(-_) else comp
    }.toArray
    PcaModel(mean, components, top.map(c => evals(c)).toArray)
  }

  /** Project `vecCol` onto the model's components: appends
    * `outCol: array<double>` of length k. Broadcast-model map — no
    * shuffle.
    */
  def transform(
      df: DataFrame,
      vecCol: String,
      model: PcaModel,
      outCol: String = "pca"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val proj = udf { (v: Seq[Float]) =>
      if (v == null) null // null vector → null projection, like builtins
      else {
        val m = bc.value
        val d = m.mean.length
        require(v.length == d, s"vector dimension ${v.length} != $d")
        Array.tabulate(m.components.length) { c =>
          val comp = m.components(c)
          var s = 0.0
          var i = 0
          while (i < d) { s += (v(i) - m.mean(i)) * comp(i); i += 1 }
          s
        }
      }
    }
    df.withColumn(outCol, proj(col(vecCol)))
  }
}
