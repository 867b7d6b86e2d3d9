package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

/** PCA operator invariants: the properties any correct
  * eigendecomposition must satisfy, checked on the real embeddings
  * table and on a hand-built low-rank synthetic. (q131's driver gate is
  * hash-exact since r7 via the k=d norm-preservation identity; these
  * stay as the component-level pins.)
  */
class PcaSpec extends SparkSpecBase {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("k=d projection preserves centered norms (the q131 oracle identity)") {
    val m = Pca.fit(emb, "embedding", k = 64)
    val rows = Pca.transform(emb, "embedding", m)
      .select("embedding", "pca")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]](0)
      val p = r.getAs[scala.collection.Seq[Double]](1)
      val centered = v.zip(m.mean).map { case (x, mu) => x - mu }
      val n2 = centered.map(x => x * x).sum
      val pn2 = p.map(x => x * x).sum
      assert(math.abs(n2 - pn2) < 1e-9, s"norm drift: $n2 vs $pn2")
    }
  }

  test("components are orthonormal with descending non-negative variances") {
    val m = Pca.fit(emb, "embedding", k = 8)
    for (a <- m.components.indices; b <- m.components.indices) {
      val dot = m.components(a).zip(m.components(b)).map(p => p._1 * p._2).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"dot($a,$b)=$dot")
    }
    assert(m.variances.forall(_ >= -1e-9))
    assert(m.variances.sameElements(m.variances.sortBy(-_)))
  }

  test("projected variance per component equals its eigenvalue") {
    val m = Pca.fit(emb, "embedding", k = 4)
    val proj = Pca.transform(emb, "embedding", m).select("pca")
      .collect().map(_.getSeq[Double](0))
    val n = proj.length.toDouble
    for (c <- 0 until 4) {
      val xs = proj.map(_(c))
      val mean = xs.sum / n
      val varc = xs.map(x => (x - mean) * (x - mean)).sum / n
      assert(math.abs(varc - m.variances(c)) <
        1e-6 * math.max(1.0, m.variances(c)),
        s"component $c: $varc vs ${m.variances(c)}")
      // centering: projections have ~zero mean
      assert(math.abs(mean) < 1e-8)
    }
  }

  test("k=d projection reconstructs a low-dimensional synthetic exactly") {
    import spark.implicits._
    // rank-2 data in 4-d space
    val rows = (0 until 200).map { i =>
      val a = math.sin(i * 0.1); val b = math.cos(i * 0.37)
      (i.toLong, Array((a + 2 * b).toFloat, (2 * a - b).toFloat,
        (a + b).toFloat, (3 * b).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", k = 4)
    // rank 2: trailing two eigenvalues vanish
    assert(m.variances(2) < 1e-9 && m.variances(3) < 1e-9)
    // reconstruction through all components returns the original vector
    val proj = Pca.transform(df, "embedding", m)
      .select("vec_id", "embedding", "pca").collect()
    proj.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val p = r.getSeq[Double](2)
      val rec = Array.tabulate(4) { i =>
        m.mean(i) + m.components.indices.map(c =>
          p(c) * m.components(c)(i)).sum
      }
      v.indices.foreach(i => assert(math.abs(v(i) - rec(i)) < 1e-5))
    }
  }

  test("fit rejects ragged vectors and empty input") {
    import spark.implicits._
    val ragged = Seq((1L, Array(1f, 2f)), (2L, Array(1f, 2f, 3f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception](Pca.fit(ragged, "embedding", k = 1))
    assert(String.valueOf(e.getMessage).contains("dimension") ||
      e.getCause != null)
    intercept[IllegalArgumentException](
      Pca.fit(emb.limit(0), "embedding", k = 2))
  }
}
