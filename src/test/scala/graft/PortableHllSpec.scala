package graft

import graft.operators.PortableHll
import org.apache.spark.sql.functions._

class PortableHllSpec extends SparkSpecBase {
  import spark.implicits._

  /** md5-60 of a string — the repo's hash family, single-machine. */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    var hv = 0L
    var i = 0
    while (i < 7) { hv = (hv << 8) | (d(i) & 0xffL); i += 1 }
    (hv << 4) | ((d(7) & 0xf0L) >> 4)
  }

  test("register/rho match a single-machine bit walk, all edge ranks") {
    val p = 8
    val q = 60 - p
    val vals = (1 to 2000).map(i => h60(s"v$i")) ++
      // hand-built edges: rem == 0 (max rank), rem == 1 (rank q),
      // top bit of rem set (rank 1)
      Seq(5L << q, (3L << q) | 1L, (7L << q) | (1L << (q - 1)))
    val got = vals.toDF("h")
      .select(PortableHll.register(col("h"), p).as("reg"),
        PortableHll.rho(col("h"), p).as("r"))
      .as[(Long, Long)].collect()
    val want = vals.map { v =>
      val reg = v >>> q
      val rem = v & ((1L << q) - 1)
      val r = if (rem == 0) q + 1L
        else java.lang.Long.numberOfLeadingZeros(rem) - (64 - q) + 1L
      (reg, r)
    }
    assert(got.toSeq === want)
  }

  test("merge of split sketches exactly equals the sketch of the union") {
    val a = (1 to 3000).map(i => ("g" + i % 2, h60(s"a$i"))).toDF("g", "h")
    val b = (1 to 3000).map(i => ("g" + i % 2, h60(s"b$i"))).toDF("g", "h")
    val merged = PortableHll.merge(
      Seq(PortableHll.sketch(a, Seq("g"), col("h"), 8),
        PortableHll.sketch(b, Seq("g"), col("h"), 8)), Seq("g"))
      .as[(String, Long, Long)].collect().toSet
    val direct = PortableHll.sketch(a.unionByName(b), Seq("g"), col("h"), 8)
      .as[(String, Long, Long)].collect().toSet
    assert(merged === direct)
  }

  test("estimate lands within 3x the theoretical rsd of the exact count") {
    val p = 8
    val rsd = 1.04 / math.sqrt(1 << p) // ≈ 6.5%
    for (n <- Seq(50, 5000, 60000)) {
      // duplicate every value 3x: cardinality must not see multiplicity
      val df = (1 to n).flatMap(i => Seq.fill(3)(h60(s"x$i"))).toDF("h")
        .withColumn("g", lit("all"))
      val est = PortableHll.estimate(
        PortableHll.sketch(df, Seq("g"), col("h"), p), Seq("g"), p)
        .select("estimate").as[Double].head()
      assert(math.abs(est - n) / n <= 3 * rsd,
        s"n=$n est=$est err=${math.abs(est - n) / n}")
    }
  }

  test("overlap estimate recovers a known 50% intersection within rsd bounds") {
    val p = 8
    val rsd = 1.04 / math.sqrt(1 << p)
    // |A| = |B| = 8000, |A∩B| = 4000 (true Jaccard 1/3)
    val a = ((1 to 4000).map(i => h60(s"shared$i")) ++
      (1 to 4000).map(i => h60(s"onlyA$i"))).toDF("h")
    val b = ((1 to 4000).map(i => h60(s"shared$i")) ++
      (1 to 4000).map(i => h60(s"onlyB$i"))).toDF("h")
    val r = PortableHll.estimateOverlap(
      PortableHll.sketch(a, Nil, col("h"), p),
      PortableHll.sketch(b, Nil, col("h"), p), p).head()
    // inclusion-exclusion compounds three estimator errors: allow
    // 3 sketches x 3 rsd each on the intersection, 3 rsd on the sets
    assert(math.abs(r.getAs[Double]("est_a") - 8000) / 8000 <= 3 * rsd)
    assert(math.abs(r.getAs[Double]("est_b") - 8000) / 8000 <= 3 * rsd)
    assert(math.abs(r.getAs[Double]("est_union") - 12000) / 12000 <= 3 * rsd)
    assert(math.abs(r.getAs[Double]("est_intersection") - 4000) / 4000
      <= 9 * rsd)
    assert(r.getAs[Double]("jaccard_est") > 0.2 &&
      r.getAs[Double]("jaccard_est") < 0.5)
  }

  test("null hashes are ignored; register table never exceeds 2^p rows per group") {
    val df = ((1 to 500).map(i => Some(h60(i.toString))) :+
      (None: Option[Long])).toDF("h").withColumn("g", lit(1))
    val sk = PortableHll.sketch(df, Seq("g"), col("h"), 4)
    assert(sk.count() <= 16)
    assert(sk.filter(col("max_rho") < 1 || col("max_rho") > 57).count() === 0)
  }
}
