package graft

import graft.operators.NearDedup
import org.apache.spark.sql.functions._

class NearDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (3L, "the quick brown fox jumps over the lazy dog near the river shore"),
    (4L, "completely different content about spark catalyst optimizer rules"),
    (5L, "totally unrelated words forming another synthetic document here now")
  ).toDF("doc_id", "text")

  test("ngramJaccard: identical texts = 1.0, disjoint texts = 0.0") {
    val out = docs
      .as("a")
      .crossJoin(docs.as("b"))
      .select(
        col("a.doc_id").as("ida"),
        col("b.doc_id").as("idb"),
        NearDedup.ngramJaccard(col("a.text"), col("b.text")).as("j")
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(out((1L, 2L)) === 1.0)
    assert(out((1L, 4L)) === 0.0)
    assert(out((1L, 3L)) > 0.5 && out((1L, 3L)) < 1.0)
  }

  test("minHashCandidates finds exact and near dups, not unrelated docs") {
    val pairs = NearDedup
      .minHashCandidates(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(pairs((1L, 2L)) === 1.0) // identical → all signatures agree
    assert(pairs.contains((1L, 3L))) // near dup shares most shingles
    assert(!pairs.contains((1L, 4L)) || pairs((1L, 4L)) < 0.3)
    assert(!pairs.contains((4L, 5L)) || pairs((4L, 5L)) < 0.3)
  }

  test("minHashCandidates hot-bucket cap drops only oversized buckets") {
    import spark.implicits._
    // 12 identical docs = every band bucket has 12 members; two
    // unrelated near-dup docs stay in small buckets
    val corpus = ((1L to 12L).map(i => (i, "the same exact text body " +
      "repeated for the degenerate class")) ++ Seq(
      (100L, "completely different content about spark shuffles"),
      (101L, "completely different content about spark shuffle"))).toDF(
      "doc_id", "text")
    // capped at 8: the 12-member buckets die, the pair in small
    // buckets survives
    val capped = NearDedup
      .minHashCandidates(corpus, "doc_id", "text", maxBucketSize = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.forall { case (a, b) => a >= 100L && b >= 100L },
      s"degenerate-class pairs must be dropped, got $capped")
    assert(capped.contains((100L, 101L)))
    // default (0) stays uncapped: the full clique of the degenerate
    // class is present — 12·11/2 pairs plus the survivor pair
    val uncapped = NearDedup
      .minHashCandidates(corpus, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.size === 12 * 11 / 2 + 1)
  }

  test("star edges give the same components as clique candidates (q38 path)") {
    import spark.implicits._
    val input = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val sigs = graft.queries.TextQueries.md5Sigs(input)
    val nodes = Some(input.select(col("doc_id")))
    def labels(edges: org.apache.spark.sql.DataFrame) =
      graft.operators.GraphOps
        .connectedComponents(spark, edges, "id_a", "id_b", nodes = nodes)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaClique =
      labels(graft.queries.TextQueries.bandCandidates(sigs))
    val viaStar =
      labels(graft.queries.TextQueries.bandStarEdges(sigs))
    assert(viaStar === viaClique)
    assert(viaStar.nonEmpty)
  }

  test("minhash signature estimates jaccard within tolerance") {
    val est = NearDedup
      .minHashCandidates(docs, "doc_id", "text", numHashes = 128, bands = 32)
      .filter(col("id_a") === 1 && col("id_b") === 3)
      .head()
      .getDouble(2)
    val exact = docs
      .as("a")
      .crossJoin(docs.as("b"))
      .filter(col("a.doc_id") === 1 && col("b.doc_id") === 3)
      .select(NearDedup.ngramJaccard(col("a.text"), col("b.text")))
      .head()
      .getDouble(0)
    assert(math.abs(est - exact) < 0.25, s"est=$est exact=$exact")
  }

  test("simHash: identical texts collide, near dups are hamming-close") {
    val sh = docs
      .select(col("doc_id"), NearDedup.simHash(col("text")).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(sh(1L) === sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) < 16)
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(4L)) > 10)
  }

  test("simHashCandidates surfaces the duplicate pair") {
    // 16 tables of 4 bits guarantee recall for hamming ≤ 15 (pigeonhole);
    // the near-dup pair (1,3) sits under that bound per the test above
    val pairs = NearDedup
      .simHashCandidates(docs, "doc_id", "text", tables = 16,
        maxHamming = 15)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
  }
}
