package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpecBase {
  import spark.implicits._

  /** Single-machine reference: sort by (md5(seed:id), id), walk the
    * stream carrying an offset — the definition the distributed
    * prefix-sum must reproduce exactly.
    */
  private def reference(
      rows: Seq[(Long, Long)], seed: String, seqLen: Long, eos: Long)
      : Map[Long, (Long, Long, Long, Long)] = {
    def k(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$id".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    var off = 0L
    rows.sortBy { case (id, _) => (k(id), id) }.map { case (id, n) =>
      val w = math.max(n, 0L) + eos
      val s = off / seqLen
      val e = if (w > 0) (off + w - 1) / seqLen else s
      val nSeqs = if (w > 0) e - s + 1 else 0L
      val out = id -> (off, s, e, nSeqs)
      off += w
      out
    }.toMap
  }

  test("distributed offsets match the single-machine walk across partitions") {
    // 500 docs, skewed token counts (some >> seqLen so spans cross
    // many sequences), forced through 7 range partitions
    val rows = (1L to 500L).map(id => (id, (id * 37) % 900))
    val df = rows.toDF("id", "n_tok").repartition(7)
    val got = Packing.packSequences(df, "id", "n_tok", 256L, "s1")
      .select("id", "tok_offset", "seq_start", "seq_end", "n_seqs")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got === reference(rows, "s1", 256L, 1L))
  }

  test("token conservation: last doc's offset + width == total stream") {
    val rows = (1L to 100L).map(id => (id, id % 50))
    val df = rows.toDF("id", "n_tok")
    val packed = Packing.packSequences(df, "id", "n_tok", 64L, "s2")
    val total = rows.map(_._2 + 1).sum
    val maxEnd = packed
      .agg(max(col("tok_offset") +
        greatest(col("n_tok"), lit(0L)) + 1L)).as[Long].head()
    assert(maxEnd === total)
    // offsets are all distinct (a prefix sum over positive widths)
    assert(packed.select("tok_offset").distinct().count() === 100L)
  }

  test("zero-width docs (0 tokens, eos=0) occupy no sequence; null counts as 0") {
    val df = Seq(
      (1L, Some(10L)), (2L, Some(0L)), (3L, None), (4L, Some(5L)))
      .toDF("id", "n_tok")
    val got = Packing.packSequences(df, "id", "n_tok", 8L, "s3", eosTokens = 0L)
      .select("id", "n_tok", "n_seqs", "seq_start", "seq_end")
      .as[(Long, Option[Long], Long, Long, Long)].collect()
      .map(r => r._1 -> (r._3, r._4, r._5)).toMap
    assert(got(2L)._1 === 0L)
    assert(got(3L)._1 === 0L)
    assert(got(2L)._2 === got(2L)._3) // seq_end == seq_start by convention
    // real docs still span: 10 tokens over len-8 sequences from some
    // offset touch ceil arithmetic the reference pins above; here just
    // the width sanity
    assert(got(1L)._1 >= 2L)
    assert(got(4L)._1 >= 1L)
  }

  test("sequenceStats: doc counts and end-boundary counts roll up exactly") {
    // deterministic layout: ids 1..6, n_tok all 5, eos 1 → width 6,
    // seqLen 4 → stream of 36 tokens = 9 full sequences; every doc
    // spans 2 or 3 sequences except those aligned at a cut
    val df = (1L to 6L).map(id => (id, 5L)).toDF("id", "n_tok")
    val packed = Packing.packSequences(df, "id", "n_tok", 4L, "s4")
    val stats = Packing.sequenceStats(packed)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // conservation: every doc ends exactly once
    assert(stats.values.map(_._2).sum === 6L)
    // every span row is accounted: sum of n_docs == sum of n_seqs
    val totalSpans = packed.agg(sum("n_seqs")).as[Long].head()
    assert(stats.values.map(_._1).sum === totalSpans)
    // stream is 36 tokens → sequences 0..8 all touched
    assert(stats.keySet === (0L to 8L).toSet)
  }

  test("layout is a pure function of (corpus, seed): re-run identical, seed changes it") {
    val df = (1L to 50L).map(id => (id, id % 20)).toDF("id", "n_tok")
    def run(seed: String) =
      Packing.packSequences(df, "id", "n_tok", 32L, seed)
        .select("id", "tok_offset").as[(Long, Long)].collect().toMap
    assert(run("a") === run("a"))
    assert(run("a") !== run("b"))
  }
}
