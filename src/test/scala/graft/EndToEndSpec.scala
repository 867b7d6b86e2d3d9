package graft

import org.apache.spark.sql.functions._

import graft.queries.EndToEndQueries

/** Invariants of the q195 composed curation pipeline that the DuckDB
  * hash gate can't express as clearly: funnel monotonicity, handoff
  * integrity (every output row is an input doc that survived each
  * stage's contract), and layout laws (packed offsets form an exact
  * prefix sum; shards are a permutation with bounded size).
  */
class EndToEndSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val out = EndToEndQueries.qCurationE2e(spark, sf)
    .localCheckpoint(true)

  test("q195 emits a non-empty manifest of admitted documents") {
    assert(out.count() > 0)
    // one row per doc — the pack⋈shard join must never duplicate
    assert(out.select("doc_id").distinct().count() === out.count())
  }

  test("packed offsets are the exact prefix sum of weights in pack order") {
    // tok_offset sorted ascending must step by exactly n_toks + 1 (the
    // EOS) of the preceding doc — the two-pass distributed prefix sum's
    // defining law, checked end-to-end through the composition
    val rows = out.select("tok_offset", "n_toks")
      .orderBy("tok_offset").collect()
    var expected = 0L
    rows.foreach { r =>
      assert(r.getLong(0) === expected,
        s"offset gap: got ${r.getLong(0)}, expected $expected")
      expected = r.getLong(0) + r.getLong(1) + 1L
    }
  }

  test("seq span covers the doc's tokens at 2048 and shards are full") {
    val bad = out.filter(
      col("seq_start") =!= expr("tok_offset div 2048") ||
        col("seq_end") =!= expr("(tok_offset + n_toks) div 2048") ||
        col("n_seqs") =!= col("seq_end") - col("seq_start") + 1)
    assert(bad.count() === 0)
    // pos_in_shard in [0, 128); every shard below the last is full
    assert(out.filter(col("pos_in_shard") < 0 ||
      col("pos_in_shard") >= 128).count() === 0)
    val n = out.count()
    val full = out.groupBy("shard").count()
      .filter(col("shard") < (n - 1) / 128 && col("count") =!= 128)
    assert(full.count() === 0, "a non-final shard is not full")
  }

  test("no benchmark-contaminated doc survives to the manifest") {
    // every original doc with doc_id % 97 == 0 seeds the benchmark with
    // a 60% prefix of itself, so itself (and its +1M near-dup copy,
    // which contains the full original text) must be filtered out
    val dirty = out.filter(col("doc_id") % 97 === 0 ||
      (col("doc_id") >= 1000000L && (col("doc_id") - 1000000L) % 97 === 0))
    assert(dirty.count() === 0)
  }
}
