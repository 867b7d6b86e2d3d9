package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Joinable-column discovery over a lake's tables (the LSH-Ensemble /
  * data-catalog profiling problem): sketch every candidate column's VALUE
  * SET with k salted minhashes, then estimate pairwise value overlap from
  * matching minima — k tiny rows per column instead of pairwise distinct
  * joins across every column combination.
  *
  * The hash family is the Kirsch-Mitzenmacher two-hash construction over
  * ONE md5 digest per value: `h_i(v) = h1(v) + i · h2(v)` with h1 = the
  * digest's first 15 hex chars as a long (60 bits) and h2 = its next 8
  * hex chars mod 2³⁰ — one md5 call per row total (Catalyst's common-
  * subexpression elimination computes the digest once for both fields),
  * no overflow (h1 < 2⁶⁰, i·h2 < 2³⁵), and still SQL-expressible, so the
  * sketch — k MIN aggregates per column — and the whole match matrix are
  * ORACLE-EXACT integer results, not just error-bounded estimates.
  *
  * Scale shape: `min(hᵢ(v))` over a MULTISET equals the min over its set,
  * so no distinct/dedup shuffle exists at all — the sketch is one
  * map-side-partial aggregate pass over the raw scans (k MIN expressions
  * over two hash columns, ≤ |columns| rows shuffled); the pair stage joins
  * sketches on the salt index — |columns|²·k tiny rows worst case, never
  * any value data.
  */
object JoinDiscovery {

  /** Two base hashes from one md5 digest: chars [1,15] and [16,23]. */
  private def digest(value: Column): Column = md5(value.cast("string"))
  private def hexLong(d: Column, from: Int, len: Int): Column =
    conv(substring(d, from, len), 16, 10).cast("long")

  /** Sketch every (table, column) candidate and count matching minima per
    * column pair: `n_match / k` estimates the value-set Jaccard — the
    * join-discovery score. Output: (col_a, col_b, n_match), col_a < col_b.
    *
    * All candidates union into one hashed (name, h1, h2m) frame computed
    * MAP-SIDE — and because the min of a multiset is the min of its set,
    * there is NO distinct anywhere: the whole profile is one partially-
    * aggregated groupBy shuffling ≤ |columns| rows (the per-column-
    * pipeline form paid a distinct shuffle per column — 9 shuffles for
    * the q132 candidate set, measured 4× slower end to end).
    */
  def matchMatrix(
      spark: SparkSession,
      columns: Seq[(String, DataFrame, String)], // (name, table, column)
      k: Int = 32): DataFrame = {
    require(columns.nonEmpty, "no candidate columns")
    require(k >= 1 && k <= 256, s"k out of range: $k")
    val hashed = columns
      .map { case (name, df, c) =>
        // NO spread here (reverted in r11): one md5 per row is too
        // cheap to amortize the repartition it rode behind — idle-host
        // measurement 2.34s WITH vs 2.19s (r9) WITHOUT, and the extra
        // per-column exchange also serialized the MIN partial-agg
        // behind a shuffle boundary
        df.select(col(c).cast("string").as("v"))
          .filter(col("v").isNotNull)
          .select(lit(name).as("name"),
            hexLong(digest(col("v")), 1, 15).as("h1"),
            pmod(hexLong(digest(col("v")), 16, 8), lit(1073741824L))
              .as("h2m"))
      }
      .reduce(_ unionByName _)
    val sketches = hashed
      .groupBy("name")
      .agg(min(col("h1")).as("m0"),
        (1 until k).map(i =>
          min(col("h1") + lit(i.toLong) * col("h2m")).as(s"m$i")): _*)
      .select(col("name"),
        posexplode(array((0 until k).map(i => col(s"m$i")): _*))
          .as(Seq("salt", "mh")))
      .localCheckpoint(true) // |columns|·k rows; feeds both join sides
    sketches.as("a")
      .join(sketches.as("b"),
        col("a.salt") === col("b.salt") && col("a.name") < col("b.name"))
      .groupBy(col("a.name").as("col_a"), col("b.name").as("col_b"))
      .agg(sum(when(col("a.mh") === col("b.mh"), 1L).otherwise(0L))
        .as("n_match"))
  }
}
