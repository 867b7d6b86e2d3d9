package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable HyperLogLog: the register table of an HLL sketch built on
  * the repo's md5-60 hash family, so the sketch STATE — not just the
  * estimate — is a pure integer function of the input reproducible on
  * any engine (DuckDB recomputes it from `md5` + `bin`). This is the
  * sketch-family twin of the ANN exhaustive gates (q171/q172/q174/q175):
  * Spark's own `approx_count_distinct` (q72) keeps an engine-internal
  * xxhash64 sketch that can never be value-oracled, while this
  * operator's (register, max_rho) table hash-compares exactly — the
  * machinery (hashing, register split, rank extraction, max-merge) is
  * driver-verified, and only the float estimator stays spec-pinned.
  *
  * Layout of the 60-bit hash `h` (top p bits → register, low q=60-p
  * bits → rank): `rho = (leading zeros of the low q bits) + 1`,
  * computed as `q + 1 - bitlength(rem)` via `bin()` string length —
  * integer/string ops only, no log2.
  *
  * Scale shape: `groupBy(group, register).agg(max(rho))` has map-side
  * partial aggregation, so the shuffle carries at most
  * |groups| × 2^p rows no matter the corpus size — the fixed-memory
  * mergeable property that makes HLL the distinct-count of choice at
  * 100 TB. Merging sketches is the same max over unioned register
  * tables, and is EXACTLY equal to sketching the unioned input (an
  * algebraic identity of max — pinned in spec, not just approximately
  * true).
  *
  * Reference analog: the reference counts distincts exactly in memory
  * (etl/tasks count summaries); at corpus scale that becomes this
  * sketch.
  *
  * Streaming: [[sketch]] is select + groupBy + max — an algebraic
  * aggregate Structured Streaming maintains natively, so the same
  * call on a streaming frame (Complete/Update mode) is a live
  * distinct-count monitor with state hard-bounded at
  * |groups| × 2^p rows (StreamingSpec pins streamed == batch across
  * micro-batches).
  */
object PortableHll {

  /** Register index (top p bits) of a non-negative 60-bit hash.
    * Bit shift, not `/`: Column division is DOUBLE division, and a
    * 60-bit value does not survive a 53-bit mantissa round-trip.
    */
  def register(h: Column, p: Int): Column = {
    require(p >= 4 && p <= 16, s"p=$p out of [4,16]")
    shiftright(h.cast("long"), 60 - p)
  }

  /** Rank rho = leading zeros of the low (60-p) bits, + 1. */
  def rho(h: Column, p: Int): Column = {
    require(p >= 4 && p <= 16, s"p=$p out of [4,16]")
    val q = 60 - p
    val rem = h % lit(1L << q)
    when(rem === 0L, lit((q + 1).toLong))
      .otherwise(lit((q + 1).toLong) - length(bin(rem)))
  }

  /** The sketch: one row per (groupCols, register) with the max rank
    * observed. `hashCol` must be the md5-60 family (non-negative,
    * < 2^60); rows with null hash are ignored.
    */
  def sketch(
      df: DataFrame,
      groupCols: Seq[String],
      hashCol: Column,
      p: Int): DataFrame =
    df.filter(hashCol.isNotNull)
      .select(groupCols.map(col) ++ Seq(
        register(hashCol, p).as("register"),
        rho(hashCol, p).as("r")): _*)
      .groupBy(groupCols.map(col) :+ col("register"): _*)
      .agg(max(col("r")).as("max_rho"))

  /** Merge sketches over the same p: max per register. Exactly equals
    * `sketch` of the concatenated inputs.
    */
  def merge(sketches: Seq[DataFrame], groupCols: Seq[String]): DataFrame =
    sketches.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col) :+ col("register"): _*)
      .agg(max(col("max_rho")).as("max_rho"))

  /** Pairwise overlap estimate between two sketches over the same p,
    * by inclusion–exclusion on the estimator: est(A∩B) = est(A) +
    * est(B) − est(A∪B), where the union sketch is the exact
    * [[merge]] — so the only approximation is the estimator itself
    * (each term carries the standard ~1.04/√m rsd; the intersection
    * difference compounds them, which is the known accuracy limit of
    * sketch intersection — fine for the "which sources duplicate each
    * other" corpus analysis this serves, wrong for exact joins).
    * Returns one row: (est_a, est_b, est_union, est_intersection,
    * jaccard_est). Float estimates → spec-pinned, not oracle-hashed;
    * the underlying register tables stay oracle-exact (q183/q184).
    */
  def estimateOverlap(
      sketchA: DataFrame,
      sketchB: DataFrame,
      p: Int): DataFrame = {
    def est(df: DataFrame, name: String): DataFrame =
      estimate(df.withColumn("__g", lit(1)), Seq("__g"), p)
        .select(col("estimate").as(name))
    val u = merge(Seq(sketchA, sketchB), Seq.empty)
    est(sketchA, "est_a")
      .crossJoin(broadcast(est(sketchB, "est_b")))
      .crossJoin(broadcast(est(u, "est_union")))
      .withColumn("est_intersection",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0.0)))
      .withColumn("jaccard_est",
        when(col("est_union") <= 0.0, lit(0.0))
          .otherwise(col("est_intersection") / col("est_union")))
  }

  /** HLL estimate per group from a register table (registers absent
    * from the table count as rho = 0). Harmonic-mean estimator with
    * the standard small-range linear-counting correction; doubles and
    * ln make this the spec-pinned half — the oracle gate lives on the
    * integer register table above.
    */
  def estimate(
      sketchDf: DataFrame,
      groupCols: Seq[String],
      p: Int): DataFrame = {
    val m = 1 << p
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    sketchDf
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(pow(lit(2.0), -col("max_rho"))).as("__sum"),
        count(lit(1)).as("__seen"))
      .withColumn("__zeros", lit(m.toLong) - col("__seen"))
      .withColumn("__raw",
        lit(alpha * m * m) / (col("__sum") + col("__zeros")))
      .withColumn("estimate",
        when(col("__raw") <= 2.5 * m && col("__zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("__zeros")))
          .otherwise(col("__raw")))
      .select(groupCols.map(col) :+ col("estimate"): _*)
  }
}
