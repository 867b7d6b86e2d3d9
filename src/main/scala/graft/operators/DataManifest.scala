package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset manifest: per-group row counts, sizes, and an
  * order-independent content digest — the "data card" record a
  * training run pins so the exact corpus that produced a model can be
  * re-verified later (and two independently-produced copies can be
  * proven identical without comparing rows).
  *
  * Two complementary order-independent digests over per-row md5-60
  * hashes of "id:text":
  *   - `content_digest` — `bit_xor` of the hashes. Commutative,
  *     associative, overflow-free; independent of row order,
  *     partitioning, and engine. Its one blind spot: a row present an
  *     EVEN number of times cancels itself out.
  *   - `content_sum` — Σ hashes mod 2⁶¹−1 (decimal-summed, so no
  *     pre-mod overflow at any row count; the same value in DuckDB's
  *     HUGEINT arithmetic). Multiplicity-sensitive, which closes the
  *     xor cancellation gap — two corpora differing only by
  *     duplicated rows match on xor but not on the sum.
  * Matching (n_rows, n_chars, content_digest, content_sum) is what
  * "identical" means here. One map-side-combinable aggregate; scales
  * as a pure scan.
  */
object DataManifest {

  /** md5-60 of "id:text" (15 hex chars = 60 bits, exact in BIGINT) —
    * the cross-engine row-hash family the samplers already use.
    */
  def rowHash(idCol: Column, textCol: Column): Column =
    conv(substring(md5(concat(idCol.cast("string"), lit(":"),
      textCol)), 1, 15), 16, 10).cast("long")

  /** 2⁶¹−1 (a Mersenne prime): the modulus of [[manifest]]'s
    * multiplicity-sensitive sum digest.
    */
  val SumModulus: Long = 2305843009213693951L

  /** Incremental manifest maintenance — fold a merge's change feed
    * ([[MergeOps.changeFeed]] vocabulary) into an existing manifest at
    * O(changes) cost, exactly: every manifest field here is
    * GROUP-INVERTIBLE (counts and sums subtract, xor is its own
    * inverse, the modular sum subtracts mod 2⁶¹−1), so
    * incremental == full recompute bit-for-bit (q144's oracle proves
    * it). The extrema (min_id/max_id) are deliberately absent — a
    * deleted minimum is not recoverable without a rescan, which is
    * exactly the property that separates maintainable manifest fields
    * from non-maintainable ones.
    *
    * `base` must carry (groupCol, n_rows, n_chars, content_digest,
    * content_sum) — [[manifest]]'s output minus the extrema. Groups
    * whose rows all disappear drop out of the result, matching a full
    * recompute. At a daily 0.1%-churn merge over 100 TB the
    * re-manifest bill is O(changes) + one group-keyed join, and the
    * data card stays continuously verifiable.
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      groupCol: String,
      idCol: String,
      textCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val signed = changes.select(
      col(groupCol),
      when(col("_change_type").isin("insert", "update_postimage"), 1L)
        .otherwise(-1L).as("__sgn"),
      rowHash(col(idCol), col(textCol)).as("__h"),
      length(col(textCol)).cast("long").as("__len"))
    val delta = signed
      .groupBy(col(groupCol))
      .agg(
        sum(col("__sgn")).as("d_rows"),
        sum(col("__sgn") * col("__len")).as("d_chars"),
        // xor needs no sign: removing a row re-xors the same hash
        expr("bit_xor(__h)").as("d_xor"),
        sum(when(col("__sgn") === 1L, col("__h")).otherwise(-col("__h"))
          .cast(dec)).as("d_sum"))
    base
      .join(delta, Seq(groupCol), "full_outer")
      .select(
        col(groupCol),
        (coalesce(col("n_rows"), lit(0L))
          + coalesce(col("d_rows"), lit(0L))).as("n_rows"),
        (coalesce(col("n_chars"), lit(0L))
          + coalesce(col("d_chars"), lit(0L))).as("n_chars"),
        // x ^ 0 = x on both the no-change and new-group sides
        expr("coalesce(content_digest, bigint(0)) ^ coalesce(d_xor, bigint(0))")
          .as("content_digest"),
        // ((base + delta) mod p + p) mod p in decimal: delta may be
        // negative and larger than p; the double-mod normalizes into
        // [0, p) exactly as a recompute's non-negative sum would land
        (((coalesce(col("content_sum"), lit(0L)).cast(dec)
          + coalesce(col("d_sum"), lit(0L).cast(dec))) % SumModulus
          + SumModulus) % SumModulus).cast("long").as("content_sum"))
      .filter(col("n_rows") > 0L)
  }

  /** Per-`groupCol` manifest: (group, n_rows, n_chars, content_digest,
    * content_sum, min_id, max_id).
    */
  def manifest(
      docs: DataFrame,
      groupCol: String,
      idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(groupCol), col(idCol), col(textCol),
        rowHash(col(idCol), col(textCol)).as("__h"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        expr("bit_xor(__h)").as("content_digest"),
        // decimal(38,0) sum: exact up to ~10²⁰ rows of 60-bit hashes,
        // so the mod happens AFTER an overflow-free total — the same
        // headroom DuckDB's HUGEINT sum has
        (sum(col("__h").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          % SumModulus).cast("long").as("content_sum"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))
}
