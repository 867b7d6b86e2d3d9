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
