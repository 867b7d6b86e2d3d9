package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset manifest: per-group row counts, sizes, and an
  * order-independent content digest — the "data card" record a
  * training run pins so the exact corpus that produced a model can be
  * re-verified later (and two independently-produced copies can be
  * proven identical without comparing rows).
  *
  * The digest is `bit_xor` over per-row md5-60 hashes of "id:text".
  * XOR is commutative/associative and overflow-free, so the digest is
  * independent of row order, partitioning, and engine — any reshuffle
  * or re-partition of the same rows hashes identically, which a
  * positional or sum-with-overflow digest cannot promise. One
  * map-side-combinable aggregate; scales as a pure scan.
  */
object DataManifest {

  /** md5-60 of "id:text" (15 hex chars = 60 bits, exact in BIGINT) —
    * the cross-engine row-hash family the samplers already use.
    */
  def rowHash(idCol: Column, textCol: Column): Column =
    conv(substring(md5(concat(idCol.cast("string"), lit(":"),
      textCol)), 1, 15), 16, 10).cast("long")

  /** Per-`groupCol` manifest: (group, n_rows, n_chars, content_digest,
    * min_id, max_id).
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
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))
}
