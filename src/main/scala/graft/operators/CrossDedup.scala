package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-corpus deduplication: flag an INCOMING batch of documents
  * against a REFERENCE corpus — the standard guard before new crawl
  * snapshots, vendor drops, or refresh batches are admitted into a
  * training mix (the cross-snapshot half of the dedup regime whose
  * within-corpus half is the q38 pipeline).
  *
  * Two verdicts per incoming doc:
  *  - `is_exact`  — its text's md5 already exists in the reference
  *    corpus (content-hash join, the A2/S10 content-addressing idea
  *    applied across corpora);
  *  - `n_near`    — how many DISTINCT reference docs share at least
  *    one LSH band with it in the md5-minhash-8 family (q36's banding,
  *    so the signature convention — and its DuckDB oracle — is shared).
  *
  * Scale shape: the reference side collapses to two persistable
  * artifacts — a distinct content-hash table and the
  * [[NearDedup.md5BandTable]] band index (which
  * [[NearDedup.applyBandChanges]] maintains incrementally under
  * merges). An incoming batch of `b` docs then costs: one kernel pass
  * over `b` texts, one hash-key join, and one (band, bv)-keyed join
  * whose degree is bounded by bucket occupancy — the reference corpus
  * is never rescanned and nothing corpus-sized shuffles. At 100 TB the
  * reference index is built once and each daily batch pays only for
  * itself.
  */
object CrossDedup {

  /** The reference corpus's two persistable dedup artifacts:
    * (distinct content hashes as `__h`, band index as
    * (`__ref_id`, band, bv)). In production these are stored tables —
    * the hash table grows by admitted batches and the band index is
    * the one [[NearDedup.applyBandChanges]] maintains under merges.
    */
  def artifacts(
      reference: DataFrame,
      idCol: String,
      textCol: String): (DataFrame, DataFrame) = (
    reference.select(md5(col(textCol)).as("__h")).distinct(),
    NearDedup.md5BandTable(reference, idCol, textCol)
      .withColumnRenamed(idCol, "__ref_id"))

  /** [[flagAgainst]] with the reference side already reduced to its
    * artifacts — the form a stored/maintained index serves
    * ([[graft.streaming.StreamCrossDedup]] feeds updated artifacts per
    * micro-batch).
    */
  def flagAgainstArtifacts(
      refHashes: DataFrame,
      refBands: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val incBands = NearDedup.md5BandTable(incoming, idCol, textCol)
    val near = incBands
      .join(refBands, Seq("band", "bv"))
      .select(col(idCol), col("__ref_id"))
      .distinct()
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_near"))
    val exact = incoming
      .select(col(idCol), md5(col(textCol)).as("__h"))
      .join(refHashes, Seq("__h"), "left_semi")
      .select(col(idCol), lit(true).as("is_exact"))
    incoming
      .select(col(idCol))
      .join(exact, Seq(idCol), "left")
      .join(near, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("is_exact"), lit(false)).as("is_exact"),
        coalesce(col("n_near"), lit(0L)).as("n_near"))
      .withColumn("keep", !col("is_exact") && col("n_near") === 0L)
  }

  /** Flag `incoming` against `reference`. Output: one row per incoming
    * doc — (idCol, is_exact, n_near, keep) with
    * `keep = !is_exact AND n_near == 0`. Incoming docs are NOT checked
    * against each other (compose exact dedup upstream for that).
    */
  def flagAgainst(
      reference: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val (refHashes, refBands) = artifacts(reference, idCol, textCol)
    flagAgainstArtifacts(refHashes, refBands, incoming, idCol, textCol)
  }
}
