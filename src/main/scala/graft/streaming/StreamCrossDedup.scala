package graft.streaming

import graft.operators.{CrossDedup, NearDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming corpus admission control — the always-on form of the q135
  * cross-corpus dedup: an incoming document stream is flagged against
  * the corpus-so-far, and every ADMITTED document immediately joins
  * the reference artifacts, so later micro-batches dedup against
  * earlier admissions too (batch N sees the corpus as of batch N−1).
  *
  * State is exactly the two persistable artifacts of
  * [[CrossDedup.artifacts]] — a distinct content-hash table and the
  * md5-LSH band index — grown by each batch's admitted docs and
  * lineage-truncated per batch (localCheckpoint) so a long stream
  * never re-plans its history. In production both live as stored
  * tables (the band index is what [[NearDedup.applyBandChanges]]
  * maintains under merges); per-batch cost is the batch's own kernel
  * pass plus two keyed joins — the historical corpus is never
  * re-hashed.
  *
  * Intra-batch duplicates are NOT flagged against each other (same
  * contract as the batch operator — compose exact dedup upstream);
  * they are deduped before indexing so the artifacts stay minimal.
  */
object StreamCrossDedup {

  /** Drain `stream` (micro-batches of (idCol, textCol) rows) with
    * AvailableNow + checkpoint; `onBatch` receives each micro-batch's
    * flag frame (idCol, is_exact, n_near, keep). Returns (micro-batches
    * processed, final content-hash artifact, final band artifact) — a
    * restarted run MUST be seeded with the returned artifacts (via
    * [[runWithArtifacts]]) or it forgets earlier admissions; in
    * production they are the stored tables this operator maintains.
    */
  def run(
      stream: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String,
      checkpointDir: String)(
      onBatch: DataFrame => Unit): (Long, DataFrame, DataFrame) = {
    val (h0, b0) = CrossDedup.artifacts(reference, idCol, textCol)
    runWithArtifacts(stream, h0, b0, idCol, textCol, checkpointDir)(onBatch)
  }

  /** [[run]] seeded directly with stored artifacts (restart form). */
  def runWithArtifacts(
      stream: DataFrame,
      hashes0: DataFrame,
      bands0: DataFrame,
      idCol: String,
      textCol: String,
      checkpointDir: String)(
      onBatch: DataFrame => Unit): (Long, DataFrame, DataFrame) = {
    var refHashes = hashes0.localCheckpoint(true)
    var refBands = bands0.localCheckpoint(true)
    var batches = 0L
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val docs = batch.select(col(idCol), col(textCol))
          .localCheckpoint(true) // referenced by flags AND admission
        val flags = CrossDedup
          .flagAgainstArtifacts(refHashes, refBands, docs, idCol, textCol)
          .localCheckpoint(true) // evaluated for the sink AND admission
        onBatch(flags)
        val admitted = docs
          .join(flags.filter(col("keep")).select(col(idCol)), Seq(idCol))
          // intra-batch exact copies index once (first id wins)
          .withColumn("__h", md5(col(textCol)))
          .groupBy("__h")
          .agg(min(col(idCol)).as(idCol), first(col(textCol)).as(textCol))
        refHashes = refHashes
          .unionByName(admitted.select(col("__h")))
          .localCheckpoint(true)
        refBands = refBands
          .unionByName(NearDedup
            .md5BandTable(admitted.select(col(idCol), col(textCol)),
              idCol, textCol)
            .withColumnRenamed(idCol, "__ref_id"))
          .localCheckpoint(true)
        batches += 1
      }
      .start()
    q.awaitTermination()
    (batches, refHashes, refBands)
  }
}
