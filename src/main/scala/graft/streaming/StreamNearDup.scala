package graft.streaming

import graft.operators.NearDedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash near-duplicate detection: the always-on form of
  * the batch LSH pipeline (NearDedup.minHashCandidates) for
  * continuously-arriving corpora.
  *
  * Shape: the signature kernel and band hashing are the SAME code the
  * batch path uses (identical signature family ⇒ identical candidate
  * semantics); banding explodes each doc into `bands` (band, bandHash)
  * keys, and a stateful per-bucket operator
  * (`flatMapGroupsWithState`) keeps the doc ids seen in each bucket,
  * emitting a candidate pair the moment a new doc lands in a bucket
  * that already holds others. State per bucket is capped (hot-bucket
  * guard, same rationale as the batch SIMHASH cap — the batch MinHash
  * path is uncapped, so for buckets hotter than the cap the streamed
  * pair set is a graceful SUBSET of the batch one: overflow docs still
  * pair against the stored ids, but not against each other) and
  * evicted by event-time timeout `retention` after the bucket's newest
  * event — so state is bounded by (active buckets within the retention
  * horizon) × cap, not by the stream. Pairs only form within that
  * horizon; set `retention` to at least the watermark lateness or the
  * time spread your near-dups can arrive across. A pair that collides
  * in several bands is emitted once per band; downstream dedups by
  * pair key exactly as the batch path's `dropDuplicates` does.
  */
object StreamNearDup {

  final case class BandDoc(
      band: Int,
      bandHash: Long,
      doc_id: Long,
      ts: java.sql.Timestamp
  )
  final case class BucketState(ids: Seq[Long])
  final case class CandidatePair(id_a: Long, id_b: Long)

  /** Candidate pairs over a (possibly streaming) doc frame. For
    * streaming input, `docs` must already carry a watermark on
    * `timeCol`; batch input runs the identical plan with batch-mode
    * state semantics (all rows of a key in one group call).
    */
  def minHashPairsStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      timeCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      seed: Long = 42L,
      maxBucketSize: Int = 1000,
      retention: String = "1 hour"
  ): Dataset[CandidatePair] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = numHashes / bands
    val sigUdf = NearDedup.minHashSigUdf(numHashes, shingleSize, seed)

    val banded = docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(timeCol).as("ts"),
        sigUdf(col(textCol)).as("__sig"))
      .filter(col("__sig").isNotNull)
      .select(col("doc_id"), col("ts"),
        explode(NearDedup.bandStructs(col("__sig"), bands, rowsPerBand))
          .as("__b"))
      .select(col("__b.band").as("band"), col("__b.bandHash").as("bandHash"),
        col("doc_id"), col("ts"))
      .as[BandDoc]

    banded
      .groupByKey(d => (d.band, d.bandHash))
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (_, rows, state: GroupState[BucketState]) =>
        if (state.hasTimedOut) {
          // watermark passed this bucket's horizon: release its memory
          state.remove()
          Iterator.empty
        } else {
          val known = state.getOption.map(_.ids).getOrElse(Seq.empty)
          // deterministic order within the group call; Set membership +
          // buffer append keep the hot path O(1) per element (a Seq
          // contains/append was O(n²) toward the cap)
          val fresh = rows.toSeq.sortBy(d => (d.doc_id, d.ts.getTime))
          val out = Seq.newBuilder[CandidatePair]
          val ids = scala.collection.mutable.ArrayBuffer.from(known)
          val seen = scala.collection.mutable.HashSet.from(known)
          fresh.foreach { d =>
            if (!seen.contains(d.doc_id)) {
              ids.foreach { prev =>
                val (a, b) =
                  if (prev < d.doc_id) (prev, d.doc_id) else (d.doc_id, prev)
                out += CandidatePair(a, b)
              }
              if (ids.size < maxBucketSize) {
                ids += d.doc_id
                seen += d.doc_id
              }
            }
          }
          state.update(BucketState(ids.toSeq))
          // schedule eviction `retention` after this bucket's newest
          // event — the horizon within which pairs can still form
          if (fresh.nonEmpty) {
            val maxTs = fresh.map(_.ts.getTime).max
            // batch execution has no watermark/timeouts — ignore ONLY
            // that case; a streaming-mode failure (e.g. a timeout not
            // beyond the watermark) must propagate, or this bucket's
            // state would silently never evict
            try state.setTimeoutTimestamp(maxTs, retention)
            catch { case _: UnsupportedOperationException => () }
          }
          out.result().iterator
        }
      }
  }
}
