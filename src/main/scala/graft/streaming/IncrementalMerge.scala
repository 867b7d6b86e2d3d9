package graft.streaming

import graft.operators.MergeOps
import graft.sinks.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental merge: a stream of upserts applied to a [[GraftTable]]
  * through foreachBatch — the Structured-Streaming form of the
  * reference's re-run-and-merge incremental model (SURVEY §2.9:
  * "Trigger.AvailableNow with checkpointing is the idiomatic
  * equivalent").
  *
  * Per micro-batch: last-wins dedup on the merge keys (A1 — required
  * because one batch may carry several versions of a row), then the
  * same merge semantics the batch pipeline uses. The checkpoint makes
  * re-runs resume where they stopped; merge idempotency makes replayed
  * batches harmless — together, exactly-once table contents.
  */
object IncrementalMerge {

  /** Drain all available input from `stream` into the table and stop
    * (AvailableNow). Returns the number of micro-batches applied.
    */
  def run(
      stream: DataFrame,
      table: GraftTable,
      spec: MergeOps.MergeSpec,
      checkpointDir: String,
      orderCol: Option[String] = None
  ): Long = {
    var batches = 0L
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ordered = orderCol match {
          case Some(c) => MergeOps.dedupLastWins(batch, spec.keys,
            Seq(col(c)))
          case None => MergeOps.dedupLastWins(
            // no caller-declared order: use the source file path (file
            // streams list files in order; lexicographic path = append
            // order for sequenced exports) with partition-local ids only
            // breaking ties WITHIN a file — never across files, where
            // split packing reorders partitions
            batch.withColumn("__file", input_file_name())
              .withColumn("__seq", monotonically_increasing_id()),
            spec.keys, Seq(col("__file"), col("__seq")))
            .drop("__file", "__seq")
        }
        table.merge(ordered)
        batches += 1
      }
      .start()
    q.awaitTermination()
    batches
  }
}
