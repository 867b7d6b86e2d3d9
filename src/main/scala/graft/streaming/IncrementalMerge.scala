package graft.streaming

import graft.operators.{IncrementalAgg, IndexStats, MergeOps}
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
  *
  * [[runWithAgg]] and [[runWithIndexStats]] additionally maintain a
  * derived table (a grouped aggregate / the per-term df index) from
  * each batch's change feed at O(changes per batch) — the streaming
  * forms of q84 and q105.
  */
object IncrementalMerge {

  private def dedupBatch(
      batch: DataFrame,
      spec: MergeOps.MergeSpec,
      orderCol: Option[String]
  ): DataFrame = orderCol match {
    case Some(c) => MergeOps.dedupLastWins(batch, spec.keys, Seq(col(c)))
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

  /** The drain skeleton every entry point shares: AvailableNow +
    * checkpoint, per-batch last-wins dedup, then `fold` (side effects
    * + merge ordering are the fold's contract — [[runWithAgg]] and
    * [[runWithIndexStats]] read the change feed BEFORE merging).
    * Returns the number of micro-batches applied.
    */
  private def drain(
      stream: DataFrame,
      spec: MergeOps.MergeSpec,
      checkpointDir: String,
      orderCol: Option[String]
  )(fold: DataFrame => Unit): Long = {
    var batches = 0L
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        fold(dedupBatch(batch, spec, orderCol))
        batches += 1
      }
      .start()
    q.awaitTermination()
    batches
  }

  /** Drain all available input from `stream` into the table and stop
    * (AvailableNow). Returns the number of micro-batches applied.
    */
  def run(
      stream: DataFrame,
      table: GraftTable,
      spec: MergeOps.MergeSpec,
      checkpointDir: String,
      orderCol: Option[String] = None
  ): Long =
    drain(stream, spec, checkpointDir, orderCol)(table.merge(_))

  /** [[run]] plus streaming incremental view maintenance: before each
    * micro-batch merges, its change feed against the CURRENT table
    * contents ([[MergeOps.changeFeed]]) folds into a per-`groupCol`
    * (count, sum of `valueCol`) aggregate ([[IncrementalAgg]]) — so
    * per-batch aggregate work is O(changes), never a rescan of the
    * table. Returns (micro-batches applied, maintained aggregate);
    * the aggregate is seeded from the table's pre-stream contents and
    * localCheckpointed per batch to keep lineage flat across many
    * micro-batches.
    */
  def runWithAgg(
      stream: DataFrame,
      table: GraftTable,
      spec: MergeOps.MergeSpec,
      checkpointDir: String,
      groupCol: String,
      valueCol: String,
      orderCol: Option[String] = None
  ): (Long, DataFrame) = {
    // seed from the table's pre-stream contents, or a zero aggregate
    // with the stream's schema — never null, even if the stream
    // delivers no micro-batches at all
    var agg: DataFrame =
      if (table.exists)
        IncrementalAgg.countSum(table.read(), groupCol, valueCol)
          .localCheckpoint(true)
      else IncrementalAgg.countSum(
        stream.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          stream.schema), groupCol, valueCol)
    val batches = drain(stream, spec, checkpointDir, orderCol) { ordered =>
      val current = if (table.exists) table.read() else ordered.limit(0)
      val changes = MergeOps.changeFeed(current, ordered, spec)
      agg = IncrementalAgg
        .applyChanges(agg, changes, groupCol, valueCol)
        .localCheckpoint(true)
      table.merge(ordered)
    }
    (batches, agg)
  }

  /** [[run]] plus streaming index-stats maintenance: the per-term
    * document-frequency table ([[IndexStats]]) is kept current across
    * micro-batches at O(changes per batch) cost — the streaming form
    * of q105, i.e. a live BM25/retrieval index whose stats never need
    * a corpus rescan while documents merge in. Seeded from the table's
    * pre-stream contents; localCheckpointed per batch to keep lineage
    * flat. Returns (micro-batches applied, maintained df table).
    */
  def runWithIndexStats(
      stream: DataFrame,
      table: GraftTable,
      spec: MergeOps.MergeSpec,
      checkpointDir: String,
      textCol: String,
      tokenizeLocal: String => Array[String],
      orderCol: Option[String] = None
  ): (Long, DataFrame) = {
    var df: DataFrame =
      if (table.exists)
        IndexStats.termDf(table.read(), textCol, tokenizeLocal)
          .localCheckpoint(true)
      else IndexStats.termDf(
        stream.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          stream.schema), textCol, tokenizeLocal)
    val batches = drain(stream, spec, checkpointDir, orderCol) { ordered =>
      val current = if (table.exists) table.read() else ordered.limit(0)
      val changes = MergeOps.changeFeed(current, ordered, spec)
      df = IndexStats
        .applyChanges(df, changes, textCol, tokenizeLocal)
        .localCheckpoint(true)
      table.merge(ordered)
    }
    (batches, df)
  }
}
