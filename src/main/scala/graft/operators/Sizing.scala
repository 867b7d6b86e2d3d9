package graft.operators

import org.apache.spark.sql.SparkSession

/** Data-derived shuffle sizing for iterative operators.
  *
  * An iterative loop (connected components, prefix doubling, Bellman-
  * Ford) issues many shuffles whose frames are a few longs per input
  * row. Running them at the session's `spark.sql.shuffle.partitions` —
  * sized for corpus-wide scans — makes every round pay scheduling for
  * partitions that carry almost nothing when the loop's input is small
  * (measured: a 1.3k-edge CC cost 4.2s at 32 partitions, 1.3s sized
  * from the data), while a fixed small constant would serialize the
  * rounds at corpus scale. Deriving the count from the loop's own row
  * count keeps both regimes honest (optimization guide §2.2: fewer,
  * larger partitions; scale-adaptive, never a local-mode constant).
  */
private[graft] object Sizing {

  /** Partition count for ~1M-row (≈50 MB with payload) loop frames,
    * floor 1, capped at 65k (a loop that really needs more partitions
    * is mis-designed upstream).
    */
  def loopPartitions(nRows: Long): Int =
    math.max(1L, math.min(nRows / 1000000L + 1L, 65536L)).toInt

  /** Run `f` with `spark.sql.shuffle.partitions` = `parts`, restoring
    * the previous session value after. AQE stays on throughout — this
    * sets the non-adaptive floor and lets loop joins zip with frames
    * persisted at the same count.
    *
    * CONCURRENCY CONTRACT (ADVICE r10): this mutates the SHARED session
    * conf — two sized loops interleaving on one SparkSession would
    * restore stale values, and a lazy frame built inside `f` but
    * EXECUTED after the restore runs at the session count (the loops
    * here avoid that by materializing eagerly — every round is a
    * localCheckpoint/zipWithIndex action inside the block). All current
    * callers (Bench, Verify, Profile, the query registry, tests) drive
    * one query at a time per session; a caller that overlaps queries on
    * one session must run sized loops on `spark.newSession()` instead.
    */
  def withShufflePartitions[T](spark: SparkSession, parts: Int)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try f
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
