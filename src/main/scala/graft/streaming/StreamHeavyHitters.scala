package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters by the SpaceSaving sketch: per-key frequency
  * tracking with HARD-bounded state, for streams whose key cardinality
  * makes an exact `groupBy.count` state unbounded (the classic
  * always-on frequency monitor over 100 TB/day of events).
  *
  * Shape: keys are sharded by hash so each shard's counters live in one
  * state cell (a key belongs to exactly ONE shard — no cross-shard
  * merge ambiguity), and each shard runs SpaceSaving with `capacity`
  * counters: a known key increments; an unknown key takes a free slot;
  * when full, the MINIMUM counter is evicted and the newcomer inherits
  * its count as overestimation error (`max_err`). Total state is
  * shards × capacity counters regardless of stream length or key
  * cardinality, and the classic guarantees hold per shard: est_count ∈
  * [true, true + max_err], and every key with true frequency >
  * n_shard/capacity is present. With capacity ≥ the shard's distinct
  * keys nothing ever evicts — counts are EXACT and order-independent,
  * which is the mode the oracle-checked batch query (q86) runs in.
  *
  * Each group call emits the shard's full counter snapshot stamped with
  * a monotone `seq`; streaming readers keep each shard's max-seq rows
  * (update-mode semantics), batch execution calls each group once so
  * the single emission IS the final answer. Eviction scans are O(capacity)
  * on the slot-full path — capacity is small by contract (a production
  * variant would keep a min-heap; the sketch's guarantees don't change).
  */
object StreamHeavyHitters {

  final case class ShardState(
      counters: Seq[(String, Long, Long)],
      seq: Long
  )
  final case class Hit(
      shard: Int,
      seq: Long,
      key: String,
      est_count: Long,
      max_err: Long
  )

  def spaceSaving(
      df: DataFrame,
      keyCol: String,
      shards: Int,
      capacity: Int
  ): Dataset[Hit] = {
    require(shards > 0 && capacity > 0, "shards and capacity must be > 0")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      pmod(xxhash64(col(keyCol)), lit(shards)).cast("int").as("shard"),
      col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull)
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ShardState, Hit](
        OutputMode.Update(),
        GroupStateTimeout.NoTimeout()
      ) { (shard, rows, state: GroupState[ShardState]) =>
        val st = state.getOption.getOrElse(ShardState(Seq.empty, 0L))
        val counters = scala.collection.mutable.LinkedHashMap
          .from(st.counters.map { case (k, c, e) => k -> ((c, e)) })
        rows.foreach { case (_, k) =>
          counters.get(k) match {
            case Some((c, e)) => counters(k) = (c + 1, e)
            case None if counters.size < capacity =>
              counters(k) = (1L, 0L)
            case None =>
              // evict the minimum counter (smallest key on ties, for
              // determinism); the newcomer inherits its count as error
              val (mk, (mc, _)) = counters.minBy {
                case (k2, (c2, _)) => (c2, k2)
              }
              counters.remove(mk)
              counters(k) = (mc + 1, mc)
          }
        }
        val seq = st.seq + 1
        state.update(
          ShardState(counters.iterator.map {
            case (k, (c, e)) => (k, c, e)
          }.toSeq, seq))
        counters.iterator.map { case (k, (c, e)) =>
          Hit(shard, seq, k, c, e)
        }
      }
  }
}
