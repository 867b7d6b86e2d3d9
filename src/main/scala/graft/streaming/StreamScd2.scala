package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming type-2 SCD maintenance — the always-on form of
  * [[graft.operators.Scd2]]: as an attribute's change stream arrives,
  * each version's validity interval CLOSES the moment the next change
  * for the key shows up, and the closed history row is emitted
  * immediately. A warehouse dimension then stays current continuously
  * instead of being rebuilt by a nightly batch window job.
  *
  * Output contract: Append mode can only emit finished facts, so this
  * operator emits CLOSED intervals (`[valid_from, valid_to)`, versions
  * 1..n−1); each key's open current version lives in the state store
  * until its next change closes it. Batch parity (proven in
  * StreamingSpec): the emitted set equals `Scd2.build(...)` filtered
  * to `is_current = false`, under sorted replay (per-key event time
  * non-decreasing across micro-batches — the file-source/backfill
  * case). Within a micro-batch rows sort by (ts, tie) exactly like
  * the batch window.
  *
  * State per key is O(1) — the current value, its start, and a version
  * counter — and the key population is the DIMENSION's entity count
  * (users, devices), not the event count, so no timeout eviction is
  * applied: evicting would forget the open version and mis-number
  * every later one.
  */
object StreamScd2 {

  final case class Chg(
      key: String,
      ts: java.sql.Timestamp,
      tie: Long,
      value: String
  )
  /** `value` may be null (a null attribute is a version too);
    * "no state yet" is `state.getOption == None`, never an encoded St. */
  final case class St(value: String, fromMicros: Long, version: Int)
  final case class Closed(
      key: String,
      value: String,
      valid_from: java.sql.Timestamp,
      valid_to: java.sql.Timestamp,
      version: Long
  )

  private def micros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + (t.getNanos / 1000) % 1000000L

  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Closed validity intervals over a (possibly streaming) change
    * frame. The key is stringified (composite keys: concat before
    * calling); the value column is stringified for the state encoder —
    * cast back downstream if needed.
    */
  def closedIntervals(
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String
  ): Dataset[Closed] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .select(col(keyCol).cast("string").as("key"), col(tsCol).as("ts"),
        col(tieCol).cast("long").as("tie"),
        col(valueCol).cast("string").as("value"))
      .as[Chg]
      .groupByKey(_.key)
      .flatMapGroupsWithState[St, Closed](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { (key, rows, state: GroupState[St]) =>
        // same total order as the batch window: (ts, tie)
        val sorted = rows.toSeq.sortBy(c => (micros(c.ts), c.tie))
        val out = Seq.newBuilder[Closed]
        var cur = state.getOption
        sorted.foreach { c =>
          val us = micros(c.ts)
          cur match {
            case None =>
              cur = Some(St(c.value, us, 1))
            case Some(st) if st.value != c.value =>
              // Scala != is null-safe (eq check before equals), so a
              // null→value or value→null transition lands here too
              out += Closed(key, st.value, fromMicros(st.fromMicros),
                fromMicros(us), st.version.toLong)
              cur = Some(St(c.value, us, st.version + 1))
            case Some(_) => // same value (incl. null == null): no change
          }
        }
        cur.foreach(state.update)
        out.result().iterator
      }
  }
}
