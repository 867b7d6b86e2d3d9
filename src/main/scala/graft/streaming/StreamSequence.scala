package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming sequence-example building: the always-on form of
  * [[graft.operators.EventFlows.sequenceExamples]] (q113) — as events
  * arrive, each user's rolling context window materializes (context,
  * target) next-token training examples, so the sequence-model
  * training set GROWS with the stream instead of being rebuilt by a
  * batch job.
  *
  * State per user is exactly the last `contextLen` event types — O(1)
  * regardless of how many events the user ever produced — and is
  * evicted `retention` after the user's newest event (event-time
  * timeout under the input's watermark), so total state is bounded by
  * active-users-within-horizon × contextLen.
  *
  * Parity contract (proven in StreamingSpec): identical to the batch
  * operator when per-user event time is non-decreasing ACROSS
  * micro-batches (sorted replay — the file-source/backfill case).
  * Within a micro-batch, rows sort by (ts, id) exactly like the batch
  * window. An event arriving after a later event was already processed
  * in a PREVIOUS batch sees only the state as of then — the inherent
  * streaming-vs-batch late-data gap every stateful operator here
  * shares; widen the watermark to push it out.
  */
object StreamSequence {

  final case class Ev(
      user_id: Long,
      event_id: Long,
      event_type: String,
      ts: java.sql.Timestamp
  )
  final case class SeqState(recent: Seq[String])
  final case class Example(
      user_id: Long,
      event_id: Long,
      ts: java.sql.Timestamp,
      context: String,
      target: String
  )

  /** Examples over a (possibly streaming) event frame. Streaming input
    * must already carry a watermark on `tsCol`; batch input runs the
    * identical plan (single group call per user == the batch window).
    */
  def sequenceExamplesStream(
      events: DataFrame,
      userCol: String,
      idCol: String,
      typeCol: String,
      tsCol: String,
      contextLen: Int,
      retention: String = "1 hour"
  ): Dataset[Example] = {
    require(contextLen > 0, s"contextLen must be positive, got $contextLen")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(userCol).cast("long").as("user_id"),
        col(idCol).cast("long").as("event_id"),
        col(typeCol).as("event_type"), col(tsCol).as("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqState, Example](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (_, rows, state: GroupState[SeqState]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          // same ordering rule as the batch window: (ts, id)
          val fresh = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var recent = state.getOption.map(_.recent).getOrElse(Seq.empty)
          val out = fresh.flatMap { e =>
            // batch parity: emit iff the OLDEST lag is non-null (≥
            // contextLen predecessors AND that predecessor's type is
            // set); a null type anywhere inside nulls the context,
            // like the batch operator and SQL's `||`
            val ex =
              if (recent.size >= contextLen && recent.head != null)
                Some(Example(e.user_id, e.event_id, e.ts,
                  if (recent.contains(null)) null else recent.mkString(">"),
                  e.event_type))
              else None
            recent = (recent :+ e.event_type).takeRight(contextLen)
            ex
          }
          state.update(SeqState(recent))
          if (fresh.nonEmpty) {
            val maxTs = fresh.map(_.ts.getTime).max
            // batch execution has no watermark/timeouts — ignore ONLY
            // that; a streaming-mode timeout failure must propagate or
            // idle users would never evict
            try state.setTimeoutTimestamp(maxTs, retention)
            catch { case _: UnsupportedOperationException => () }
          }
          out.iterator
        }
      }
  }
}
