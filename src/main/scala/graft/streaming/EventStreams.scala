package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming operators over the events stream (SURVEY §2.9:
  * the reference is batch-with-incremental-merge; the Spark-native
  * evolution is watermarked streaming with the SAME transforms, so the
  * batch queries in [[graft.queries.StreamQueries]] and these streaming
  * versions share logic).
  */
object EventStreams {

  /** Tumbling-window aggregation: count + exact sum per (window,
    * event_type). Works on a batch OR streaming DataFrame — in streaming
    * mode add [[withWatermark]] upstream and the plan becomes an
    * incremental stateful agg.
    */
  def windowedAgg(events: DataFrame, windowLength: String = "1 hour")
      : DataFrame =
    events
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double")
          .as("total_value")
      )
      .select(
        col("window.start").as("wstart"),
        col("event_type"),
        col("n_events"),
        col("total_value")
      )

  /** Stream-static enrichment + windowed aggregation: events joined to a
    * small static dimension (`user_id` → `segment`) then aggregated per
    * (window, segment, event_type). The dimension side is explicitly
    * broadcast — in streaming mode this is the canonical stream-static
    * join (re-resolved per micro-batch, no state), and in batch mode the
    * same plan is a map-side hash join; either way the only shuffle is
    * the aggregation's. Works on a batch OR watermarked streaming
    * events DataFrame.
    */
  def enrichedWindowedAgg(
      events: DataFrame,
      users: DataFrame,
      windowLength: String = "1 hour"
  ): DataFrame =
    events
      .join(broadcast(users), Seq("user_id"))
      .groupBy(window(col("ts"), windowLength), col("segment"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double")
          .as("total_value")
      )
      .select(
        col("window.start").as("wstart"),
        col("segment"),
        col("event_type"),
        col("n_events"),
        col("total_value")
      )

  /** Streaming variant with a watermark (late events beyond `lateness`
    * are dropped; state for closed windows is evicted — the scale knob
    * for unbounded streams).
    */
  def windowedAggStream(
      events: DataFrame,
      windowLength: String = "1 hour",
      lateness: String = "2 hours"
  ): DataFrame =
    windowedAgg(events.withWatermark("ts", lateness), windowLength)

  /** Native session windows: activity sessions with a 30-minute gap per
    * user (batch mode; in streaming the same expression works with a
    * watermark).
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events")
      )

  // --- custom stateful operator: session tracking via state store ------

  final case class Event(user_id: Long, ts: Timestamp)
  final case class SessionState(count: Long, lastTs: Long)
  final case class SessionSummary(user_id: Long, n_sessions: Long)

  /** Streaming exact dedup: drop key-duplicates within the watermark
    * horizon (`dropDuplicatesWithinWatermark` — state is bounded by the
    * lateness window instead of growing forever, which is the only
    * formulation that survives an unbounded stream). The batch
    * equivalent is A1/q22's hash-groupBy; this is its always-on form
    * for continuously-arriving exports.
    */
  def streamingDedup(
      events: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      lateness: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark(timeCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** flatMapGroupsWithState-based session counter — the
    * KeyValueGroupedDataset custom-state surface (§2.10): counts
    * per-user sessions with a 30-minute gap, emitting on timeout. Used
    * by StreamingSpec to prove parity with [[sessionAgg]].
    */
  def statefulSessionCount(
      events: Dataset[Event],
      gapMinutes: Long = 30
  ): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { (userId, rows, state: GroupState[SessionState]) =>
        // batch-mode semantics: all rows for the key arrive at once
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var sessions = 0L
        var lastTs = Long.MinValue
        sorted.foreach { e =>
          if (lastTs == Long.MinValue || e.ts.getTime - lastTs >= gapMs)
            sessions += 1
          lastTs = e.ts.getTime
        }
        state.update(SessionState(sessions, lastTs))
        Iterator.single(SessionSummary(userId, sessions))
      }
  }

  final case class FunnelEvent(user_id: Long, event_type: String, ts: Timestamp)
  final case class FunnelState(step: Int, lastTsMs: Long)
  final case class FunnelTransition(
      user_id: Long, step: Long, event_type: String, t: Timestamp)

  /** Streaming funnel: per-user conversion-step state via
    * flatMapGroupsWithState, emitting a transition row the moment a user
    * completes the next step (first `steps(k)` event strictly after the
    * step-(k−1) completion — the greedy forward scan computes exactly the
    * batch funnel's chained MIN times). State per user is ONE (step,
    * lastTs) pair — constant, regardless of the user's event volume.
    * Exact-parity contract: per-user event time non-decreasing across
    * micro-batches (sorted replay); within a batch the group is sorted
    * here. StreamingSpec proves step counts equal the batch q89 funnel.
    */
  def statefulFunnel(
      events: Dataset[FunnelEvent],
      steps: Seq[String]
  ): Dataset[FunnelTransition] = {
    import events.sparkSession.implicits._
    val stepArr = steps.toArray
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelTransition](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { (userId, rows, state: GroupState[FunnelState]) =>
        var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
        val out = scala.collection.mutable.ArrayBuffer.empty[FunnelTransition]
        rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
          if (st.step < stepArr.length && e.event_type == stepArr(st.step) &&
            (st.step == 0 || e.ts.getTime > st.lastTsMs)) {
            st = FunnelState(st.step + 1, e.ts.getTime)
            out += FunnelTransition(userId, st.step.toLong,
              stepArr(st.step - 1), e.ts)
          }
        }
        state.update(st)
        out.iterator
      }
  }

  /** Click→purchase attribution pairs: every purchase joined to the
    * same user's clicks in the `window` just before it (half-open —
    * the click at the purchase instant is excluded). On BATCH frames
    * this is a hash join on user_id with the interval as residual
    * filter; on STREAMING frames (pass `lateness`) it is a genuine
    * stream-stream interval self-join — the two-sided time bound lets
    * the state store evict rows once the watermark passes, so state
    * stays proportional to the window, not the stream. StreamingSpec
    * proves both modes emit the identical pair set.
    */
  def attributionPairs(
      events: DataFrame,
      window: String = "30 minutes",
      lateness: Option[String] = None
  ): DataFrame = {
    def side(tpe: String, idAs: String, tsAs: String) = {
      val s = lateness.fold(events)(events.withWatermark("ts", _))
      s.filter(col("event_type") === tpe)
        .select(col("user_id"), col("event_id").as(idAs),
          col("ts").as(tsAs))
    }
    val purchases = side("purchase", "purchase_id", "p_ts")
    val clicks = side("click", "click_id", "c_ts")
      .withColumnRenamed("user_id", "c_user_id")
    purchases.join(clicks,
      col("user_id") === col("c_user_id") &&
        col("c_ts") >= col("p_ts") - expr(s"interval $window") &&
        col("c_ts") < col("p_ts"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        col("p_ts"), col("c_ts"))
  }

  /** Run a streaming query over a parquet directory with
    * Trigger.AvailableNow and collect the result via a memory sink —
    * the harness used by StreamingSpec to execute the REAL streaming
    * engine (micro-batches, state store, watermarks) to completion.
    */
  def runAvailableNow(
      spark: SparkSession,
      transformed: DataFrame,
      queryName: String
  ): DataFrame = {
    val q = transformed.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
