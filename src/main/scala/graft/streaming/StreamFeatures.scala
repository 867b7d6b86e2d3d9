package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Continuous point-in-time features — the always-on form of the q151
  * feature-snapshot join: as a user's interleaved event stream
  * arrives, every purchase is emitted WITH the user's features as of
  * that instant (latest click, latest view, 10-minute click count),
  * maintained in per-user state instead of re-joined by a batch job.
  * The online half of a feature store: training rows come from the
  * batch join, serving rows from this operator, and the parity spec
  * proves they agree.
  *
  * State per user: the last click (id, micros), the last view id, and
  * the DISTINCT click instants inside the trailing 10 minutes (pruned
  * on every append, so occupancy is bounded by the user's 10-minute
  * click rate — never their history).
  *
  * Parity contract (StreamingSpec): equal to the batch q151 columns
  * under sorted replay — per-user event time non-decreasing across
  * micro-batches, rows within a batch sorted by (ts, event_id), and
  * no two events of one user sharing an instant across types (true of
  * the events table; a same-instant click AFTER a purchase in id
  * order would be visible to the batch as-of join but not yet to the
  * stream).
  */
object StreamFeatures {

  final case class Ev(
      user_id: Long,
      event_id: Long,
      event_type: String,
      ts: java.sql.Timestamp,
      value: Double
  )
  final case class FState(
      lastClickId: Long, // -1 = none
      lastClickMicros: Long,
      lastViewId: Long, // -1 = none
      clickInstants: Seq[Long]
  )
  final case class Snapshot(
      event_id: Long,
      user_id: Long,
      purchase_value: Double,
      last_click_id: Option[Long],
      micros_since_click: Option[Long],
      last_view_id: Option[Long],
      n_clicks_10m: Long
  )

  private val WindowMicros = 10L * 60 * 1000000

  private def micros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + (t.getNanos / 1000) % 1000000L

  def featureSnapshots(
      events: DataFrame,
      userCol: String,
      idCol: String,
      typeCol: String,
      tsCol: String,
      valueCol: String
  ): Dataset[Snapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(userCol).cast("long").as("user_id"),
        col(idCol).cast("long").as("event_id"),
        col(typeCol).as("event_type"), col(tsCol).as("ts"),
        coalesce(col(valueCol).cast("double"), lit(0.0)).as("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FState, Snapshot](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { (_, rows, state: GroupState[FState]) =>
        var st = state.getOption
          .getOrElse(FState(-1L, 0L, -1L, Seq.empty))
        val out = Seq.newBuilder[Snapshot]
        // same total order as the batch join resolves ties with
        rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
          val us = micros(e.ts)
          e.event_type match {
            case "click" =>
              // distinct instants only (the batch side dedupes clicks
              // per (user, instant)); prune the trailing window
              val kept = st.clickInstants
                .filter(c => c > us - WindowMicros && c != us) :+ us
              st = FState(e.event_id, us, st.lastViewId, kept)
            case "view" =>
              st = st.copy(lastViewId = e.event_id)
            case "purchase" =>
              val nClicks =
                st.clickInstants.count(c => c >= us - WindowMicros && c < us)
              out += Snapshot(e.event_id, e.user_id, e.value,
                if (st.lastClickId >= 0) Some(st.lastClickId) else None,
                if (st.lastClickId >= 0) Some(us - st.lastClickMicros)
                else None,
                if (st.lastViewId >= 0) Some(st.lastViewId) else None,
                nClicks.toLong)
            case _ => // other event types carry no feature signal
          }
        }
        state.update(st)
        out.result().iterator
      }
  }
}
