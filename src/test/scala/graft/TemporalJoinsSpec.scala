package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfJoin picks the latest right row at or before each left row") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:10:00")),
      (2L, 10L, ts("2024-01-01 00:30:00")),
      (3L, 20L, ts("2024-01-01 00:05:00")) // key 20 has no prior right
    ).toDF("lid", "key", "lts")
    val right = Seq(
      (101L, 10L, ts("2024-01-01 00:00:00")),
      (102L, 10L, ts("2024-01-01 00:20:00")),
      (103L, 20L, ts("2024-01-01 00:06:00")) // after the key-20 left row
    ).toDF("rid", "key", "rts")
    val got = TemporalJoins.asOfJoin(left, right, "key", "lts", "rts")
      .select(col("lid"), col("asof.rid"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got === Map(1L -> 101L, 2L -> 102L, 3L -> -1L))
  }

  test("asOfJoin: equal timestamps count as at-or-before") {
    val left = Seq((1L, 5L, ts("2024-01-01 00:10:00")))
      .toDF("lid", "key", "lts")
    val right = Seq((201L, 5L, ts("2024-01-01 00:10:00")))
      .toDF("rid", "key", "rts")
    val got = TemporalJoins.asOfJoin(left, right, "key", "lts", "rts")
      .select(col("asof.rid")).collect()
    assert(got.head.getLong(0) === 201L)
  }

  test("asOfJoinBucketed equals asOfJoin on crafted edge cases") {
    // boundary-exact timestamps, equal-ts ties, duplicate (key, ts)
    // right rows, keys with no prior right row — across several bucket
    // widths, including one smaller than every gap (max seed-carry)
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:10:00")),
      (2L, 10L, ts("2024-01-01 01:00:00")), // exactly on a 1h boundary
      (3L, 10L, ts("2024-01-01 03:59:59")),
      (4L, 20L, ts("2024-01-01 00:05:00")), // no prior right
      (5L, 30L, ts("2024-01-01 02:00:00")) // tie with dup right rows
    ).toDF("lid", "key", "lts")
    val right = Seq(
      (101L, 10L, ts("2024-01-01 00:00:00")),
      (102L, 10L, ts("2024-01-01 01:00:00")), // equal ts → matches lid=2
      (103L, 20L, ts("2024-01-01 00:06:00")),
      (104L, 30L, ts("2024-01-01 02:00:00")), // dup (key, ts):
      (105L, 30L, ts("2024-01-01 02:00:00")) //   winner must agree
    ).toDF("rid", "key", "rts")
    val plain = TemporalJoins.asOfJoin(left, right, "key", "lts", "rts")
      .select(col("lid"), col("asof.rid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    for (bucket <- Seq(1000000L, 60L * 1000000, 3600L * 1000000)) {
      val b = TemporalJoins
        .asOfJoinBucketed(left, right, "key", "lts", "rts", bucket)
        .select(col("lid"), col("asof.rid")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      assert(b === plain, s"bucketMicros=$bucket")
    }
    assert(plain(2L) === 102L) // equal ts counted as at-or-before
    assert(plain(4L) === -1L)
  }

  test("asOfJoinBucketed equals asOfJoin on the sf0.001 events table") {
    val events = graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val plain = key(TemporalJoins
      .asOfJoin(purchases, clicks, "user_id", "ts", "ts")
      .select(col("event_id"), col("asof.click_id")).collect())
    // a tiny bucket forces long seed-carry chains; a huge one collapses
    // to (nearly) the plain single-window shape
    for (bucket <- Seq(60L * 1000000, 3600L * 1000000, 86400L * 1000000)) {
      val b = key(TemporalJoins
        .asOfJoinBucketed(purchases, clicks, "user_id", "ts", "ts", bucket)
        .select(col("event_id"), col("asof.click_id")).collect())
      assert(b === plain, s"bucketMicros=$bucket")
    }
  }

  test("linearAttributionJoin splits value equally across window clicks") {
    val probe = Seq(
      (100L, 7L, ts("2024-01-01 01:00:00"), 9.0), // 3 clicks → 3.0 each
      (200L, 7L, ts("2024-01-01 03:00:00"), 5.0) // empty window → no rows
    ).toDF("pid", "key", "t", "v")
    val cand = Seq(
      (1L, 7L, ts("2024-01-01 00:50:00")),
      (2L, 7L, ts("2024-01-01 00:55:00")),
      (3L, 7L, ts("2024-01-01 00:59:59")),
      (4L, 7L, ts("2024-01-01 01:00:00")) // at probe ts: excluded
    ).toDF("cid", "key", "t")
    val got = TemporalJoins.linearAttributionJoin(
      probe, cand, "key", "t", "pid", "cid", "v",
      10L * 60 * 1000000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === 3)
    assert(got.forall { case (p, _, n, c) => p == 100L && n == 3L && c == 3.0 })
    assert(got.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("slidingCountJoin counts the half-open preceding window only") {
    // window [ts - 10min, ts): candidate AT the probe ts excluded,
    // candidate exactly 10min before included, across bucket boundaries
    val probe = Seq(
      (1L, 7L, ts("2024-01-01 01:00:00")),
      (2L, 7L, ts("2024-01-01 02:00:00")), // empty window → 0
      (3L, 8L, ts("2024-01-01 01:00:00")) // other key sees nothing
    ).toDF("pid", "key", "t")
    val cand = Seq(
      (7L, ts("2024-01-01 00:50:00"), 1.0), // exactly -10min: included
      (7L, ts("2024-01-01 00:55:30"), 2.0), // in window, previous bucket
      (7L, ts("2024-01-01 01:00:00"), 4.0), // at probe ts: excluded
      (7L, ts("2024-01-01 00:49:59"), 8.0) // just outside
    ).toDF("key", "t", "v")
    val got = TemporalJoins
      .slidingCountJoin(probe, cand, "key", "t", "v", 10L * 60 * 1000000)
      .select(col("pid"), col("n_in_window"), col("sum_value"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got === Map(
      1L -> ((2L, 3.0)),
      2L -> ((0L, 0.0)),
      3L -> ((0L, 0.0))))
  }

  test("slidingCountJoin counts matched rows even when their value is null") {
    // n_in_window must count joined candidate ROWS (like the oracle's
    // COUNT over the join), not non-null values
    val probe = Seq((1L, 7L, ts("2024-01-01 01:00:00"))).toDF("pid", "key", "t")
    val cand = Seq(
      (7L, ts("2024-01-01 00:55:00"), Some(2.0)),
      (7L, ts("2024-01-01 00:56:00"), None) // matched, null value
    ).toDF("key", "t", "v")
    val r = TemporalJoins
      .slidingCountJoin(probe, cand, "key", "t", "v", 10L * 60 * 1000000)
      .select("n_in_window", "sum_value").head()
    assert(r.getLong(0) === 2L) // both rows matched
    assert(r.getDouble(1) === 2.0) // sum skips the null value
  }

  test("firstTouchJoin picks the earliest candidate; empty window → nulls") {
    val probe = Seq(
      (1L, 7L, ts("2024-01-01 01:00:00")),
      (2L, 9L, ts("2024-01-01 01:00:00"))
    ).toDF("pid", "key", "t")
    val cand = Seq(
      (100L, 7L, ts("2024-01-01 00:57:00")),
      (101L, 7L, ts("2024-01-01 00:52:00")) // earlier → first touch
    ).toDF("cid", "key", "t")
    val got = TemporalJoins
      .firstTouchJoin(probe, cand, "key", "t", "cid", 10L * 60 * 1000000)
      .select("pid", "touch_cid")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got === Map(1L -> 101L, 2L -> -1L))
  }

  test("funnel enforces strict step ordering per user") {
    import graft.operators.EventFlows
    val events = Seq(
      // u1 completes the whole funnel
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 00:01:00")),
      (1L, "purchase", ts("2024-01-01 00:02:00")),
      // u2's click is SIMULTANEOUS with its view → not strictly after
      (2L, "view", ts("2024-01-01 00:00:00")),
      (2L, "click", ts("2024-01-01 00:00:00")),
      // u3 only views
      (3L, "view", ts("2024-01-01 00:05:00")),
      // u4 clicks+purchases but never views → appears nowhere
      (4L, "click", ts("2024-01-01 00:00:00")),
      (4L, "purchase", ts("2024-01-01 00:01:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = EventFlows
      .funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === Set((1L, "view", 3L), (2L, "click", 1L),
      (3L, "purchase", 1L)))
  }

  test("weeklyRetention grids cohorts by first-event week") {
    import graft.operators.EventFlows
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), // Monday, week 0
      (1L, ts("2024-01-15 10:00:00")), // week 2
      (2L, ts("2024-01-03 10:00:00")), // week 0 cohort (Wednesday)
      (3L, ts("2024-01-08 10:00:00"))  // week 1 cohort
    ).toDF("user_id", "ts")
    val out = EventFlows.weeklyRetention(events, "user_id", "ts")
    // cohort is DATE (DuckDB's date_trunc('week') type), not timestamp
    assert(out.schema("cohort").dataType ===
      org.apache.spark.sql.types.DateType)
    val got = out
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === Set(
      ("2024-01-01", 0L, 2L), // u1 + u2 active in their cohort week
      ("2024-01-01", 2L, 1L), // u1 returns two weeks later
      ("2024-01-08", 0L, 1L)  // u3's own cohort
    ))
  }

  test("intervalOverlapJoin matches brute force, each pair exactly once") {
    // deterministic LCG intervals spanning many buckets and boundary
    // cases (touching endpoints, containment, long intervals)
    var seed = 99L
    def next(m: Int): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 33) % m
    }
    val li = (1L to 80L).map { i =>
      val s = next(10000); (i, s, s + 1 + next(900))
    }
    val ri = (1L to 80L).map { i =>
      val s = next(10000); (i, s, s + 1 + next(400))
    }
    val expected = (for {
      (a, ls, le) <- li; (b, rs, re) <- ri
      if ls < re && rs < le
    } yield (a, b, math.min(le, re) - math.max(ls, rs))).toSet
    val got = graft.operators.TemporalJoins.intervalOverlapJoin(
        li.toDF("lid", "ls", "le"), ri.toDF("rid", "rs", "re"),
        "ls", "le", "rs", "re", bucketMicros = 250L)
      .select("lid", "rid", "overlap_micros")
      .as[(Long, Long, Long)].collect()
    assert(got.length === got.toSet.size, "pair emitted more than once")
    assert(got.toSet === expected)
  }

  test("intervalOverlapJoin works when both sides share column names") {
    val l = Seq((1L, 0L, 100L), (2L, 500L, 600L)).toDF("lid", "s", "e")
    val r = Seq((10L, 50L, 80L), (20L, 900L, 950L)).toDF("rid", "s", "e")
    val got = graft.operators.TemporalJoins
      .intervalOverlapJoin(l, r, "s", "e", "s", "e", 100L)
      .select("lid", "rid", "overlap_micros")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 10L, 30L)))
  }

  test("intervalOverlapJoin: touching half-open intervals do NOT pair") {
    val l = Seq((1L, 0L, 100L)).toDF("lid", "ls", "le")
    val r = Seq((1L, 100L, 200L), (2L, 99L, 200L), (3L, 200L, 200L))
      .toDF("rid", "rs", "re")
    val got = graft.operators.TemporalJoins
      .intervalOverlapJoin(l, r, "ls", "le", "rs", "re", 50L)
      .select("rid").as[Long].collect().toSet
    // [0,100) meets [100,200) only at the excluded endpoint; empty
    // right interval [200,200) is dropped entirely
    assert(got === Set(2L))
  }
}
