package graft

import java.sql.Timestamp
import graft.operators.Scd2
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("compresses runs, numbers versions, closes intervals half-open") {
    // user A: gold → gold → silver → silver → gold  (3 versions)
    // user B: single value (1 version, current)
    // user C: null → null → bronze (null run is ONE version)
    val changes = Seq(
      ("A", ts("2024-01-01 00:00:00"), 1L, Some("gold")),
      ("A", ts("2024-01-02 00:00:00"), 2L, Some("gold")),
      ("A", ts("2024-01-03 00:00:00"), 3L, Some("silver")),
      ("A", ts("2024-01-04 00:00:00"), 4L, Some("silver")),
      ("A", ts("2024-01-05 00:00:00"), 5L, Some("gold")),
      ("B", ts("2024-02-01 00:00:00"), 6L, Some("basic")),
      ("C", ts("2024-03-01 00:00:00"), 7L, None),
      ("C", ts("2024-03-02 00:00:00"), 8L, None),
      ("C", ts("2024-03-03 00:00:00"), 9L, Some("bronze"))
    ).toDF("k", "at", "seq", "tier")

    val hist = Scd2.build(changes, Seq("k"), "at", "seq", "tier")
      .orderBy("k", "version")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4), r.getBoolean(5)))

    assert(hist.toSeq === Seq(
      ("A", "gold", ts("2024-01-01 00:00:00"),
        Some(ts("2024-01-03 00:00:00")), 1L, false),
      ("A", "silver", ts("2024-01-03 00:00:00"),
        Some(ts("2024-01-05 00:00:00")), 2L, false),
      ("A", "gold", ts("2024-01-05 00:00:00"), None, 3L, true),
      ("B", "basic", ts("2024-02-01 00:00:00"), None, 1L, true),
      ("C", null, ts("2024-03-01 00:00:00"),
        Some(ts("2024-03-03 00:00:00")), 1L, false),
      ("C", "bronze", ts("2024-03-03 00:00:00"), None, 2L, true)
    ))
  }

  test("intervals tile each key's timeline: no gaps, no overlaps") {
    // randomized-ish stream over 3 keys; invariant checked structurally
    val changes = (1 to 300).map { i =>
      ("k" + (i % 3), ts(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
        i.toLong, (i * 7919 % 5).toString)
    }.toDF("k", "at", "seq", "v")
    val hist = Scd2.build(changes, Seq("k"), "at", "seq", "v")
    // exactly one current row per key
    val currents = hist.filter(col("is_current")).groupBy("k").count()
      .collect().map(_.getLong(1))
    assert(currents.forall(_ === 1L) && currents.length === 3)
    // each version's valid_to equals the next version's valid_from
    val rows = hist.orderBy("k", "version").collect()
      .map(r => (r.getString(0), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(3 + 1)))
      .groupBy(_._1)
    rows.values.foreach { vs =>
      vs.sortBy(_._4).sliding(2).foreach {
        case Array(a, b) => assert(a._3.contains(b._2))
        case _ =>
      }
    }
    // plan shape: ONE exchange for the whole history build
    val exchanges = hist.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, "SCD2 must reuse one hash exchange")
  }

  test("applyChanges equals a from-scratch rebuild") {
    // 4 keys: k0/k1 change in both halves, k2 only in the base
    // (untouched pass-through), k3 only in the batch (no seed).
    // Includes a batch change equal-valued to the open version (must
    // extend, not re-version) and one at the exact cutoff instant.
    val all = (1 to 200).map { i =>
      ("k" + (i % 4), ts(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
        i.toLong, ((i * 31) % 3).toString)
    }.filterNot { case (k, _, seq, _) => k == "k2" && seq > 100 }
      .filterNot { case (k, _, seq, _) => k == "k3" && seq <= 100 }
    val df = all.toDF("k", "at", "seq", "v")
    val full = Scd2.build(df, Seq("k"), "at", "seq", "v")
    val base = all.filter(_._3 <= 100).toDF("k", "at", "seq", "v")
    val batch = all.filter(_._3 > 100).toDF("k", "at", "seq", "v")
    val incr = Scd2.applyChanges(
      Scd2.build(base, Seq("k"), "at", "seq", "v"),
      batch, Seq("k"), "at", "seq", "v")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getLong(4),
        r.getBoolean(5))).toSet
    assert(canon(incr) === canon(full))
    assert(canon(incr).nonEmpty)
  }

  test("applyChanges enforces the tie contract and validate mode fails loudly") {
    val base = Seq(("k", ts("2024-01-02 00:00:00"), 5L, "a"))
      .toDF("k", "at", "seq", "v")
    val hist = Scd2.build(base, Seq("k"), "at", "seq", "v")

    // non-integral tie column: fails fast (it would silently null-cast
    // and misorder against the Long.MinValue seed sentinel otherwise)
    val strTie = Seq(("k", ts("2024-01-03 00:00:00"), "x", "b"))
      .toDF("k", "at", "seq", "v")
    val e1 = intercept[IllegalArgumentException] {
      Scd2.applyChanges(hist, strTie, Seq("k"), "at", "seq", "v")
    }
    assert(e1.getMessage.contains("integral"))

    // validate=true: a batch row strictly before the key's open row is
    // a provable append-only violation — loud, not silently divergent
    val late = Seq(("k", ts("2024-01-01 00:00:00"), 6L, "b"))
      .toDF("k", "at", "seq", "v")
    val e2 = intercept[IllegalArgumentException] {
      Scd2.applyChanges(hist, late, Seq("k"), "at", "seq", "v",
        validate = true)
    }
    assert(e2.getMessage.contains("append-only"))

    // validate=true: a batch tie equal to the reserved sentinel would
    // sort before the seed at the same instant — rejected
    val sentinel = Seq(("k", ts("2024-01-03 00:00:00"), Long.MinValue, "b"))
      .toDF("k", "at", "seq", "v")
    intercept[IllegalArgumentException] {
      Scd2.applyChanges(hist, sentinel, Seq("k"), "at", "seq", "v",
        validate = true)
    }

    // a conforming batch passes with validation on, same result as off
    val good = Seq(("k", ts("2024-01-03 00:00:00"), 7L, "b"))
      .toDF("k", "at", "seq", "v")
    val on = Scd2.applyChanges(hist, good, Seq("k"), "at", "seq", "v",
      validate = true)
    val off = Scd2.applyChanges(hist, good, Seq("k"), "at", "seq", "v")
    assert(on.collect().toSet === off.collect().toSet)
    assert(on.count() === 2)
  }
}
