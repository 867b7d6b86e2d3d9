package graft

import graft.operators.MergeOps
import graft.operators.MergeOps.MergeSpec
import org.apache.spark.sql.functions._

class MergeOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("merge handles schema evolution: update adds a column") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val updates = Seq((2L, "b2", "extra"), (3L, "c", "x"))
      .toDF("id", "v", "w")
    val out = MergeOps
      .merge(target, updates, MergeSpec(Seq("id")))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(out.toSeq === Seq(
      (1L, "a", None),
      (2L, "b2", Some("extra")),
      (3L, "c", Some("x"))
    ))
  }

  test("guard: null timestamps on either side still update; equal updates") {
    val target = Seq(
      (1L, "old1", "2024-01-02"),
      (2L, "old2", null.asInstanceOf[String]),
      (3L, "old3", "2024-01-02"),
      (4L, "old4", "2024-01-02")
    ).toDF("id", "v", "lastUpdated")
    val updates = Seq(
      (1L, "new1", "2024-01-01"), // strictly older → keep target
      (2L, "new2", "2024-01-01"), // target null → update
      (3L, "new3", null.asInstanceOf[String]), // update null → update
      (4L, "new4", "2024-01-02") // equal → update (<= semantics)
    ).toDF("id", "v", "lastUpdated")
    val out = MergeOps
      .merge(target, updates,
        MergeSpec(Seq("id"), guardField = Some("lastUpdated")))
      .orderBy("id")
      .collect()
      .map(_.getString(1))
    assert(out.toSeq === Seq("old1", "new2", "new3", "new4"))
  }

  test("group replace deletes only touched groups' unmatched rows") {
    val target = Seq(
      (1L, "g1", "keep-or-die"),
      (2L, "g1", "will-update"),
      (3L, "g2", "untouched-group")
    ).toDF("id", "grp", "v")
    val updates = Seq((2L, "g1", "updated")).toDF("id", "grp", "v")
    val out = MergeOps
      .merge(target, updates,
        MergeSpec(Seq("id"), groupField = Some("grp")))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getString(2)))
    // id=1 deleted (g1 touched, not in update); id=3 kept (g2 untouched)
    assert(out.toSeq === Seq((2L, "updated"), (3L, "untouched-group")))
  }

  test("dedupLastWins keeps the last occurrence per key") {
    val df = Seq(
      (1L, "first", 1L),
      (1L, "second", 2L),
      (2L, "only", 1L)
    ).toDF("id", "v", "seq")
    val out = MergeOps
      .dedupLastWins(df, Seq("id"), Seq(col("seq")))
      .orderBy("id")
      .collect()
      .map(_.getString(1))
    assert(out.toSeq === Seq("second", "only"))
  }

  test("deleteByIds removes listed ids only") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val ids = Seq(2L).toDF("id")
    val out = MergeOps.deleteByIds(df, "id", ids)
      .orderBy("id").collect().map(_.getLong(0))
    assert(out.toSeq === Seq(1L, 3L))
  }
}
