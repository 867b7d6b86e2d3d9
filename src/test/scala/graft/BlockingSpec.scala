package graft

import graft.operators.Blocking
import org.apache.spark.sql.functions._

class BlockingSpec extends SparkSpecBase {
  import spark.implicits._

  private def names = Seq(
    (10L, "smith j"), (11L, "smyth j"), (12L, "smith j"),
    (13L, "adams b"), (14L, "zeta q"), (15L, "adamson b"),
    (16L, "brown c"), (17L, "browne c")
  ).toDF("id", "name")

  /** brute-force expected pair set for (key, id) order and window w */
  private def expected(w: Int): Set[(Long, Long)] = {
    val sorted = names.collect().map(r => (r.getString(1), r.getLong(0)))
      .sortBy(identity).map(_._2)
    (for {
      i <- sorted.indices; k <- 1 until w; if i + k < sorted.length
    } yield (sorted(i), sorted(i + k))).toSet
  }

  test("pair set matches the brute-force sorted neighborhood") {
    for (w <- Seq(2, 3, 4)) {
      val got = Blocking.sortedNeighborPairs(names, "name", "id", w)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      assert(got === expected(w), s"window=$w")
    }
  }

  test("pairs are deterministic across input partitionings") {
    val a = Blocking
      .sortedNeighborPairs(names.repartition(7), "name", "id", 3)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val b = Blocking
      .sortedNeighborPairs(names.repartition(1), "name", "id", 3)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(a === b)
    assert(a === expected(3))
  }

  test("duplicate keys are ordered by the unique id tie-break") {
    // ids 10 and 12 share "smith j": the pair (10,12) must exist exactly
    // once, ordered by id
    val got = Blocking.sortedNeighborPairs(names, "name", "id", 2)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq
    assert(got.count { case (l, r) => Set(l, r) == Set(10L, 12L) } === 1)
    assert(got.contains((10L, 12L)) && !got.contains((12L, 10L)))
  }
}
