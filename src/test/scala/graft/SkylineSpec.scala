package graft

import graft.operators.Skyline
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpecBase {
  import spark.implicits._

  private def pts = Seq(
    (1L, 1.0, 9.0), (2L, 5.0, 5.0), (3L, 9.0, 1.0), // frontier
    (4L, 4.0, 4.0), // dominated by 2
    (5L, 1.0, 9.0), // duplicate of 1 — both survive
    (6L, 9.0, 0.5), // dominated by 3
    (7L, 0.5, 9.5) // frontier (beats 1/5 on y, loses on x)
  ).toDF("id", "x", "y")

  private def bruteForce(rows: Seq[(Long, Double, Double)]): Set[Long] =
    rows.filterNot { case (_, ax, ay) =>
      rows.exists { case (_, bx, by) =>
        bx >= ax && by >= ay && (bx > ax || by > ay)
      }
    }.map(_._1).toSet

  test("matches the brute-force dominance set, keeps duplicates") {
    val got = Skyline.skyline(pts, Seq("x", "y"))
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L, 5L, 7L))
    assert(got === bruteForce(pts.as[(Long, Double, Double)].collect().toSeq))
  }

  test("identical result under any partitioning; null dims excluded") {
    val withNull = pts.unionByName(
      Seq((8L, Option.empty[Double], Option(99.0)))
        .toDF("id", "x", "y"))
    val a = Skyline.skyline(withNull.repartition(13), Seq("x", "y"))
      .select("id").as[Long].collect().toSet
    val b = Skyline.skyline(withNull.coalesce(1), Seq("x", "y"))
      .select("id").as[Long].collect().toSet
    assert(a === b)
    assert(a === Set(1L, 2L, 3L, 5L, 7L))
  }

  test("single dimension degenerates to the max rows") {
    val got = Skyline.skyline(pts, Seq("x"))
      .select("id").as[Long].collect().toSet
    assert(got === Set(3L, 6L))
  }

  test("non-double dims are rejected") {
    intercept[IllegalArgumentException] {
      Skyline.skyline(pts, Seq("id"))
    }
  }
}
