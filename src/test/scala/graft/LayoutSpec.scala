package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  /** Reference bit-interleave, plain Scala. */
  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the reference interleave on a value grid") {
    val cases = for {
      x <- Seq(0L, 1L, 3L, 7L, 42L, 4095L)
      y <- Seq(0L, 1L, 2L, 5L, 100L, 4095L)
    } yield (x, y)
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zValue(col("x"), col("y"), 12).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    cases.foreach { case (x, y) =>
      assert(got((x, y)) === morton(x, y, 12), s"($x, $y)")
    }
    // bits above the width are masked off
    val masked = Seq((4096L + 3L, 8192L + 5L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 12))
      .head().getLong(0)
    assert(masked === morton(3L, 5L, 12))
  }

  test("zOrderBy keeps both dimension ranges tight per partition") {
    // a 64×64 grid, one row per cell, laid out in 16 z-partitions:
    // after z-ordering, every partition's bounding box must be far
    // smaller than the full grid (that tightness IS the pruning win;
    // a row-major sort would leave y spanning the whole axis)
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val z = grid.withColumn("z", Layout.zValue(col("x"), col("y"), 6))
    val boxes = Layout.zOrderBy(z, col("z"), 16)
      .select(col("x"), col("y"), col("z"), spark_partition_id().as("p"))
      .groupBy("p")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"),
        min("z").as("z0"), max("z").as("z1"), count(lit(1)).as("n"))
      .collect()
    assert(boxes.map(_.getAs[Long]("n")).sum === 64L * 64L)
    // z ranges of distinct partitions must not interleave
    // (repartitionByRange contract — file boundaries are z-contiguous)
    val sorted = boxes.sortBy(_.getAs[Long]("z0"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("z1") <= b.getAs[Long]("z0"))
      case _ =>
    }
    // every partition's bounding box covers ≤ a quarter of each axis
    boxes.foreach { r =>
      assert(r.getAs[Long]("x1") - r.getAs[Long]("x0") <= 16,
        s"x range too wide: $r")
      assert(r.getAs[Long]("y1") - r.getAs[Long]("y0") <= 16,
        s"y range too wide: $r")
    }
  }

  test("planCompaction packs files to the target, oversized stand alone") {
    // partition p1: 5 small files of 300B at target 1000 → bins by
    // cumulative offset: 0,0,0,1,1 (floor(before/1000))
    // partition p2: small, HUGE (5000B), small → the huge file advances
    // the offset so the tail file lands in its own later bin
    val manifest = Seq(
      ("p1", "f1", 300L), ("p1", "f2", 300L), ("p1", "f3", 300L),
      ("p1", "f4", 300L), ("p1", "f5", 300L),
      ("p2", "g1", 200L), ("p2", "g2", 5000L), ("p2", "g3", 200L)
    ).toDF("part", "file", "bytes")
    val plan = Layout.planCompaction(manifest, "part", "bytes", "file", 1000L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("bin"))
      .toMap
    assert(plan(("p1", "f1")) === 0L)
    assert(plan(("p1", "f2")) === 0L)
    assert(plan(("p1", "f3")) === 0L)
    assert(plan(("p1", "f4")) === 0L) // before = 900 < 1000
    assert(plan(("p1", "f5")) === 1L) // before = 1200
    assert(plan(("p2", "g1")) === 0L)
    assert(plan(("p2", "g2")) === 0L) // before = 200
    assert(plan(("p2", "g3")) === 5L) // before = 5200 → isolated bin
    // no output bin made only of small files exceeds target + one
    // file (the planner never splits files; a bin absorbing an
    // oversized file legitimately overshoots, like Spark's scan
    // coalescing when one file exceeds maxPartitionBytes)
    val sums = Layout.planCompaction(manifest, "part", "bytes", "file", 1000L)
      .groupBy("part", "bin")
      .agg(sum("bytes").as("b"), max("bytes").as("mx"))
      .collect()
    sums.filter(_.getAs[Long]("mx") <= 1000L).foreach { r =>
      assert(r.getAs[Long]("b") <= 1000L + 300L)
    }
  }
}
