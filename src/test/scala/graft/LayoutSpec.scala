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
}
