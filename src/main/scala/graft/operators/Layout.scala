package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering — the Z-ORDER / liquid-
  * clustering role (the reference clusters its Delta tables by group
  * keys for the same reason, deltalake.py's clusterBy): interleave the
  * bits of two dimension keys into a Morton z-value and lay data out in
  * z order, so per-file min/max stats stay tight on BOTH dimensions and
  * scans filtering on either column prune files. Everything here is
  * static integer bit-math (`shiftright`/`&`/`shiftleft` over a fixed
  * unrolled term list) — whole-stage codegen'd, no UDF, and exactly
  * reproducible in any engine, so the layout decision itself is
  * oracle-checkable.
  */
object Layout {

  /** Morton z-value: x's bits on even positions, y's on odd, `bits`
    * bits each (higher bits are ignored by the per-bit mask). The
    * result is a total order on the (x, y) grid where close values in
    * either dimension stay close in the sort. Callers supply
    * NON-NEGATIVE dimension keys (rank, bucket, day number …);
    * negative inputs interleave two's-complement low bits —
    * deterministic and engine-neutral, but without the locality
    * property that makes the layout useful.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits=$bits out of range")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      )
    }
    terms.reduce(_ + _)
  }

  /** The write-side layout step: range-partition by z-value (so file
    * boundaries are z-contiguous) and sort within partitions. At scale
    * this is the OPTIMIZE/cluster pass run after ingest; the scan side
    * needs nothing special — tight per-file ranges do the pruning.
    */
  def zOrderBy(df: DataFrame, zval: Column, partitions: Int): DataFrame =
    df.repartitionByRange(partitions, zval).sortWithinPartitions(zval)

  /** The matching z-value expression in DuckDB SQL, for oracles. */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits)
      .flatMap { i =>
        Seq(s"((($x >> $i) & 1) << ${2 * i})",
          s"((($y >> $i) & 1) << ${2 * i + 1})")
      }
      .mkString(" + ")

  /** Compaction planner — the table-maintenance companion of
    * [[graft.operators.DataManifest]]: given a file manifest (one row
    * per data file with its partition and byte size), assign each file
    * to an output bin of ~`targetBytes` using the cumulative-offset
    * rule — bin = floor(cumulative-bytes-before-this-file / target)
    * within the partition, files visited in (orderCol) order. This is
    * the same packing rule Spark's own scan planner applies when it
    * coalesces small files into `FilePartition`s via
    * `maxPartitionBytes` over cumulative byte offsets, so the plan is
    * pure window arithmetic: one hash exchange on the partition
    * column, one sort, zero joins — O(manifest), never O(data), which
    * is what makes re-planning a 100 TB table's compaction a
    * sub-second driver job. A file larger than `targetBytes` joins
    * whatever bin its cumulative offset falls in (possibly alongside
    * small predecessors — exactly like Spark's scan coalescing when a
    * file exceeds `maxPartitionBytes`) and advances the offset past
    * one or more boundaries, so the FOLLOWING files open a fresh bin.
    *
    * Every quantity is integer (BIGINT sums, integer division), so a
    * SQL engine reproduces the plan bit-for-bit.
    */
  def planCompaction(
      manifest: DataFrame,
      partCol: String,
      sizeCol: String,
      orderCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes=$targetBytes must be positive")
    // `bin` is this operator's declared output — refuse to silently
    // overwrite an input column of that name; and the working column
    // is uniquified so it cannot shadow a real manifest column either
    require(!manifest.columns.contains("bin"),
      "planCompaction appends a `bin` column; the manifest already has one")
    val before =
      Iterator.iterate("__before")(_ + "_")
        .dropWhile(manifest.columns.toSet).next()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol))
      .orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    manifest
      .withColumn(before,
        coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"`$before` div ${targetBytes}L"))
      .drop(before)
  }
}
