package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Skyline (Pareto-dominance) operator: keep the rows not dominated by
  * any other row, maximizing every dimension — the multi-criteria
  * "best tradeoffs" query (Börzsönyi et al., ICDE 2001) that no single
  * ORDER BY can express.
  *
  * Two-phase distributed skyline: each partition computes its local
  * skyline imperatively (a kept-list scan — genuine per-partition
  * state, the documented mapPartitions exception), then the global
  * skyline is the skyline of the unioned partials. Dominance is
  * transitive, so a row dominated anywhere is dominated by some local
  * skyline member — the two phases lose nothing. Partial skylines are
  * tiny (the skyline of n uniform points in d dims is O(log^(d-1) n)
  * expected), so the final single-task pass touches a few rows per
  * partition, not the corpus, and the result is a set — identical
  * under any partitioning. Worst case (fully anti-correlated
  * dimensions) the skyline IS the input and the final task scans the
  * output size — no algorithm does better, since that is the answer.
  */
object Skyline {

  /** Pareto-optimal rows of `df`, maximizing every column in `dims`.
    * Dimension columns must be non-null DoubleType (cast upstream);
    * rows with a null dimension are excluded. Rows with identical
    * dimension vectors all survive (dominance requires strictly
    * greater in at least one dimension).
    */
  def skyline(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "at least one skyline dimension")
    dims.foreach { d =>
      require(df.schema(d).dataType == DoubleType,
        s"skyline dim $d must be DoubleType (cast upstream)")
    }
    val idx = dims.map(df.schema.fieldIndex)
    def dominates(a: Row, b: Row): Boolean = {
      var ge = true
      var gt = false
      idx.foreach { i =>
        val x = a.getDouble(i)
        val y = b.getDouble(i)
        if (x < y) ge = false
        if (x > y) gt = true
      }
      ge && gt
    }
    def pass(it: Iterator[Row]): Iterator[Row] = {
      val kept = scala.collection.mutable.ArrayBuffer.empty[Row]
      it.foreach { r =>
        if (!kept.exists(k => dominates(k, r))) {
          val survivors = kept.filterNot(k => dominates(r, k))
          kept.clear()
          kept ++= survivors
          kept += r
        }
      }
      kept.iterator
    }
    val enc = Encoders.row(df.schema)
    val partial = df
      .filter(dims.map(col(_).isNotNull).reduce(_ && _))
      .mapPartitions(pass)(enc)
    partial.repartition(1).mapPartitions(pass)(enc)
  }
}
