package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling operator (the Deequ/table-stats shape): one
  * aggregation pass computes per-column row/null/exact-distinct counts
  * and unpivots them to one row per column. Multiple exact
  * count-distincts plan as a single Expand + aggregate — one shuffle of
  * rows×cols, fully map-side-combinable; for cardinalities past exact
  * reach, swap `countDistinct` for `approx_count_distinct` (the q72
  * sketch) column-by-column.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +:
      cols.flatMap(c => Seq(
        count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__dst_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__dst_$c").as("n_distinct"))
    }: _*)
    one
      .select(explode(entries).as("p"))
      .select("p.col_name", "p.n_rows", "p.n_nulls", "p.n_distinct")
  }
}
