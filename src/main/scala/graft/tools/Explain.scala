package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of registered queries.
  *
  * {{{ sbt "runMain graft.tools.Explain /root/testdata/sf0.01 q165_boilerplate ..." }}}
  *
  * This is how the repo's plan audits are produced (PERF.md): check that
  * filters are pushed (`PushedFilters`), scans prune columns
  * (`ReadSchema`), small sides broadcast (`BroadcastHashJoin` /
  * `BroadcastExchange`), and hot paths stay inside `WholeStageCodegen`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names @ _*) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val selected =
      if (names.isEmpty) graft.SparkEntry.queries.keys.toSeq.sorted
      else names
    selected.foreach { n =>
      println(s"\n===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
  }
}
