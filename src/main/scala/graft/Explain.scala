package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of each (or one
  * named) registered query so scan pruning (`PushedFilters`,
  * `ReadSchema`), broadcast joins, and WholeStageCodegen spans can be
  * inspected. `runMain graft.Explain [queryName] [sfDir]`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.get("graft-explain")
    val targets =
      if (args.nonEmpty) SparkEntry.queries.filter(_._1 == args(0))
      else SparkEntry.queries
    targets.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      println(s"\n========== $name ==========")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: $e") }
    }
    spark.stop()
  }
}
