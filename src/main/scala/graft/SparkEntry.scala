package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — registry of every oracle-checked query.
  *
  * Each entry exercises one operator family from SURVEY.md §2; the matching
  * DuckDB SQL (when expressible) lives in [[oracleSql]] under the same key
  * with identical output column names (driver compares sorted-by-name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Relational.q1Agg _)
  )

  /** DuckDB-runnable equivalents, same keys + same output column names. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1AggSql
  )
}
