package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Joinable-column discovery over a lake's tables (the LSH-Ensemble /
  * data-catalog profiling problem): sketch every candidate column's VALUE
  * SET with k salted minhashes, then estimate pairwise value overlap from
  * matching minima — k tiny rows per column instead of pairwise distinct
  * joins across every column combination.
  *
  * The hash family is the md5-60 convention (`md5(salt||':'||value)`
  * first 15 hex chars as a long), so the sketch — k MIN aggregates per
  * column — and the whole match matrix are ORACLE-EXACT integer results,
  * not just error-bounded estimates.
  *
  * Scale shape: per column one distinct + one explode(k) + partial-agg'd
  * MIN shuffle (k rows out); the pair stage joins sketches on the salt
  * index — |columns|²·k tiny rows worst case, never any value data.
  */
object JoinDiscovery {

  /** md5-60-bit hash of `value` under salt `s`. */
  def saltedHash(value: Column, s: Column): Column =
    conv(substring(md5(concat(s.cast("string"), lit(":"),
      value.cast("string"))), 1, 15), 16, 10).cast("long")

  /** Minhash sketch of one column's distinct values: k rows
    * (name, salt, mh).
    */
  def columnSketch(
      df: DataFrame,
      colName: String,
      name: String,
      k: Int): DataFrame =
    df.select(col(colName).cast("string").as("v"))
      .filter(col("v").isNotNull)
      .distinct()
      .select(col("v"),
        explode(array((0 until k).map(lit): _*)).as("salt"))
      .groupBy("salt")
      .agg(min(saltedHash(col("v"), col("salt"))).as("mh"))
      .select(lit(name).as("name"), col("salt"), col("mh"))

  /** Sketch every (table, column) candidate and count matching minima per
    * column pair: `n_match / k` estimates the value-set Jaccard — the
    * join-discovery score. Output: (col_a, col_b, n_match), col_a < col_b.
    */
  def matchMatrix(
      spark: SparkSession,
      columns: Seq[(String, DataFrame, String)], // (name, table, column)
      k: Int = 32): DataFrame = {
    require(columns.nonEmpty, "no candidate columns")
    require(k >= 1 && k <= 256, s"k out of range: $k")
    val sketches = columns
      .map { case (name, df, c) => columnSketch(df, c, name, k) }
      .reduce(_ unionByName _)
      .localCheckpoint(true) // |columns|·k rows; feeds both join sides
    sketches.as("a")
      .join(sketches.as("b"),
        col("a.salt") === col("b.salt") && col("a.name") < col("b.name"))
      .groupBy(col("a.name").as("col_a"), col("b.name").as("col_b"))
      .agg(sum(when(col("a.mh") === col("b.mh"), 1L).otherwise(0L))
        .as("n_match"))
  }
}
