package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching for entity resolution: canonicalize to the
  * distinct-key vocabulary first, then pair only within blocking-key
  * groups, scoring with codegen'd `levenshtein`.
  *
  * Scale shape: the groupBy collapses the corpus to its distinct-name
  * vocabulary (one shuffle, map-side combinable), so the quadratic
  * stage is |block|² over VOCABULARY entries, never over rows — the
  * standard blocking discipline of record-linkage systems. A pathological
  * block (every name sharing one key) is still vocabulary-bounded, and
  * the per-row corpus counts ride along as aggregates.
  */
object FuzzyJoin {

  /** Distinct-value pairs of `nameCol` that share `blockKey(name)` and
    * are within `maxDist` edit distance, with per-side corpus counts.
    * Pairs are emitted once (`name_a < name_b`).
    */
  def blockedNamePairs(
      df: DataFrame,
      nameCol: String,
      blockKey: Column => Column,
      maxDist: Int): DataFrame = {
    val names = df
      .groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_rows"))
    val a = names
      .select(col("name").as("name_a"), col("n_rows").as("n_a"))
      .withColumn("blk", blockKey(col("name_a")))
    val b = names
      .select(col("name").as("name_b"), col("n_rows").as("n_b"))
      .withColumn("blk", blockKey(col("name_b")))
    a.join(b, "blk")
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist", "n_a", "n_b")
  }
}
