package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Annotation adjudication — the aggregation stage downstream of the
  * chart-review / Label Studio flow (reference:
  * `chart_review/labelstudio.py` pushes notes out for human labeling;
  * these operators turn the returned label table into training data):
  * majority-vote label resolution and inter-annotator agreement
  * (Cohen's and Fleiss' kappa).
  *
  * Scale shape: everything is grouped integer aggregation with
  * map-side partials — the shuffle after the first aggregate carries
  * (item × label)-cardinality rows, never raw votes; agreement
  * statistics collapse to a handful of scalars. No driver state, no
  * window over raw votes.
  *
  * Numeric parity discipline: both kappas are emitted as an exact
  * INTEGER numerator/denominator pair plus one final double division —
  * the only float op is a single fixed-shape divide, so results are
  * independent of aggregation order and hash-exact against a SQL
  * oracle (the q167 z-test convention, taken further: here even the
  * intermediate products stay integral).
  */
object Annotation {

  /** One deterministic label per (item, annotator): an annotator's
    * duplicate/conflicting votes collapse to the MIN label. Null
    * labels are not votes.
    */
  def resolveVotes(
      df: DataFrame,
      itemCol: String,
      annotatorCol: String,
      labelCol: String): DataFrame =
    df.filter(col(labelCol).isNotNull)
      .groupBy(col(itemCol), col(annotatorCol))
      .agg(min(col(labelCol)).as("label"))

  /** Majority-vote adjudication: per item the winning label (most
    * votes, ties broken to the SMALLEST label), its vote count, and
    * the item's annotator count. Input is one row per (item,
    * annotator) vote — [[resolveVotes]] output. Two grouped
    * aggregates + one item-partitioned window over (item × label)
    * rows (label-cardinality, not vote-cardinality).
    */
  def majorityVote(
      votes: DataFrame,
      itemCol: String,
      labelCol: String): DataFrame = {
    val counts = votes
      .groupBy(col(itemCol), col(labelCol))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col(itemCol))
    counts
      .withColumn("n_annotators", sum(col("votes")).over(w))
      .withColumn("__rn", row_number().over(
        w.orderBy(col("votes").desc, col(labelCol).asc)))
      .filter(col("__rn") === 1)
      .select(col(itemCol), col(labelCol).as("label"),
        col("votes"), col("n_annotators"))
  }

  /** Cohen's kappa for two named annotators over their common items.
    * Exact integer form: with n co-rated items, `agree` exact matches
    * and per-label marginals na_k / nb_k,
    * `kappa = (agree·n − Σ na_k·nb_k) / (n² − Σ na_k·nb_k)` —
    * numerator and denominator are emitted as BIGINTs, kappa as the
    * single double division. Returns one row:
    * (n_items, agree, pe_num, kappa_num, kappa_den, kappa).
    */
  def cohenKappa(
      votes: DataFrame,
      itemCol: String,
      annotatorCol: String,
      labelCol: Column,
      annotatorA: Column,
      annotatorB: Column): DataFrame = {
    val a = votes.filter(col(annotatorCol) === annotatorA)
      .select(col(itemCol).as("__i"), labelCol.as("la"))
    val b = votes.filter(col(annotatorCol) === annotatorB)
      .select(col(itemCol).as("__i"), labelCol.as("lb"))
    // materialized: the pair frame feeds BOTH the agreement aggregate
    // and the marginal products, and its upstream (the vote resolution
    // over the raw annotation stream) is the expensive pass — without
    // this the plan resolves votes twice. Item-cardinality rows only.
    val pairs = a.join(b, "__i").localCheckpoint(true)
    val base = pairs.agg(
      count(lit(1)).as("n_items"),
      sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("agree"))
    // expected agreement numerator Σ_k na_k · nb_k (marginal products)
    val peNum = pairs
      .select(explode(array(
        struct(col("la").as("l"), lit(1L).as("ca"), lit(0L).as("cb")),
        struct(col("lb").as("l"), lit(0L).as("ca"), lit(1L).as("cb"))))
        .as("e"))
      .groupBy(col("e.l"))
      .agg(sum(col("e.ca")).as("na"), sum(col("e.cb")).as("nb"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("pe_num"))
    base.crossJoin(broadcast(peNum)) // one-row scalar frame
      .withColumn("kappa_num",
        col("agree") * col("n_items") - col("pe_num"))
      .withColumn("kappa_den",
        col("n_items") * col("n_items") - col("pe_num"))
      // the statistic is undefined at zero expected disagreement
      // (no items, or every label identical) — NULL, not an ANSI
      // divide-by-zero error
      .withColumn("kappa",
        when(col("kappa_den") === 0L, lit(null).cast("double"))
          .otherwise(col("kappa_num").cast("double") /
            col("kappa_den").cast("double")))
  }

  /** Fleiss' kappa over items rated by EXACTLY `n` annotators (items
    * with any other rating count are excluded — the fixed-n regime the
    * statistic is defined for). Exact integer form: with N qualifying
    * items, S2 = Σ_i Σ_j n_ij² and Se = Σ_j (Σ_i n_ij)²,
    * `kappa = ((S2 − N·n)·N·n − Se·(n−1)) / ((N·n)²·(n−1) − Se·(n−1))`
    * — again one double division at the end. Returns one row:
    * (n_items, s2, se, kappa_num, kappa_den, kappa).
    */
  def fleissKappa(
      votes: DataFrame,
      itemCol: String,
      labelCol: String,
      n: Int): DataFrame = {
    require(n >= 2, s"fleissKappa needs n >= 2 raters, got $n")
    // materialized: cells feeds the qualifying-item filter AND both
    // statistic aggregates (via q) — without this the vote resolution
    // upstream runs once per consumer. (item × label)-cardinality.
    val cells = votes
      .groupBy(col(itemCol), col(labelCol))
      .agg(count(lit(1)).as("nij"))
      .localCheckpoint(true)
    val qualifying = cells
      .groupBy(col(itemCol))
      .agg(sum(col("nij")).as("ni"))
      .filter(col("ni") === n.toLong)
      .select(col(itemCol))
    val q = cells.join(qualifying, itemCol)
    val s2 = q.agg(
      countDistinct(col(itemCol)).as("n_items"),
      coalesce(sum(col("nij") * col("nij")), lit(0L)).as("s2"))
    val se = q.groupBy(col(labelCol))
      .agg(sum(col("nij")).as("colsum"))
      .agg(coalesce(sum(col("colsum") * col("colsum")), lit(0L)).as("se"))
    s2.crossJoin(broadcast(se)) // one-row scalar frame
      .withColumn("__nn", col("n_items") * lit(n.toLong))
      .withColumn("kappa_num",
        (col("s2") - col("__nn")) * col("__nn") -
          col("se") * lit((n - 1).toLong))
      .withColumn("kappa_den",
        col("__nn") * col("__nn") * lit((n - 1).toLong) -
          col("se") * lit((n - 1).toLong))
      // undefined when no items qualify (or chance agreement is
      // total) — NULL instead of an ANSI divide-by-zero error
      .withColumn("kappa",
        when(col("kappa_den") === 0L, lit(null).cast("double"))
          .otherwise(col("kappa_num").cast("double") /
            col("kappa_den").cast("double")))
      .select(col("n_items"), col("s2"), col("se"),
        col("kappa_num"), col("kappa_den"), col("kappa"))
  }
}
