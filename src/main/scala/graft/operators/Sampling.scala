package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling via priority sampling (Duffield,
  * Lund, Thorup, "Priority sampling for estimation of arbitrary subset
  * sums", JACM 2007): each row gets priority w/u with u uniform in
  * (0, 1], and the k highest-priority rows form the sample.
  *
  * u is derived from md5(seed:id) — the same keyed-hash family as
  * [[graft.nlp.NoteOps.hashSample]] — so the sample is reproducible
  * across runs AND engines. Only +, −, ×, ÷ touch doubles (no ln/pow:
  * transcendentals are not bit-identical between libm and the JVM, which
  * rules out Efraimidis–Spirakis keys for cross-engine exactness;
  * priority sampling gives the same weighted-inclusion behavior on
  * division alone).
  *
  * Scale shape: priorities are a per-row map pass; the top-k is Spark's
  * TakeOrderedAndProject (per-partition heaps, then a k-row merge) — no
  * global sort, no driver state beyond k rows.
  */
object Sampling {

  /** 52-bit uniform in (0, 1] from md5("seed:id") — 13 hex chars = 52
    * bits, exact in both BIGINT and DOUBLE, so the scaling division by
    * 2^52 is bit-identical everywhere.
    */
  def hashUniform(idCol: Column, seed: String): Column =
    (conv(substring(md5(concat(lit(seed + ":"), idCol.cast("string"))),
      1, 13), 16, 10).cast("long").cast("double") + lit(1.0)) /
      lit(4503599627370496.0) // 2^52

  /** The k rows with highest priority = weight / u. Rows with null or
    * non-positive weight are excluded (their priority is undefined).
    * Ties break on `idCol` ascending for full determinism.
    */
  def prioritySample(
      df: DataFrame,
      idCol: String,
      weightCol: Column,
      k: Int,
      seed: String): DataFrame =
    df.filter(weightCol.isNotNull && weightCol > 0)
      .withColumn("priority",
        weightCol.cast("double") / hashUniform(col(idCol), seed))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)

  /** Curriculum staging: assign every row to one of `nStages` stages by
    * the exact global CDF of `weightCol` (e.g. document length — the
    * short-to-long curriculum recipe). Row's stage =
    * `(#rows with strictly smaller weight) * nStages div N`, so stages
    * are equal-ish sized and rows with EQUAL weight always share a
    * stage (no arbitrary tiebreak inside a weight class).
    *
    * Scale shape: a global `ntile` would funnel the corpus through one
    * window task; instead the CDF is computed on the GROUPED frame —
    * one aggregate over distinct weights, a running sum over that
    * (bounded by the weight vocabulary, like the q21 term window), and
    * one join back on the weight key. Pure integer arithmetic, so the
    * assignment is exact and engine-neutral.
    */
  def curriculumStages(
      df: DataFrame,
      weightCol: String,
      nStages: Int): DataFrame = {
    require(nStages > 0, s"nStages must be positive, got $nStages")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(weightCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    // null weights are OUTSIDE the CDF (their order is engine-specific:
    // Spark sorts nulls first, DuckDB last — counting them would skew
    // every real stage differently per engine) and come back with a
    // null stage via the left join, never silently dropped
    val cdf = df.filter(col(weightCol).isNotNull)
      .groupBy(col(weightCol))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__less", coalesce(sum(col("__cnt")).over(w), lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over())
      .select(col(weightCol),
        expr(s"(__less * $nStages) div __n").as("stage"))
    df.join(cdf, Seq(weightCol), "left")
  }

  /** Leakage-safe train/val/test assignment: the split is drawn from
    * the GROUP column (e.g. a near-dup component id from
    * [[GraphOps.connectedComponents]]), never the row, so duplicates
    * and near-duplicates always land in the same split — the standard
    * guard against train→test contamination that per-row splitting
    * cannot give. Appends a `split` column; pure per-row projection
    * once the group column exists (zero shuffles), deterministic
    * across runs, engines, and cluster sizes.
    *
    * Threshold comparisons happen on the exact 52-bit uniform, so a
    * group is `train` iff u < trainFrac with both sides IEEE-exact —
    * the oracle reproduces the assignment bit-for-bit.
    */
  def splitByGroup(
      df: DataFrame,
      groupCol: String,
      seed: String,
      trainFrac: Double = 0.8,
      valFrac: Double = 0.1): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1,
      s"bad fractions: train=$trainFrac val=$valFrac")
    val u = hashUniform(col(groupCol), seed)
    df.withColumn("split",
      when(u < trainFrac, lit("train"))
        .when(u < trainFrac + valFrac, lit("val"))
        .otherwise(lit("test")))
  }

  /** Per-group cap: keep at most `n` rows of each group, selected in
    * md5(id) order — the "at most N documents per domain/source"
    * balancing policy of pretraining mixes (the cap complement of the
    * fractional [[graft.queries.CorpusQueries]] stratified sample).
    * Deterministic across engines, reruns, and cluster sizes: the
    * keyed hash decides membership, never partition order.
    *
    * Scale shape: one group-key shuffle + a windowed row_number; a
    * group with billions of rows costs its sort, not executor memory
    * (no per-group collection). Rows keep their columns; the survivor
    * flag is `rank_in_group <= n`.
    */
  def capPerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rank_in_group", row_number().over(w).cast("long"))
      .withColumn("kept", col("rank_in_group") <= n)
  }

  /** Training-shard layout — the last mile of a data pipeline: a
    * DETERMINISTIC global shuffle (md5-keyed order, reproducible
    * across runs and engines) plus fixed-size shard assignment, so a
    * trainer's data order is a pure function of (corpus, seed,
    * shardSize) — re-runs, resumes and audits all see byte-identical
    * shard manifests. Appends `shard` and `pos_in_shard`.
    *
    * Scale shape: the global order comes from a range-partitioned sort
    * on the md5 key + `zipWithIndex` (the [[Blocking]] rank
    * discipline — no single-partition window, one extra count job);
    * shard/pos are integer arithmetic on that rank. The md5 key is
    * uniform, so range partitions are balanced no matter how skewed
    * the id space is.
    */
  def trainShards(
      df: DataFrame,
      idCol: String,
      seed: String,
      shardSize: Long): DataFrame = {
    require(shardSize > 0, s"shardSize=$shardSize must be positive")
    val spark = df.sparkSession
    val keyed = df
      .withColumn("__k",
        md5(concat(lit(seed + ":"), col(idCol).cast("string"))))
      // md5 collisions are cryptographically negligible but the id
      // tiebreak makes the order TOTAL by construction, not by luck
      .repartitionByRange(col("__k"), col(idCol))
      .sortWithinPartitions(col("__k"), col(idCol))
    val schema = org.apache.spark.sql.types.StructType(
      keyed.schema.fields :+
        org.apache.spark.sql.types.StructField("__idx",
          org.apache.spark.sql.types.LongType, nullable = false))
    spark.createDataFrame(
        keyed.rdd.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
        }, schema)
      .withColumn("shard", floor(col("__idx") / shardSize).cast("long"))
      .withColumn("pos_in_shard", col("__idx") % shardSize)
      .drop("__k", "__idx")
  }
}
