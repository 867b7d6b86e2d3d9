package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered event-sequence analytics: funnels (strictly-ordered step
  * progression per user) and cohort retention. Both are chains of
  * grouped aggregates and equi-joins on the user key — at scale each
  * step is one shuffle on `userCol` (and AQE reuses the partitioning
  * down the chain); nothing collects per-user event lists, so a user
  * with millions of events costs aggregation, not memory.
  */
object EventFlows {

  /** Strict-order funnel: step 1 holds every user with a `steps(0)`
    * event; step k holds users with a `steps(k-1)` event STRICTLY
    * after their step-(k-1) completion time (first-completion
    * semantics: each step's timestamp is the MIN qualifying one).
    * Returns (step, event_type, n_users) — one aggregate per step,
    * unioned into a single job.
    */
  def funnel(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val frames = steps.tail.scanLeft(
      df.filter(col(typeCol) === steps.head)
        .groupBy(col(userCol))
        .agg(min(col(tsCol)).as("__t"))
    ) { (prev, step) =>
      df.filter(col(typeCol) === step)
        .join(prev.select(col(userCol), col("__t").as("__prev")),
          Seq(userCol))
        .filter(col(tsCol) > col("__prev"))
        .groupBy(col(userCol))
        .agg(min(col(tsCol)).as("__t"))
    }
    frames.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("long").as("step"),
          lit(steps(i)).as("event_type"), col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Sequence-model training examples from event logs: for every event
    * with at least `contextLen` predecessors in its user's timeline,
    * emit (context, target) where context is the previous `contextLen`
    * event types oldest-first joined with ">" and target is this
    * event's type — the next-token-prediction example builder for
    * behavioral sequence models (and the event-stream analogue of
    * text-side chunking, q59).
    *
    * Scale shape: one shuffle on the user key; the lags ride a single
    * per-user window sort (all `lag` offsets share one Window frame),
    * and no per-user sequence is ever collected. Ordering ties on
    * equal timestamps break by `idCol` for determinism.
    */
  def sequenceExamples(
      df: DataFrame,
      userCol: String,
      idCol: String,
      typeCol: String,
      tsCol: String,
      contextLen: Int
  ): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive, got $contextLen")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val lags = (contextLen to 1 by -1)
      .map(k => lag(col(typeCol), k).over(w))
    // concat_ws silently DROPS nulls — a null event type inside the
    // window would emit a truncated (wrong-length) context; null-out
    // the whole context instead, which is also exactly what SQL's
    // null-propagating `||` concatenation yields
    val context = when(lags.map(_.isNotNull).reduce(_ && _),
      concat_ws(">", lags: _*))
    df.select(
        col(userCol), col(idCol), col(tsCol),
        context.as("context"),
        col(typeCol).as("target"),
        lags.head.isNotNull.as("__full"))
      // emit only once contextLen predecessors exist (oldest lag set)
      .filter(col("__full"))
      .drop("__full")
  }

  /** Weekly cohort retention: users are cohorted by the week of their
    * FIRST event; for every (cohort, week offset) pair, the count of
    * cohort users active that week. Three aggregates, all keyed on the
    * user id.
    */
  def weeklyRetention(
      df: DataFrame,
      userCol: String,
      tsCol: String
  ): DataFrame = {
    val cohorts = df
      .groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort"))
    val active = df
      .select(col(userCol), date_trunc("week", col(tsCol)).as("__wk"))
      .distinct()
    cohorts
      .join(active, Seq(userCol))
      // DATE, not week-truncated timestamp: DuckDB's date_trunc('week')
      // returns DATE, and matching the type exactly keeps the output
      // comparable byte-for-byte across engines
      .groupBy(to_date(col("cohort")).as("cohort"),
        // both sides are week-truncated, so the day gap is an exact
        // multiple of 7 — the division is engine-neutral
        (datediff(to_date(col("__wk")), to_date(col("cohort"))) / 7)
          .cast("long").as("offset_w"))
      .agg(count(lit(1)).as("n_users"))
  }
}
