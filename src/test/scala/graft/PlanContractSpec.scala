package graft

/** Plan CONTRACTS — the 100 TB argument as executable assertions, not
  * prose. Every registered query is executed at sf0.001 (AQE finalizes
  * its physical plan only after execution) and the FINAL plan is
  * checked for the shapes that decide whether the query survives a
  * 100× scale-up:
  *
  *   - no `CartesianProductExec` anywhere: every intentional cross
  *     join in the repo is a broadcast of a scalar/tiny frame (which
  *     plans as BroadcastNestedLoopJoin, not CartesianProduct), so any
  *     CartesianProduct appearing in a future refactor is a regression
  *     that would O(n²)-explode on a cluster — this spec makes it a
  *     test failure instead of a bench surprise;
  *   - headline dim joins actually broadcast;
  *   - headline fact scans actually push their filters into parquet.
  *
  * Keeping these as specs means a plan regression fails `sbt test`
  * the moment it is introduced, rather than surviving until someone
  * reads a bench diff.
  */
class PlanContractSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  /** Execute the query (so AQE commits to its final plan), return the
    * final physical plan string.
    */
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.toRdd.count()
    df.queryExecution.executedPlan.toString
  }

  test("no CartesianProduct survives anywhere in the registered suite") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan =
        try finalPlan(name)
        catch {
          case e: Throwable =>
            fail(s"query $name failed to execute at sf0.001: " +
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in final plans of: ${offenders.mkString(", ")}")
  }

  test("headline dim joins broadcast the small side") {
    // nation/region/customer dims must reach the fact join as
    // broadcast hash joins (static hint or AQE conversion — either is
    // fine, the contract is the final plan)
    for (q <- Seq("q2_join_agg", "q9_shipping_priority")) {
      val p = finalPlan(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q: expected a broadcast hash join in:\n$p")
    }
  }

  test("fact-table filters reach the parquet scan") {
    // the scan node must carry PushedFilters with real predicates —
    // a scan reading everything for a filtered aggregate is the
    // first thing that stops working at 100 TB
    val p = finalPlan("q6_filter_agg")
    val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findFirstIn(p)
    assert(pushed.exists(_.length > "PushedFilters: []".length),
      s"q6_filter_agg: no non-empty PushedFilters in:\n$p")
  }

  test("headline pipelines stay within their shuffle budgets") {
    // every Exchange is a full materialize-and-repartition of its
    // input — at 100 TB each one is the dominant cost, so a refactor
    // that silently adds one must fail the suite the way a
    // CartesianProduct already does. Ceilings are the measured counts
    // of the current plans (sf0.001, AQE-final). Note the LSH/dedup
    // queries run their connected-components rounds EAGERLY during
    // DataFrame construction (localCheckpointed, separate jobs), so
    // this counts the final visible plan — the per-round CC shuffle
    // discipline is pinned by GraphOpsSpec instead.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def countShuffles(n: SparkPlan): Int = {
      val self = n match {
        case _: ShuffleExchangeLike => 1
        case _ => 0
      }
      val kids = n match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(countShuffles).sum
    }
    val budgets = Seq(
      "q38_dedup_corpus" -> 1, // band edges → final component agg
      "q87_dedup_best" -> 1, // same chain, windowed-argmax survivor
      "q135_cross_dedup" -> 5, // probe join + admission + maintenance
      // prefix-token join + pair verification + the DELIBERATE r10
      // respread of the candidate-pair set before the broadcast
      // verification (AQE's byte-based coalescing left the per-pair
      // intersect on one task; the respread exchange carries only
      // 16-byte id pairs)
      "q148_setsim_join" -> 3,
      "q65_asof_join" -> 3, // bucket explode + sort + merge
      // the end-to-end curation chain: stage handoffs are checkpointed
      // (quality/exact-dedup/clean) or RDD-level range-sorts
      // (pack/shard), so the visible plan is the mix dim joins + the
      // final pack⋈shard manifest join; the interior CC/banding
      // discipline is pinned by the q38 budget above
      "q195_curation_e2e" -> 4
    )
    for ((name, budget) <- budgets) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.queryExecution.toRdd.count()
      val got = countShuffles(df.queryExecution.executedPlan)
      assert(got <= budget,
        s"$name: $got shuffle exchanges in the final plan, budget " +
          s"$budget — a new exchange crept in:\n" +
          df.queryExecution.executedPlan.toString)
    }
  }

  test("as-of and interval joins never degrade to nested-loop scans") {
    // the bucketed equi-join re-expression is the whole point of
    // these operators; a planner fallback to BroadcastNestedLoopJoin
    // or CartesianProduct would be the range-explosion they exist to
    // avoid
    for (q <- Seq("q65_asof_join", "q149_interval_overlap")) {
      val p = finalPlan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q: nested-loop join in final plan:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"$q: cartesian product in final plan:\n$p")
    }
  }
}
