package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the reference lacks but a large-scale event/training
  * pipeline needs: as-of (latest-at-or-before) enrichment and bounded
  * time-range aggregation. Both are built so NO range-explosion join
  * ever materializes:
  *
  *  - [[asOfJoin]] is one shuffle on the key + one window pass over the
  *    time-sorted union — the classic distributed as-of shape. A naive
  *    `l JOIN r ON key AND r.ts <= l.ts` + max-pick would generate
  *    |matches| intermediate rows (quadratic on active keys); the union
  *    form is linear and AQE-friendly.
  *  - [[slidingCountJoin]] buckets the time axis at the window width, so
  *    each probe row meets only candidates from its own and the previous
  *    bucket (a banded band-join, cost ∝ bucket occupancy, never |l|×|r|
  *    per key).
  */
object TemporalJoins {

  /** Backward as-of join: every `left` row picks up the latest `right`
    * row with `right.tsCol <= left.tsCol` for the same key, as a
    * nullable struct column `asof` (null when no prior right row
    * exists — LEFT ASOF semantics).
    *
    * Equal timestamps count as "at or before" (right sorts first), like
    * DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`. If several right rows
    * share (key, ts) the winner is deterministic but arbitrary (last in
    * struct sort order); feed pre-deduped right frames when that
    * matters.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String
  ): DataFrame = {
    val l = left.select(
      col(keyCol).as("__key"),
      col(leftTsCol).as("__ts"),
      struct(left.columns.map(col): _*).as("__l"))
    val r = right.select(
      col(keyCol).as("__key"),
      col(rightTsCol).as("__ts"),
      struct(right.columns.map(col): _*).as("__r"))
    // allowMissingColumns fills the other side's struct with null —
    // the union stays two narrow struct columns, no schema surgery
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal ts so "<=" matches;
    // __r as the final key makes equal-(key,ts) right rows deterministic
    val w = Window
      .partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__l").isNotNull.cast("int"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__l").isNotNull)
      .select(col("__l.*"), col("asof"))
  }

  /** Hot-key-safe variant of [[asOfJoin]]: identical semantics (the spec
    * proves result equality, ties included), but the heavy window runs
    * per (key, time-bucket) instead of per key, so one pathological key
    * with millions of rows parallelizes across its buckets instead of
    * serializing into a single window task.
    *
    * Shape: (1) one aggregate over the unioned sides keyed on
    * (key, bucket) yields both the bucket set and each bucket's LAST
    * right row; (2) a per-key running `last` over that bucket-level
    * frame (rows per key = #buckets, bounded by time-range/bucketMicros,
    * independent of data volume) produces each bucket's carry-in seed —
    * the latest right row from any strictly earlier bucket; (3) seeds are
    * unioned back as synthetic right rows (their real timestamp sorts
    * them before everything in the bucket) and the [[asOfJoin]] window
    * runs partitioned by (key, bucket).
    *
    * Null timestamps are not supported (they are on neither side of any
    * bucket's order). Pick `bucketMicros` so a bucket's rows fit a task
    * comfortably; correctness does not depend on the choice.
    */
  def asOfJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      bucketMicros: Long
  ): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    val l = left.select(
      col(keyCol).as("__key"),
      unix_micros(col(leftTsCol)).as("__tu"),
      struct(left.columns.map(col): _*).as("__l"))
    val r = right.select(
      col(keyCol).as("__key"),
      unix_micros(col(rightTsCol)).as("__tu"),
      struct(right.columns.map(col): _*).as("__r"))
    // `u` is consumed twice (bucket aggregate + final window). That is
    // deliberate re-evaluation, NOT a candidate for checkpointing: the
    // aggregate branch prunes to (key, ts, right-struct) at the scan,
    // while a checkpoint would materialize BOTH sides' full payload
    // structs — measured 3× slower at sf0.1 (0.2s → 0.6s) and strictly
    // more I/O at any scale.
    val u = l.unionByName(r, allowMissingColumns = true)
      // integer `div`, not `/` — double division loses precision on
      // large epoch values
      .withColumn("__bucket", expr(s"__tu div ${bucketMicros}L"))
    // One aggregate: every (key, bucket) that exists on either side,
    // with the bucket's last right row (max over (ts, __r) — the same
    // equal-ts winner [[asOfJoin]]'s window order picks); null when the
    // bucket holds only left rows.
    val bucketLast = u
      .groupBy(col("__key"), col("__bucket"))
      .agg(max(when(col("__r").isNotNull,
        struct(col("__tu"), col("__r")))).as("__m"))
    // Carry-in per bucket: latest right row from STRICTLY earlier
    // buckets. Window is per key, but over bucket-level rows only.
    val carryW = Window.partitionBy(col("__key")).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val seeds = bucketLast
      .withColumn("__seed", last(col("__m"), ignoreNulls = true).over(carryW))
      .filter(col("__seed").isNotNull)
      .select(col("__key"), col("__seed.__tu").as("__tu"),
        lit(null).cast(l.schema("__l").dataType).as("__l"),
        col("__seed.__r").as("__r"), col("__bucket"))
    // Seed timestamps come from earlier buckets, so they sort before
    // every in-bucket row; equal-ts ordering within the bucket is
    // exactly [[asOfJoin]]'s.
    val w = Window
      .partitionBy(col("__key"), col("__bucket"))
      .orderBy(col("__tu"), col("__l").isNotNull.cast("int"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.unionByName(seeds)
      .withColumn("asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__l").isNotNull)
      .select(col("__l.*"), col("asof"))
  }

  /** Per-probe-row count/sum of `candidates` rows with the same key in
    * the half-open window `[probe.ts - windowMicros, probe.ts)`.
    *
    * Implementation: candidates are bucketed at the window width; each
    * probe row is exploded into its own and the previous bucket, so a
    * candidate can meet a probe row at most once and the join degree is
    * bounded by per-bucket occupancy. Timestamps compare as epoch
    * microseconds (`unix_micros`) — engine-neutral integer arithmetic.
    *
    * Output: all probe columns + `n_in_window` (count) + `sum_value`
    * (sum of `valueCol`, 0.0 when empty). Probe rows must be unique
    * (the regroup after the bucket explode keys on them — duplicates
    * would collapse into one row with summed counts); carry a unique id
    * column when in doubt.
    */
  def slidingCountJoin(
      probe: DataFrame,
      candidates: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      windowMicros: Long
  ): DataFrame =
    bucketedWindowJoin(probe, candidates, keyCol, tsCol, windowMicros,
      Seq(col(valueCol).as("__cv")))
      .groupBy(probe.columns.map(col) :+ col("__pu"): _*)
      .agg(
        // count matched ROWS (__cu is non-null exactly when a candidate
        // matched) — counting __cv would silently skip candidates whose
        // value is null, diverging from the oracle's COUNT of joined rows
        count(col("__cu")).as("n_in_window"),
        coalesce(sum(col("__cv")), lit(0.0)).as("sum_value"))
      .drop("__pu")

  /** Shared scaffolding of the bucketed band joins: candidates keyed and
    * bucketed at the window width (integer `div`, not `/` — double
    * division would lose precision on large epoch values), probe rows
    * exploded into their own and the previous bucket, left-joined on
    * (bucket, key) with the half-open `[ts - W, ts)` residual. Returns
    * the joined frame with probe columns + `__pu` + `__cu` + the given
    * candidate payload columns (null when unmatched).
    */
  private def bucketedWindowJoin(
      probe: DataFrame,
      candidates: DataFrame,
      keyCol: String,
      tsCol: String,
      windowMicros: Long,
      payload: Seq[org.apache.spark.sql.Column]
  ): DataFrame = {
    val cand = candidates.select(
      Seq(
        col(keyCol).as("__key"),
        unix_micros(col(tsCol)).as("__cu"),
        expr(s"unix_micros($tsCol) div ${windowMicros}L").as("__bucket")
      ) ++ payload: _*)
    val probed = probe
      .withColumn("__pu", unix_micros(col(tsCol)))
      .withColumn("__bucket",
        explode(array(expr(s"__pu div ${windowMicros}L") - 1,
          expr(s"__pu div ${windowMicros}L"))))
    probed
      .join(cand,
        probed("__bucket") === cand("__bucket") &&
          col(keyCol) === col("__key") &&
          col("__cu") >= col("__pu") - windowMicros &&
          col("__cu") < col("__pu"),
        "left")
  }

  /** Linear multi-touch attribution: every `candidates` row in a probe
    * row's window `[ts - W, ts)` shares the probe's value equally —
    * credit = value / n_in_window — the standard equal-weight
    * alternative to [[firstTouchJoin]] (time-decay weighting needs
    * `exp`, which is not cross-engine bit-stable; linear is a single
    * exact IEEE division). Same bucketed band-join shape; the per-probe
    * window count runs over the matched pairs only.
    *
    * Output: one row per (probe, candidate) match — `probeIdCol`,
    * `touch_<idCol>`, `n_in_window`, `credit`. Probes with an empty
    * window emit nothing (no credit to assign). Probe ids must be
    * unique.
    */
  def linearAttributionJoin(
      probe: DataFrame,
      candidates: DataFrame,
      keyCol: String,
      tsCol: String,
      probeIdCol: String,
      idCol: String,
      valueCol: String,
      windowMicros: Long
  ): DataFrame = {
    val w = Window.partitionBy(col(probeIdCol))
    bucketedWindowJoin(probe, candidates, keyCol, tsCol, windowMicros,
      Seq(col(idCol).as("__cid")))
      .filter(col("__cu").isNotNull)
      .withColumn("n_in_window", count(lit(1)).over(w))
      .select(col(probeIdCol), col("__cid").as(s"touch_$idCol"),
        col("n_in_window"),
        (col(valueCol).cast("double") /
          col("n_in_window").cast("double")).as("credit"))
  }

  /** First-touch attribution join: for every probe row, the EARLIEST
    * `candidates` row with the same key in `[probe.ts - windowMicros,
    * probe.ts)` — null columns when the window is empty. Same bucketed
    * band-join shape as [[slidingCountJoin]] (join degree bounded by
    * bucket occupancy, never per-key quadratic — the batch-at-scale
    * counterpart of a stream-stream interval join, which bounds the
    * same work with watermark state instead).
    *
    * Output: probe columns + `touch_<idCol>` + `touch_micros` (epoch µs
    * of the matched row). Probe rows must be unique, as in
    * [[slidingCountJoin]].
    */
  def firstTouchJoin(
      probe: DataFrame,
      candidates: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      windowMicros: Long
  ): DataFrame =
    bucketedWindowJoin(probe, candidates, keyCol, tsCol, windowMicros,
      Seq(col(idCol).as("__cid")))
      .groupBy(probe.columns.map(col) :+ col("__pu"): _*)
      // min over (ts, id) structs skips nulls, so an empty window
      // yields a null struct rather than a null-field winner
      .agg(min(when(col("__cu").isNotNull,
        struct(col("__cu"), col("__cid")))).as("__m"))
      .select(probe.columns.map(col) :+
        col("__m.__cid").as(s"touch_$idCol") :+
        col("__m.__cu").as("touch_micros"): _*)

  /** UNKEYED interval overlap join: every (left, right) pair whose
    * half-open micro-epoch intervals `[start, end)` overlap — the
    * general range join (incident windows × activity windows, ad
    * flights × sessions) where no equi-key exists to hash on, which is
    * exactly the case Spark's planner degrades to a broadcast
    * nested-loop or cartesian product.
    *
    * Shape: each interval explodes into the time buckets it covers
    * (`start div W .. (end-1) div W`), the join runs as an EQUI-join
    * on the bucket id, and each overlapping pair is emitted exactly
    * once WITHOUT a distinct shuffle: the join condition additionally
    * pins the bucket to `greatest(starts) div W` — the first bucket
    * both intervals cover — so duplicate bucket collisions fail the
    * condition instead of needing dedup. Cost is Σ per-bucket
    * |left|·|right|, i.e. timeline density squared per bucket width,
    * never |left|·|right| overall.
    *
    * Pick `bucketMicros` ≥ the typical interval length: the explode
    * factor is len/W + 1 per row. All arithmetic is integer `div` on
    * non-negative epochs (pre-1970 intervals would need floor-div).
    * Empty intervals (end ≤ start) are dropped — `sequence()` would
    * otherwise step BACKWARD and fabricate buckets.
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      bucketMicros: Long
  ): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros=$bucketMicros must be positive")
    // identifier safety: column names are always backtick-quoted (with
    // embedded backticks doubled) before entering expr() SQL — a name
    // like "end ts" or "a-b" must parse, not break sequence()/greatest()
    def q(name: String): String = "`" + name.replace("`", "``") + "`"
    // the working bucket column must not shadow a real input column:
    // pick the first __bk/__bk_/__bk__/... absent from BOTH schemas
    val taken = (left.columns ++ right.columns).toSet
    val bk = Iterator.iterate("__bk")(_ + "_").dropWhile(taken).next()
    def buckets(df: DataFrame, s: String, e: String) = df
      .filter(col(e) > col(s))
      .withColumn(bk, explode(expr(
        s"sequence(${q(s)} div ${bucketMicros}L, " +
          s"(${q(e)} - 1) div ${bucketMicros}L)")))
    val lb = buckets(left, leftStart, leftEnd).as("l")
    val rb = buckets(right, rightStart, rightEnd).as("r")
    // all ts references alias-qualified: the two frames may legally use
    // the SAME column names for their bounds (unqualified refs would be
    // ambiguous the moment leftStart == rightStart)
    val (ls, le) = (col(s"l.$leftStart"), col(s"l.$leftEnd"))
    val (rs, re) = (col(s"r.$rightStart"), col(s"r.$rightEnd"))
    lb.join(rb,
        col(s"l.$bk") === col(s"r.$bk") &&
          ls < re && rs < le &&
          col(s"l.$bk") ===
            expr(s"greatest(l.${q(leftStart)}, r.${q(rightStart)}) " +
              s"div ${bucketMicros}L"))
      .withColumn("overlap_micros", least(le, re) - greatest(ls, rs))
      .drop(bk)
  }
}
