package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension builder — turn an append-only
  * change stream into validity-interval history rows, the standard
  * warehouse shape for "what was this attribute at time T" queries
  * (and the batch twin of the reference's lastUpdated-guarded merge,
  * `formats/deltalake.py:187-232`, which keeps only the LATEST version;
  * SCD2 keeps them all).
  *
  * Semantics, per key:
  *   1. order the stream deterministically by (orderCol, tieCol) —
  *      tieCol must make the ordering total or versions are
  *      nondeterministic under shuffle;
  *   2. compress consecutive runs of the same attribute value to one
  *      row (null-safe comparison, so null→null is "no change");
  *   3. each surviving change opens an interval `[valid_from,
  *      valid_to)` closed by the next change; the open interval is the
  *      current version (`is_current`), and `version` numbers the
  *      history 1..n.
  *
  * Scale shape: ONE hash exchange on the key columns; both window
  * passes (the lag compression and the lead/row_number interval
  * assembly) and the run-compression filter reuse it — the filter
  * preserves sort order, so the second pass re-sorts partitions
  * without reshuffling. No driver state, no joins; skew follows the
  * hottest key's CHANGE count, not its raw event count, because
  * compression happens before interval assembly... per-partition both
  * passes stream in sorted order.
  */
object Scd2 {

  def build(
      changes: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "SCD2 needs at least one key column")
    val keys = keyCols.map(col)
    val ordered = Window.partitionBy(keys: _*)
      .orderBy(col(orderCol), col(tieCol))
    val compressed = changes
      .withColumn("__prev", lag(col(valueCol), 1).over(ordered))
      .withColumn("__first", row_number().over(ordered) === 1)
      // null-safe: a genuine null value is a version too, but a
      // null→null run is still one version
      .filter(col("__first") || !(col(valueCol) <=> col("__prev")))
    // the compression filter preserves (orderCol, tieCol) order, so
    // the SAME window spec drives the interval pass — one exchange,
    // one sort, reused
    compressed
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(ordered))
      .withColumn("version", row_number().over(ordered).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keys ++ Seq(col(valueCol), col("valid_from"),
        col("valid_to"), col("version"), col("is_current")): _*)
  }

  /** Incremental SCD2 maintenance: absorb an APPEND-ONLY batch of
    * changes into an existing history (the [[build]] output shape)
    * without rebuilding untouched keys — the nightly-merge form of the
    * operator. Proven equal to a from-scratch [[build]] over the
    * concatenated stream (Scd2Spec + the q153 oracle).
    *
    * Per touched key, the open current row is re-expressed as a seed
    * pseudo-change (its value at its valid_from, tie = Long.MinValue
    * so it sorts before any real change at the same instant) and
    * [[build]] runs over seed ∪ batch only; rebuilt version numbers
    * shift by the key's prior version count. Keys the batch never
    * mentions — including ALL closed rows, whose intervals append-only
    * data can't alter — pass through untouched, so the incremental
    * cost is O(batch + touched keys' current rows), never O(history).
    * A first-ever change for a key simply has no seed (version offset
    * 0).
    *
    * Contract — STRICTLY append-only: every batch row must be
    * at-or-after its key's LAST OBSERVED event (ts, tie) from the
    * stream the history was built over — not merely after the open
    * row's `valid_from`. Run compression discards same-value events,
    * so the history does not even retain the last event's timestamp; a
    * batch row landing between the open row's start and a
    * compressed-away later event silently diverges from a full
    * rebuild. The guarantee must come from the ingest (time-partitioned
    * arrival, as in q153's cutoff split); when late data is possible,
    * rebuild with [[build]]. `tieCol` must be an integral column
    * (enforced) — the seed sentinel is Long.MinValue, and batch ties
    * must stay above it. `validate = true` turns the detectable part
    * of the contract into a loud failure: batch rows strictly before
    * their key's open row, and batch ties equal to the sentinel.
    */
  def applyChanges(
      history: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String,
      valueCol: String,
      validate: Boolean = false): DataFrame = {
    val keys = keyCols.map(col)
    // the seed row encodes its tie as the Long.MinValue sentinel; a
    // non-integral tie column would silently null-cast below and
    // diverge from build() instead of failing here
    val tieType = changes.schema(tieCol).dataType
    require(
      Seq[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(tieType),
      s"tieCol '$tieCol' must be an integral type, got $tieType " +
        "(the open-row seed reserves the Long.MinValue sentinel)")
    if (validate) {
      // Debug gate for the append-only contract: fails loudly on (a) a
      // batch row strictly before its key's OPEN row start — provably
      // out of order — and (b) a batch tie equal to the reserved seed
      // sentinel, which would misorder against the seed at the same
      // instant. A late row landing between valid_from and a
      // compressed-away later event is undetectable from the history
      // alone (run compression discarded that timestamp) — that part
      // of the contract must still come from the ingest. Bounded cost:
      // one semi-join-sized pass, at most 3 example rows collected.
      val viol = changes
        .select(keys ++ Seq(col(orderCol).as("__ts"),
          col(tieCol).cast("long").as("__tie")): _*)
        .join(history.filter(col("is_current"))
            .select(keys :+ col("valid_from"): _*),
          keyCols, "left")
        .filter(col("__ts") < col("valid_from") ||
          col("__tie") === Long.MinValue)
        .limit(3).collect()
      require(viol.isEmpty,
        "applyChanges(validate=true): append-only contract violated — " +
          "batch rows before their key's open row (or tie == " +
          s"Long.MinValue sentinel): ${viol.mkString("; ")}")
    }
    // both small frames (one row per touched/open key) are referenced
    // by several branches below; materialize so `history` — often an
    // expensive pipeline in stateless benches — is evaluated twice
    // (open + closed filters), not once per downstream reference
    val touched = changes.select(keys: _*).distinct().localCheckpoint(true)
    val open = history.filter(col("is_current")).localCheckpoint(true)
    val openTouched = open.join(touched, keyCols, "left_semi")
    val seeds = openTouched.select(
      keys ++ Seq(col("valid_from").as(orderCol),
        lit(Long.MinValue).as(tieCol), col(valueCol)): _*)
    val voff = openTouched.select(
      keys :+ (col("version") - 1).as("__voff"): _*)
    val rebuilt = build(
      seeds.unionByName(
        changes.select(keys ++ Seq(col(orderCol), col(tieCol).cast("long"),
          col(valueCol)): _*)),
      keyCols, orderCol, tieCol, valueCol)
      .join(voff, keyCols, "left")
      .withColumn("version",
        col("version") + coalesce(col("__voff"), lit(0L)))
      .drop("__voff")
    history.filter(!col("is_current"))
      .unionByName(open.join(touched, keyCols, "left_anti"))
      .unionByName(rebuilt)
  }
}
