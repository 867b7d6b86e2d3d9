package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing — the concat-and-chunk step that turns a tokenized
  * corpus into fixed-length training sequences (every causal-LM data
  * pipeline ends with it: docs are laid out in a deterministic order,
  * an EOS marker is appended to each, the token stream is cut every
  * `seqLen` tokens, and a document "crosses" every cut that falls
  * inside it). The reference's pipeline stops at note batches
  * (etl/tasks/nlp/… assemble per-note payloads); this operator is the
  * corpus-scale generalization a training pipeline needs.
  *
  * Determinism: layout order is md5(seed:id) with an id tiebreak — the
  * [[Sampling.trainShards]] discipline — so the packed layout is a pure
  * function of (corpus, seed, seqLen, eosTokens): re-runs, resumes and
  * cross-engine audits see identical spans.
  *
  * Scale shape: the global token offset is a PREFIX SUM over the
  * deterministic order. A window over that order would funnel the
  * corpus through one task (the known flaw of per-partition windows
  * when one partition dominates), so instead: range-partition on the
  * uniform md5 key (balanced regardless of id skew), sort within
  * partitions, then the classic two-pass distributed scan — job 1
  * reduces each partition to ONE per-partition token total (driver
  * state = #partitions longs), job 2 re-walks each partition carrying
  * its broadcast base offset. The frame is localCheckpointed between
  * the passes so the sort is paid once.
  */
object Packing {

  /** Lay out `df` in md5(seed:id) order, append `eosTokens` to each
    * doc's `tokCol` count, and cut the concatenated stream into
    * `seqLen`-token sequences. Appends:
    *  - `tok_offset` — the doc's first token's global offset;
    *  - `seq_start` / `seq_end` — first/last sequence index the doc
    *    (including its EOS trailer) occupies;
    *  - `n_seqs` — sequences touched (0 for a zero-width doc, i.e.
    *    0 tokens AND eosTokens == 0; such a doc still carries its
    *    boundary offset, with seq_end == seq_start by convention).
    *
    * Null/negative `tokCol` counts as 0 tokens.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokCol: String,
      seqLen: Long,
      seed: String,
      eosTokens: Long = 1L): DataFrame = {
    require(seqLen > 0, s"seqLen=$seqLen must be positive")
    require(eosTokens >= 0, s"eosTokens=$eosTokens must be non-negative")
    val spark = df.sparkSession
    val keyed = df
      .withColumn("__w",
        greatest(coalesce(col(tokCol).cast("long"), lit(0L)), lit(0L)) +
          lit(eosTokens))
      .withColumn("__k",
        md5(concat(lit(seed + ":"), col(idCol).cast("string"))))
      .repartitionByRange(col("__k"), col(idCol))
      .sortWithinPartitions(col("__k"), col(idCol))
      // read twice below (partition totals, then the offset walk); the
      // checkpoint pays the sort once and pins the row order the two
      // passes must agree on
      .localCheckpoint(true)
    val wIdx = keyed.schema.fieldIndex("__w")
    val rdd = keyed.rdd
    // pass 1: one long per partition — the only driver state
    val partTotals = rdd
      .mapPartitionsWithIndex((i, it) =>
        Iterator((i, it.foldLeft(0L)((a, r) => a + r.getLong(wIdx)))))
      .collect().sortBy(_._1).map(_._2)
    val bases = partTotals.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(bases)
    val outSchema = StructType(
      keyed.schema.fields :+ StructField("tok_offset", LongType, false))
    // pass 2: each partition walks its rows from its base offset
    val withOff = spark.createDataFrame(
      rdd.mapPartitionsWithIndex { (i, it) =>
        var off = bc.value(i)
        it.map { r =>
          val out = Row.fromSeq(r.toSeq :+ off)
          off += r.getLong(wIdx)
          out
        }
      }, outSchema)
    withOff
      .withColumn("seq_start", expr(s"tok_offset div ${seqLen}L"))
      .withColumn("seq_end",
        when(col("__w") > 0,
          expr(s"(tok_offset + __w - 1) div ${seqLen}L"))
          .otherwise(col("seq_start")))
      .withColumn("n_seqs",
        when(col("__w") > 0, col("seq_end") - col("seq_start") + 1)
          .otherwise(lit(0L)))
      .drop("__w", "__k")
  }

  /** Per-sequence roll-up of [[packSequences]]' spans: how many docs
    * touch each sequence and how many END inside it (the attention-mask
    * reset points a packed-training loader needs per sequence). A doc
    * spanning s sequences contributes s exploded rows — the fan-out is
    * ceil(w / seqLen) + 1 per doc, bounded and map-side; the only
    * shuffle is the final groupBy(seq).
    */
  def sequenceStats(packed: DataFrame): DataFrame =
    packed
      .filter(col("n_seqs") > 0)
      .select(col("seq_end"),
        explode(sequence(col("seq_start"), col("seq_end"))).as("seq"))
      .groupBy("seq")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("seq") === col("seq_end"), 1L).otherwise(0L))
          .as("n_doc_ends"))
}
