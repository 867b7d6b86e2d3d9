package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering — the All-Pairs
  * / PPJoin discipline (Bayardo et al., WWW'07; Xiao et al., WWW'08):
  * find every pair of records whose token-set Jaccard similarity
  * reaches `tau`, EXACTLY, without the all-pairs product and without
  * the false negatives a MinHash-LSH screen
  * ([[graft.operators.NearDedup]]) accepts by design. This is the
  * verification-grade companion: LSH for recall-tolerant screening at
  * extreme scale, prefix filtering when the contract is "every pair ≥
  * τ, no misses".
  *
  * The pruning logic, all token-local:
  *   - order the vocabulary rarest-first (ascending document
  *     frequency, ties by token) — ANY total order preserves
  *     correctness, rarest-first minimizes candidates;
  *   - a record of n tokens only needs its first `n − ⌈τ·n⌉ + 1`
  *     tokens in that order indexed (its "prefix"): two sets with
  *     J ≥ τ overlap in ≥ ⌈τ·n⌉ tokens on each side, so disjoint
  *     prefixes would force all overlap into suffixes shorter than
  *     the overlap — contradiction. Hot tokens (stop words) sort LAST
  *     and almost never enter a prefix, which is what keeps the
  *     candidate join linear-ish while an oracle-style token self-join
  *     would square on the hottest token;
  *   - J ≥ τ also forces τ·max(n_a,n_b) ≤ min(n_a,n_b), pruning
  *     size-mismatched candidates inside the join condition.
  *
  * Scale shape: document-frequency aggregate (map-side combinable) →
  * one token-keyed shuffle to order each record's tokens → prefix
  * explode self-join (rare tokens only) → distinct id pairs → two
  * id-keyed verification joins computing exact intersections. No
  * driver state, no global rank window (the (df, token) struct IS the
  * sort key, so no dense-rank bottleneck), and the quadratic term is
  * Σ prefix-token-frequency², bounded by the rarest-first order.
  */
object SetSimJoin {

  /** All pairs (`id_a` < `id_b`) with Jaccard(`tokensCol`) ≥ `tau`.
    * Output: id_a, id_b, n_a, n_b, inter, jaccard. Token arrays are
    * deduplicated internally; empty-set records never pair.
    */
  def jaccardSelfJoin(
      docs: DataFrame,
      idCol: String,
      tokensCol: String,
      tau: Double): DataFrame = {
    val (sorted0, cand) = prepare(docs, idCol, tokensCol, tau)
    // The verification joins re-attach the token arrays to each pair.
    // `sorted` is a checkpoint RDD, so the planner sees no size stats
    // and defaults to sort-merge — shuffling the candidate pairs AND
    // the arrays twice. Supply the stat it is missing: when the sorted
    // record table measurably fits the session's broadcast threshold
    // (exact row/byte arithmetic off the checkpoint — one cheap count),
    // hint broadcast, eliminating both pair shuffles (guide §3.1). At
    // corpus scale the estimate exceeds the threshold and the
    // sort-merge path stands.
    // SQLConf parses the byte-suffixed forms ("10m", "10485760b") the
    // string conf API hands back raw
    val threshold =
      docs.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val estBytes = sorted0
      .select(coalesce(sum(size(col("stoks")) * 8L + 64L), lit(0L)))
      .head.getLong(0)
    // (A merge-count kernel UDF over value-sorted arrays was tried here
    // and measured 10x SLOWER than ArrayIntersect — per-row array
    // conversion into the UDF dwarfs the hash-set build it saves. The
    // builtin stays.)
    val bcast = threshold > 0 && estBytes < threshold
    val sorted = if (bcast) broadcast(sorted0) else sorted0
    // Broadcast removes the exchanges that would otherwise spread the
    // pair stream, so the per-pair intersect work inherits cand's
    // AQE-coalesced (byte-sized, CPU-blind) partitioning — measured
    // single-task at bench scale. The pair set is tiny by the same
    // proof that gated the broadcast; one cheap exchange restores
    // parallelism. In the sort-merge regime the join shuffles cand
    // itself and this branch never runs.
    val pairs = if (bcast)
      cand.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    else cand
    pairs
      .join(sorted.select(col("id").as("id_a"), col("stoks").as("toks_a"),
        col("n").as("n_a")), "id_a")
      .join(sorted.select(col("id").as("id_b"), col("stoks").as("toks_b"),
        col("n").as("n_b")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select("id_a", "id_b", "n_a", "n_b", "inter", "jaccard")
  }

  /** The candidate (id_a, id_b) frame BEFORE exact verification —
    * exposed because its cardinality is THE quantity prefix filtering
    * bounds (Σ prefix-token df²): scaling measurements report it
    * beside the verified-pair count to show the pruning holding (or
    * not) as the corpus grows.
    */
  def candidatePairs(
      docs: DataFrame,
      idCol: String,
      tokensCol: String,
      tau: Double): DataFrame = prepare(docs, idCol, tokensCol, tau)._2

  /** (rarest-first-sorted records, pruned candidate pairs) — the
    * shared front of [[jaccardSelfJoin]] and [[candidatePairs]].
    */
  private def prepare(
      docs: DataFrame,
      idCol: String,
      tokensCol: String,
      tau: Double): (DataFrame, DataFrame) = {
    require(tau > 0.0 && tau <= 1.0, s"tau=$tau must be in (0, 1]")
    // tokens ride as 64-bit longs from here on: the candidate join
    // keys on 8 bytes instead of a gram string and the verification
    // joins shuffle long arrays instead of ~30-byte strings. An
    // array<long> tokens column (e.g. TextFunctions.md5GramSet64Udf —
    // one kernel pass, gram strings never materialized) passes through
    // as-is; array<string> is hashed here. A 64-bit collision could
    // overstate one intersection — at 10^6 pairs × 10^2 tokens a
    // ~10^-11 event; hashing before the df count can only merge
    // colliding tokens' frequencies, which perturbs the (still total)
    // vocabulary order, never correctness.
    val hashed = docs.schema(tokensCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, _) => col(tokensCol)
      case _ => expr(s"transform($tokensCol, t -> xxhash64(t))")
    }
    // checkpointed: the kernel output (id, token array) feeds the
    // document-frequency aggregate AND the per-record ordering —
    // without materialization the plan tokenizes the corpus twice.
    // (r10 checkpointed the EXPLODED (id, tok) frame instead; the
    // array form stores the same longs minus one id per token, so
    // this is the same safety for strictly fewer checkpoint bytes.)
    val toks = docs
      .select(col(idCol).as("id"), array_distinct(hashed).as("toks"))
      .filter(size(col("toks")) > 0)
      .localCheckpoint(true)
    // vocabulary-sized; checkpointed because it feeds the size gate
    // (count) and then EITHER the driver collect or the ordering join
    val dfreq = toks.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .localCheckpoint(true)
    // rarest-first per-record order. The 1e-9 guard keeps ceil() from
    // rounding τ·n up a ulp past an exact integer (τ=0.5, n=52 → 26,
    // not 27) — a too-long prefix only costs candidates, never
    // correctness, but the guard keeps the plan at its intended size.
    //
    // Two regimes (guide §3.1 broadcast the side that fits / §2.4
    // remove shuffles outright):
    //   - map-side: when the VOCABULARY fits the session broadcast
    //     threshold (~24 bytes per distinct token, measured exactly
    //     from the dfreq count), ship (tok → df) to every task as two
    //     sorted primitive arrays and sort each record's tokens
    //     in place — the corpus-sized occ⋈dfreq token shuffle AND the
    //     corpus-sized groupBy(id) re-assembly shuffle are gone
    //     outright; only the vocab-sized dfreq aggregate shuffles.
    //   - join: above the gate (corpus-scale gram vocabularies), the
    //     r9/r10 shape stands unchanged — token-keyed ordering join +
    //     per-id collect, both partial-agg'd shuffles.
    // The per-record sort key is (df, tok) ascending in both regimes —
    // bit-identical output (SetSimJoinSpec pins equivalence).
    val threshold0 =
      docs.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val vocabSize = dfreq.count()
    val mapSide = threshold0 > 0 && vocabSize * 24L < threshold0
    val sortedBase =
      if (mapSide) {
        val rows = dfreq.collect()
        val tokArr = new Array[Long](rows.length)
        val dfArr = new Array[Long](rows.length)
        val order = rows.sortBy(_.getLong(0))
        var i = 0
        while (i < order.length) {
          tokArr(i) = order(i).getLong(0); dfArr(i) = order(i).getLong(1)
          i += 1
        }
        val bcTok = docs.sparkSession.sparkContext.broadcast(tokArr)
        val bcDf = docs.sparkSession.sparkContext.broadcast(dfArr)
        val sortUdf = udf { (ts: Seq[Long]) =>
          val toksA = bcTok.value; val dfsA = bcDf.value
          val keyed = ts.map { t =>
            val j = java.util.Arrays.binarySearch(toksA, t)
            // every token came from the same corpus pass that built
            // dfreq, so j >= 0 always; guard defensively anyway
            (if (j >= 0) dfsA(j) else 0L, t)
          }.toArray
          scala.util.Sorting.quickSort(keyed) // total order: no equal keys
          keyed.map(_._2)
        }
        toks.select(col("id"), sortUdf(col("toks")).as("stoks"))
      } else {
        val occ = toks.select(col("id"), explode(col("toks")).as("tok"))
        occ.join(dfreq, "tok")
          .groupBy("id")
          .agg(sort_array(collect_list(struct(col("df"), col("tok"))))
            .as("skeys"))
          .select(col("id"),
            expr("transform(skeys, k -> k.tok)").as("stoks"))
      }
    // checkpointed because the frame feeds the prefix explode AND both
    // verification joins (3 plan references), and the projection is
    // primitive/kernel-only (codegen-safe to materialize)
    val sorted = sortedBase
      .withColumn("n", size(col("stoks")).cast("long"))
      .withColumn("plen",
        (col("n") - ceil(lit(tau) * col("n") - lit(1e-9)) + 1).cast("int"))
      .localCheckpoint(true)
    val prefixes = sorted.select(Seq(col("id"), col("n")) :+
      posexplode(expr("slice(stoks, 1, plen)")).as(Seq("pos", "tok")): _*)
    // PPJoin positional bound: at a pair's FIRST shared token (global
    // order), every shared token sits at or after it in both lists, so
    // overlap ≤ min(n − pos) there; requiring that bound ≥ the overlap
    // threshold α = ⌈τ/(1+τ)·(n_a+n_b)⌉ prunes the candidate at its
    // first shared token without ever pruning a true pair (later
    // shared tokens may fail the bound — harmless, the pair already
    // survived once; ε keeps α safe-small on exact boundaries).
    val alpha =
      ceil(lit(tau / (1 + tau)) * (col("a.n") + col("b.n")) - lit(1e-9))
    val cand = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          // size filter: τ·max ≤ min (ε-guarded — pruning must never
          // fire on an exact boundary)
          col("a.n").cast("double") >= lit(tau) * col("b.n") - lit(1e-9) &&
          col("b.n").cast("double") >= lit(tau) * col("a.n") - lit(1e-9) &&
          least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >= alpha)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    (sorted, cand)
  }
}
