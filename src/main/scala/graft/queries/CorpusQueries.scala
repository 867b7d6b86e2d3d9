package graft.queries

import graft.functions.TextFunctions._
import graft.operators.PortableHll
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level training-data operators beyond the near-dup family
  * (SURVEY §7.5): exact substring-duplication profiling, deterministic
  * stratified sampling, and per-language n-gram vocabularies.
  */
object CorpusQueries {

  /** q68 — exact substring-duplication profile (the Lee et al.
    * "Deduplicating Training Data Makes Language Models Better" signal):
    * hash every positional word-5-gram, count occurrences corpus-wide,
    * and report per document how much of it is covered by 5-grams that
    * appear elsewhere too. Two aggregations, both map-side-combinable:
    * (doc, gram)-local counts first (the explode never leaves the map
    * side), then the global gram frequency joined back on the narrow
    * hash. At 100 TB the (doc,gram) pre-aggregation is what keeps the
    * global count shuffle proportional to distinct-grams-per-doc, not
    * total tokens.
    */
  def qSubstrDedup(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(md5Grams60Udf(col("text"), lit(5))).as("h"))
    // per-(doc, gram) occurrence counts — partial agg combines map-side
    val local = grams.groupBy("doc_id", "h")
      .agg(count(lit(1)).as("n_local"))
      .localCheckpoint(true) // referenced twice below (global + join)
    val global = local.groupBy("h")
      .agg(sum("n_local").as("n_global"))
    local
      .join(global, "h")
      .groupBy("doc_id")
      .agg(
        sum("n_local").as("n_grams"),
        sum(when(col("n_global") > 1, col("n_local")).otherwise(0L))
          .as("n_dup_grams"))
      .withColumn("dup_ratio",
        col("n_dup_grams").cast("double") / col("n_grams").cast("double"))
  }

  val qSubstrDedupSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, greatest(len(t) - 4, 1) + 1),
      |      i -> array_to_string(t[i:i+4], ' '))) AS gram
      |  FROM toks),
      |h AS (
      |  SELECT doc_id, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
      |  FROM g),
      |local AS (
      |  SELECT doc_id, h, COUNT(*) AS n_local FROM h GROUP BY doc_id, h),
      |global AS (
      |  SELECT h, SUM(n_local) AS n_global FROM local GROUP BY h)
      |SELECT l.doc_id,
      |  CAST(SUM(l.n_local) AS BIGINT) AS n_grams,
      |  CAST(SUM(CASE WHEN g.n_global > 1 THEN l.n_local ELSE 0 END)
      |    AS BIGINT) AS n_dup_grams,
      |  CAST(SUM(CASE WHEN g.n_global > 1 THEN l.n_local ELSE 0 END)
      |      AS DOUBLE) / CAST(SUM(l.n_local) AS DOUBLE) AS dup_ratio
      |FROM local l JOIN global g ON l.h = g.h
      |GROUP BY l.doc_id""".stripMargin

  /** q69 — deterministic stratified sampling: keep ceil(10%) of every
    * language stratum, chosen by md5(doc_id) order — reproducible
    * across engines, reruns, and cluster sizes (no RNG state), the
    * property a training pipeline needs for auditable subsampling.
    * One window shuffle on the stratum key.
    */
  def qStratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val byHash = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")))
    val n = Window.partitionBy("lang")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .withColumn("rn", row_number().over(byHash))
      .withColumn("n", count(lit(1)).over(n))
      .filter(col("rn") <= ceil(col("n") * 0.1))
      .select(col("doc_id"), col("lang"), col("rn").cast("long").as("rank"))
  }

  val qStratifiedSampleSql: String =
    """WITH ranked AS (
      |  SELECT doc_id, lang,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM documents)
      |SELECT doc_id, lang, CAST(rn AS BIGINT) AS rank
      |FROM ranked WHERE rn <= CEIL(n * 0.1)""".stripMargin

  /** q70 — per-language trigram vocabulary: global trigram counts, then
    * the top 3 per language by (count desc, gram asc). The rank filter
    * is pushed below the final sort by Spark's WindowGroupLimit, so
    * only ~3·|langs| rows survive the rank exchange.
    */
  def qLangTrigrams(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(col("lang"),
        explode(wordNgramsKernel(col("text"), 3)).as("gram"))
      .groupBy("lang", "gram")
      .agg(count(lit(1)).as("cnt"))
    val rank = Window.partitionBy("lang")
      .orderBy(col("cnt").desc, col("gram").asc)
    counts
      .withColumn("rk", row_number().over(rank))
      .filter(col("rk") <= 3)
      .select(col("lang"), col("gram"), col("cnt"),
        col("rk").cast("long").as("rank"))
  }

  /** q72 — sketched gram cardinality per source: HyperLogLog++
    * (`approx_count_distinct`, 2% rsd) over the md5-60 5-gram stream —
    * the sketch that replaces an exact distinct-count shuffle when the
    * corpus no longer fits one (mergeable across partitions, fixed
    * memory). Engine sketches differ, so no value oracle: the driver
    * records a rows-only check and CorpusQueriesSpec pins the relative
    * error against the exact count (≤5%).
    */
  def qSketchDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        explode(md5Grams60Udf(col("text"), lit(5))).as("h"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_grams"),
        approx_count_distinct(col("h"), rsd = 0.02)
          .as("approx_distinct_grams"))
      .orderBy("source")

  /** q74 — compression-ratio quality gate: per-source mean deflate
    * ratio and the count of high-redundancy documents (ratio < 0.3).
    * Pure projection + one partial-agg shuffle — embarrassingly
    * parallel at any corpus size. Engine-internal codec → rows-only
    * gate; the signal's direction is pinned in CorpusQueriesSpec.
    */
  def qCompressRatio(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), deflateRatioUdf(col("text")).as("ratio"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        avg(col("ratio")).as("mean_ratio"),
        sum(when(col("ratio") < 0.3, 1L).otherwise(0L))
          .as("n_high_redundancy"))
      .orderBy("source")

  /** q183 — portable-HLL register table ([[PortableHll.sketch]]) per
    * source over the md5-60 5-gram stream: the sketch STATE is pure
    * integer arithmetic on the hash, so unlike q72's engine-internal
    * `approx_count_distinct` the whole machinery (hash → register
    * split → rank → max-merge) is oracle hash-exact; the float
    * estimator half stays spec-pinned (HllSpec). Shuffle is capped at
    * |sources| × 256 rows by map-side partials — corpus-size-free.
    */
  def qHllRegisters(spark: SparkSession, dir: String): DataFrame =
    PortableHll.sketch(
      Tables.documents(spark, dir)
        .select(col("source"),
          explode(md5Grams60Udf(col("text"), lit(5))).as("h")),
      Seq("source"), col("h"), p = 8)

  /** q194 — HLL estimator ACCURACY gate (the recall-gate pattern from
    * q171/q172 applied to the estimator half that q183/q184 leave
    * spec-pinned): per source, the [[PortableHll.estimate]] of the
    * md5-60 5-gram stream must land within 3× the theoretical rsd
    * (1.04/√256 ≈ 6.5%) of the EXACT distinct count. Spark emits the
    * integer exact count and the boolean verdict; the oracle
    * recomputes the exact count and pins the verdict TRUE — the
    * estimate is deterministic (fixed hash family), so if the
    * estimator ever degrades this row goes red at the driver, not
    * just in a spec. The exact countDistinct is gate-scale work by
    * design (the production path uses the sketch precisely to avoid
    * it).
    */
  def qHllAccuracy(spark: SparkSession, dir: String): DataFrame = {
    val p = 8
    val bound = 3.0 * 1.04 / math.sqrt((1 << p).toDouble)
    val grams = Tables.documents(spark, dir)
      .select(col("source"),
        explode(md5Grams60Udf(col("text"), lit(5))).as("h"))
      .localCheckpoint(true) // feeds the sketch AND the exact count
    val est = PortableHll.estimate(
      PortableHll.sketch(grams, Seq("source"), col("h"), p),
      Seq("source"), p)
    val exact = grams.groupBy("source")
      .agg(countDistinct(col("h")).as("exact_distinct"))
    est.join(exact, "source")
      .select(col("source"), col("exact_distinct"),
        (abs(col("estimate") - col("exact_distinct").cast("double")) <=
          lit(bound) * col("exact_distinct").cast("double"))
          .as("within_bound"))
  }

  val qHllAccuracySql: String =
    """WITH toks AS (
      |  SELECT source, string_split_regex(trim(text), '\s+') AS t
      |  FROM documents),
      |g AS (
      |  SELECT source,
      |    unnest(list_transform(range(1, greatest(len(t) - 4, 1) + 1),
      |      i -> array_to_string(t[i:i+4], ' '))) AS gram
      |  FROM toks),
      |h AS (
      |  SELECT source, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
      |  FROM g)
      |SELECT source, CAST(COUNT(DISTINCT h) AS BIGINT) AS exact_distinct,
      |  TRUE AS within_bound
      |FROM h GROUP BY source""".stripMargin

  private val hllRemSqlCte: String =
    """WITH toks AS (
      |  SELECT source, string_split_regex(trim(text), '\s+') AS t
      |  FROM documents),
      |g AS (
      |  SELECT source,
      |    unnest(list_transform(range(1, greatest(len(t) - 4, 1) + 1),
      |      i -> array_to_string(t[i:i+4], ' '))) AS gram
      |  FROM toks),
      |h AS (
      |  SELECT source, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
      |  FROM g),
      |rr AS (
      |  SELECT source, h >> 52 AS register,
      |    h % 4503599627370496 AS rem
      |  FROM h)""".stripMargin

  val qHllRegistersSql: String =
    hllRemSqlCte + "\n" +
      """SELECT source, register,
        |  CAST(MAX(CASE WHEN rem = 0 THEN 53
        |                ELSE 53 - length(bin(rem)) END) AS BIGINT)
        |    AS max_rho
        |FROM rr GROUP BY source, register""".stripMargin

  /** q184 — HLL merge identity ([[PortableHll.merge]]): the global
    * register table obtained by MERGING the per-source sketches must
    * exactly equal the sketch of the whole stream — max is
    * associative, so sketch-then-merge loses nothing. The oracle
    * computes the global table directly; Spark goes through the
    * per-source detour, pinning the merge path cross-engine.
    */
  def qHllMerge(spark: SparkSession, dir: String): DataFrame =
    PortableHll.merge(
      Seq(qHllRegisters(spark, dir).select("register", "max_rho")),
      Seq.empty)

  val qHllMergeSql: String =
    hllRemSqlCte + "\n" +
      """SELECT register,
        |  CAST(MAX(CASE WHEN rem = 0 THEN 53
        |                ELSE 53 - length(bin(rem)) END) AS BIGINT)
        |    AS max_rho
        |FROM rr GROUP BY register""".stripMargin

  /** q185 — deflate-gate calibration through the REAL codec (the q152
    * id-class trick applied to q74's rows-only kernel): per doc a
    * payload whose compressibility CLASS is pure id arithmetic —
    * class 0 a single repeated char (ratio ≈ 0.01), class 1 an
    * md5-chain hex string (≥ 4 bits/char of entropy, deflate cannot
    * get under ≈ 0.5), class 2 a repeated 27-char phrase (≈ 0.03).
    * The 0.3 redundancy threshold must therefore fire on exactly
    * classes {0, 2} — the deflate kernel's discrimination is
    * oracle-checked without ever comparing codec bytes cross-engine.
    */
  def qDeflateClasses(spark: SparkSession, dir: String): DataFrame = {
    val synth = udf { (id: Long) =>
      (id % 3) match {
        case 0 => "a" * 2048
        case 1 =>
          val md = java.security.MessageDigest.getInstance("MD5")
          (0 until 16).map { i =>
            md.digest(s"$id:$i".getBytes("UTF-8"))
              .map("%02x".format(_)).mkString
          }.mkString
        case _ => "lorem ipsum dolor sit amet " * 80
      }
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        deflateRatioUdf(synth(col("doc_id"))).as("ratio"))
      .groupBy((col("doc_id") % 3).as("cls"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("ratio") < 0.3, 1L).otherwise(0L))
          .as("n_compressible"))
  }

  val qDeflateClassesSql: String =
    """SELECT doc_id % 3 AS cls, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN doc_id % 3 IN (0, 2) THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_compressible
      |FROM documents GROUP BY doc_id % 3""".stripMargin

  val qLangTrigramsSql: String =
    """WITH g AS (
      |  SELECT lang,
      |    unnest(list_transform(
      |      range(1, greatest(len(string_split_regex(trim(text), '\s+'))
      |        - 2, 1) + 1),
      |      i -> array_to_string(
      |        string_split_regex(trim(text), '\s+')[i:i+2], ' ')))
      |      AS gram
      |  FROM documents),
      |c AS (SELECT lang, gram, COUNT(*) AS cnt FROM g GROUP BY lang, gram),
      |r AS (
      |  SELECT lang, gram, cnt,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY cnt DESC, gram ASC) AS rk
      |  FROM c)
      |SELECT lang, gram, cnt, CAST(rk AS BIGINT) AS rank
      |FROM r WHERE rk <= 3""".stripMargin

  /** q91 — temperature-based mixture rebalancing (the multilingual
    * α-sampling trick, α = 0.5): each source keeps documents with
    * probability `n_src^-0.5`, flattening the size distribution so
    * over-represented sources stop dominating the mixture. Fully
    * deterministic AND engine-neutral: the keep threshold is
    * `floor((1/sqrt(n)) · 2^60)` — sqrt, divide, multiply and floor
    * are all IEEE-correctly-rounded, so both engines derive identical
    * thresholds — and the draw is q57's md5(doc_id) hash, so reruns
    * and other engines select the same rows. Shape: one tiny counts
    * aggregate, broadcast-joined back, then a pure filter +
    * final aggregate.
    */
  def qTempSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val two60 = 1152921504606846976L // 2^60
    val rates = docs.groupBy("source")
      .agg(count(lit(1)).as("n_src"))
      .withColumn("threshold",
        floor((lit(1.0) / sqrt(col("n_src").cast("double"))) *
          lit(two60.toDouble)).cast("long"))
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15),
      16, 10).cast("long")
    docs
      .join(broadcast(rates), Seq("source"))
      .filter(h < col("threshold"))
      .groupBy(col("source"), col("n_src"))
      .agg(count(lit(1)).as("n_kept"))
      .select(col("source"), col("n_src"), col("n_kept"))
  }

  val qTempSampleSql: String =
    """WITH r AS (
      |  SELECT source, COUNT(*) AS n_src,
      |    CAST(FLOOR((1.0 / sqrt(CAST(COUNT(*) AS DOUBLE)))
      |      * 1152921504606846976.0) AS BIGINT) AS threshold
      |  FROM documents GROUP BY source)
      |SELECT d.source, r.n_src, COUNT(*) AS n_kept
      |FROM documents d JOIN r ON d.source = r.source
      |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
      |  < r.threshold
      |GROUP BY d.source, r.n_src""".stripMargin

  /** q88 — declarative data-quality gate ([[graft.operators.Checks]]):
    * five constraints over the documents table (row volume, key
    * uniqueness, text completeness, value range, dimension
    * cardinality), ALL evaluated in one aggregation pass. Metrics are
    * exact-count ratios, so the doubles (and the pass verdicts) are
    * bit-identical to the SQL oracle computing the same constraints.
    */
  def qQualityChecks(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Checks
    import graft.operators.Checks.CheckDef
    val n = count(lit(1)).cast("double")
    Checks.run(Tables.documents(spark, dir), Seq(
      CheckDef("row_count", n, _ > 0.0),
      CheckDef("doc_id_unique",
        countDistinct(col("doc_id")).cast("double") / n, _ == 1.0),
      CheckDef("text_complete",
        count(col("text")).cast("double") / n, _ == 1.0),
      CheckDef("n_chars_in_range",
        sum(when(col("n_chars").between(1, 1000000), 1L).otherwise(0L))
          .cast("double") / n, _ == 1.0),
      CheckDef("lang_cardinality",
        countDistinct(col("lang")).cast("double"), _ <= 20.0)
    ))
  }

  val qQualityChecksSql: String =
    """WITH m AS (SELECT
      |  CAST(COUNT(*) AS DOUBLE) AS n,
      |  CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS uniq,
      |  CAST(COUNT(text) AS DOUBLE) AS compl,
      |  CAST(SUM(CASE WHEN n_chars BETWEEN 1 AND 1000000
      |    THEN 1 ELSE 0 END) AS DOUBLE) AS inrange,
      |  CAST(COUNT(DISTINCT lang) AS DOUBLE) AS langs
      |FROM documents)
      |SELECT 'row_count' AS check_name, n AS metric, n > 0 AS passed
      |FROM m
      |UNION ALL SELECT 'doc_id_unique', uniq / n, uniq / n = 1.0 FROM m
      |UNION ALL SELECT 'text_complete', compl / n, compl / n = 1.0 FROM m
      |UNION ALL SELECT 'n_chars_in_range', inrange / n,
      |  inrange / n = 1.0 FROM m
      |UNION ALL SELECT 'lang_cardinality', langs, langs <= 20.0 FROM m""".stripMargin

  /** q96 — cross-document duplicated-span removal accounting (Lee et
    * al., arXiv:2107.06499 — the removal op, vs q68's gram-count
    * profile): word 8-grams shared by ≥2 distinct docs mark their token
    * windows, overlapping windows union, and the output is how many
    * tokens a span-removal pass would delete per doc. See
    * [[graft.operators.DupSpans]] for the 3-shuffle scale shape.
    */
  def qDupSpans(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DupSpans
      .dupSpanStats(Tables.documents(spark, dir), "doc_id", col("text"),
        n = 8)
      .select("doc_id", "n_tokens", "n_dup_tokens", "keep_ratio")

  /** Mirrors dupSpanStats exactly: same posGrams shingle convention
    * (docs shorter than n → one whole-text gram), same md5-60 hash
    * family, same interval-union via distinct covered positions.
    */
  val qDupSpansSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t,
      |    CASE WHEN trim(text) = '' THEN 0 ELSE
      |      len(string_split_regex(trim(text), '\s+')) END AS n_tokens
      |  FROM documents),
      |gi AS (
      |  SELECT doc_id, n_tokens, t,
      |    unnest(range(1, greatest(len(t) - 7, 1) + 1)) AS i
      |  FROM toks),
      |g AS (
      |  SELECT doc_id, n_tokens, i - 1 AS pos,
      |    ('0x' || substr(md5(array_to_string(t[i:i+7], ' ')),
      |      1, 15))::BIGINT AS h
      |  FROM gi),
      |duph AS (
      |  SELECT h FROM (SELECT DISTINCT doc_id, h FROM g)
      |  GROUP BY h HAVING COUNT(*) >= 2),
      |cov0 AS (
      |  SELECT g.doc_id, max(g.n_tokens) AS nt,
      |    list(DISTINCT g.pos) AS starts
      |  FROM g JOIN duph USING (h) GROUP BY g.doc_id),
      |cov AS (
      |  SELECT doc_id, CAST(len(list_filter(
      |    list_distinct(flatten(list_transform(starts, s -> range(s, s + 8)))),
      |    p -> p < nt)) AS BIGINT) AS n_dup_tokens
      |  FROM cov0)
      |SELECT t.doc_id, CAST(t.n_tokens AS BIGINT) AS n_tokens,
      |  COALESCE(c.n_dup_tokens, 0) AS n_dup_tokens,
      |  CASE WHEN t.n_tokens > 0 THEN
      |    CAST(t.n_tokens - COALESCE(c.n_dup_tokens, 0) AS DOUBLE)
      |      / CAST(t.n_tokens AS DOUBLE)
      |  ELSE 1.0 END AS keep_ratio
      |FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id""".stripMargin

  /** q99 — deterministic weighted sample: priority sampling (Duffield
    * et al. 2007) with weight = n_chars and u from the md5("7:"+id)
    * 52-bit uniform; top-60 priorities. Division-only doubles — see
    * [[graft.operators.Sampling]] for why no ln/pow.
    */
  def qPrioritySample(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling
      .prioritySample(Tables.documents(spark, dir), "doc_id",
        col("n_chars"), k = 60, seed = "7")
      .select("doc_id", "source", "n_chars", "priority")

  val qPrioritySampleSql: String =
    """SELECT doc_id, source, n_chars,
      |  CAST(n_chars AS DOUBLE) / (
      |    (('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 13))
      |      ::BIGINT + 1.0) / 4503599627370496.0) AS priority
      |FROM documents WHERE n_chars > 0
      |ORDER BY priority DESC, doc_id LIMIT 60""".stripMargin

  /** q106 — leakage-safe train/val/test split
    * ([[graft.operators.Sampling.splitByGroup]]): near-dup components
    * (the q37 graph) are the split unit, so no near-duplicate pair can
    * straddle train and test. 80/10/10 by the md5-52-bit uniform of the
    * component id; the oracle recomputes components via recursive-CTE
    * closure and applies the identical threshold rule.
    */
  def qLeakageSplit(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling
      .splitByGroup(TextQueries.qDedupGroups(spark, dir), "component",
        seed = "13")
      .select("doc_id", "component", "split")

  val qLeakageSplitSql: String = {
    // the q37 oracle produces (doc_id, component); reuse it verbatim
    val comps = TextQueries.qDedupGroupsSql
    s"""WITH comps AS ($comps),
      |u AS (
      |  SELECT doc_id, component,
      |    (('0x' || substr(md5('13:' || CAST(component AS VARCHAR)), 1, 13))
      |      ::BIGINT + 1.0) / 4503599627370496.0 AS uu
      |  FROM comps)
      |SELECT doc_id, component,
      |  CASE WHEN uu < 0.8 THEN 'train'
      |       WHEN uu < 0.9 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM u""".stripMargin
  }

  /** q102 — corpus PII redaction ([[graft.operators.PiiScrub]]). The
    * synthetic corpus carries no PII, so the query first splices a
    * deterministic PII suffix onto each doc (email / phone / IPv4 / SSN
    * by doc_id mod 4 — identical string algebra on both engines), then
    * scrubs; the oracle hash-checks counts AND the redacted text, so
    * both the counting and replacement regexes are pinned cross-engine.
    */
  /** q109 — bigram language-model counts
    * ([[graft.operators.NgramLm.bigramCounts]]): corpus-wide bigram
    * frequencies with exact conditional probabilities (the KenLM-style
    * count pass), pruned to bigrams seen ≥ 3 times. Counts are
    * integers and p_cond a single IEEE division, so the whole kernel →
    * explode → count → window chain hash-checks.
    */
  def qBigramLm(spark: SparkSession, dir: String): DataFrame =
    graft.operators.NgramLm.bigramCounts(
      Tables.documents(spark, dir), "text",
      (c, n) => wordNgramsKernel(c, n), minCount = 3L)

  val qBigramLmSql: String =
    """WITH tok AS (
      |  SELECT string_split_regex(trim(text), '\s+') AS tk
      |  FROM documents WHERE trim(text) <> ''),
      |bg AS (
      |  SELECT u.w1 AS w1, u.w2 AS w2 FROM (
      |    SELECT unnest(list_transform(range(1, len(tk)),
      |      i -> struct_pack(w1 := tk[i], w2 := tk[i + 1]))) AS u
      |    FROM tok)),
      |counted AS (
      |  SELECT w1, w2, COUNT(*) AS c_bigram FROM bg GROUP BY w1, w2),
      |with_den AS (
      |  SELECT w1, w2, c_bigram,
      |    CAST(SUM(c_bigram) OVER (PARTITION BY w1) AS BIGINT) AS c_w1
      |  FROM counted)
      |SELECT w1, w2, c_bigram, c_w1,
      |  CAST(c_bigram AS DOUBLE) / CAST(c_w1 AS DOUBLE) AS p_cond
      |FROM with_den WHERE c_bigram >= 3""".stripMargin

  /** q112 — curriculum staging ([[Sampling.curriculumStages]]): docs
    * assigned to 4 stages by the exact global length CDF (equal-length
    * docs always share a stage), summarized per stage. The stage rule
    * is pure integer arithmetic, so assignment is engine-neutral.
    */
  def qCurriculum(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling
      .curriculumStages(Tables.documents(spark, dir), "n_chars", 4)
      .groupBy("stage")
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        (sum(col("n_chars")).cast("double") /
          count(lit(1)).cast("double")).as("mean_chars"))

  val qCurriculumSql: String =
    """WITH cdf AS (
      |  SELECT n_chars, COUNT(*) AS cnt FROM documents GROUP BY n_chars),
      |s AS (
      |  SELECT n_chars,
      |    CAST((COALESCE(SUM(cnt) OVER (ORDER BY n_chars
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 4)
      |      // SUM(cnt) OVER () AS BIGINT) AS stage
      |  FROM cdf)
      |SELECT stage, COUNT(*) AS n_docs,
      |  MIN(d.n_chars) AS min_chars, MAX(d.n_chars) AS max_chars,
      |  CAST(SUM(d.n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |    AS mean_chars
      |FROM documents d JOIN s ON d.n_chars = s.n_chars
      |GROUP BY stage""".stripMargin

  /** q114 — dataset manifest ([[graft.operators.DataManifest]]): per
    * source, row/char counts plus an order-independent bit_xor content
    * digest over per-row md5-60 hashes — the "data card" record that
    * lets two independently-produced corpus copies be proven identical
    * without comparing rows. Digest invariance to row order means the
    * oracle hash-matches regardless of either engine's scan order.
    */
  def qManifest(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DataManifest
      .manifest(Tables.documents(spark, dir), "source", "doc_id", "text")

  /** q144 — incremental manifest maintenance
    * ([[graft.operators.DataManifest.applyChanges]]): the q114 data
    * card kept continuously correct under merges. A merge's change
    * feed (the q116 update-set convention: every 10th doc modified,
    * every 17th re-keyed as an insert) folds into the base manifest at
    * O(changes) — every maintained field is group-invertible (counts/
    * sums subtract, xor self-inverts, the modular sum subtracts mod
    * 2⁶¹−1), so the oracle's full recompute over the merged corpus
    * hash-matches exactly. Extrema are deliberately excluded: a
    * deleted minimum needs a rescan — the property line between
    * maintainable and non-maintainable manifest fields.
    */
  def qIncrManifest(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{DataManifest, MergeOps}
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
    val modified = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("text", concat(col("text"), lit(" graftnewterm")))
    val added = docs.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("brand new doc "), col("doc_id").cast("string"))
          .as("text"),
        lit("added").as("source"))
    val base = DataManifest.manifest(docs, "source", "doc_id", "text")
      .drop("min_id", "max_id")
    val changes = MergeOps.changeFeed(docs,
      modified.unionByName(added), MergeOps.MergeSpec(Seq("doc_id")))
    DataManifest.applyChanges(base, changes, "source", "doc_id", "text")
      .orderBy("source")
  }

  val qIncrManifestSql: String =
    """WITH docs AS (SELECT doc_id, text, source FROM documents),
      |u AS (
      |  SELECT doc_id, text || ' graftnewterm' AS text, source FROM docs
      |  WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |    'brand new doc ' || CAST(doc_id AS VARCHAR) AS text,
      |    'added' AS source
      |  FROM docs WHERE doc_id % 17 = 0),
      |merged AS (
      |  SELECT COALESCE(u.doc_id, d.doc_id) AS doc_id,
      |    CASE WHEN u.doc_id IS NOT NULL THEN u.text ELSE d.text END
      |      AS text,
      |    CASE WHEN u.doc_id IS NOT NULL THEN u.source ELSE d.source END
      |      AS source
      |  FROM docs d FULL OUTER JOIN u ON d.doc_id = u.doc_id),
      |h AS (
      |  SELECT source, text,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text),
      |      1, 15))::BIGINT AS h
      |  FROM merged)
      |SELECT source, COUNT(*) AS n_rows,
      |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
      |  bit_xor(h) AS content_digest,
      |  CAST(SUM(h::HUGEINT) % 2305843009213693951 AS BIGINT)
      |    AS content_sum
      |FROM h GROUP BY source ORDER BY source""".stripMargin

  val qManifestSql: String =
    """WITH h AS (
      |  SELECT source, doc_id, text,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text),
      |      1, 15))::BIGINT AS h
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_rows,
      |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
      |  bit_xor(h) AS content_digest,
      |  CAST(SUM(h::HUGEINT) % 2305843009213693951 AS BIGINT)
      |    AS content_sum,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM h GROUP BY source""".stripMargin

  /** q115 — canonical text normalization
    * ([[graft.functions.TextFunctions.normalizeText]]): NFC-compose →
    * strip non-whitespace control chars → lowercase → collapse
    * whitespace → trim, the pass that runs BEFORE dedup so
    * byte-different visually-identical variants collapse. Each doc is
    * decorated with decomposed accents (e + combining acute, A +
    * combining ring), a C0 control char, and ragged whitespace, so the
    * oracle exercises real composition work (DuckDB `nfc_normalize`
    * implements the same Unicode normal form) rather than passing
    * vacuously on ASCII.
    */
  def qNormalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        // decomposed accents + a C0 control + tab, the same sequence
        // the oracle builds with chr(): CAFE U+0301 U+0001 ' A' U+030A TAB ' '
        normalizeText(concat(lit("CAFE\u0301\u0001 A\u030a\t "),
          col("text"))).as("norm_text"))
      .withColumn("n_norm", length(col("norm_text")).cast("long"))

  val qNormalizeSql: String =
    """SELECT doc_id,
      |  trim(regexp_replace(
      |    lower(regexp_replace(
      |      nfc_normalize('CAFE' || chr(769) || chr(1) || ' A' || chr(778)
      |        || chr(9) || ' ' || text),
      |      '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g')),
      |    '\s+', ' ', 'g')) AS norm_text,
      |  CAST(length(trim(regexp_replace(
      |    lower(regexp_replace(
      |      nfc_normalize('CAFE' || chr(769) || chr(1) || ' A' || chr(778)
      |        || chr(9) || ' ' || text),
      |      '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g')),
      |    '\s+', ' ', 'g'))) AS BIGINT) AS n_norm
      |FROM documents""".stripMargin

  def qPiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val suffix = concat(
      when(pmod(col("doc_id"), lit(4)) === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com")))
        .when(pmod(col("doc_id"), lit(4)) === 1,
          concat(lit(" call 555-010-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          concat(lit(" host 10."),
            pmod(col("doc_id"), lit(256)).cast("string"), lit(".0.1")))
        .otherwise(lit(" ssn 123-45-6789")))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), concat(col("text"), suffix).as("text"))
    graft.operators.PiiScrub.scrub(docs, "text")
      .select(col("doc_id"), col("n_email"), col("n_ssn"), col("n_phone"),
        col("n_ip"), col("n_pii"), col("scrubbed"))
  }

  val qPiiScrubSql: String =
    """WITH spliced AS (
      |  SELECT doc_id, text || CASE doc_id % 4
      |    WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
      |      || '@example.com'
      |    WHEN 1 THEN ' call 555-010-'
      |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |    WHEN 2 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
      |      || '.0.1'
      |    ELSE ' ssn 123-45-6789' END AS text
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
      |    AS n_email,
      |  CAST(len(regexp_extract_all(text,
      |    '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn,
      |  CAST(len(regexp_extract_all(text,
      |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phone,
      |  CAST(len(regexp_extract_all(text,
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
      |  CAST(len(regexp_extract_all(text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
      |    + len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b'))
      |    + len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
      |    + len(regexp_extract_all(text,
      |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT)
      |    AS n_pii,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |    '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
      |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g')
      |    AS scrubbed
      |FROM spliced""".stripMargin

  /** q147 — compaction planner ([[graft.operators.Layout.planCompaction]]):
    * the documents table read as a file manifest (source = partition,
    * n_chars = file bytes), packed into ~2000-byte output bins by the
    * cumulative-offset rule — the same packing Spark's scan planner
    * applies via maxPartitionBytes. Summarized per (source, bin); all
    * integer arithmetic, so the plan is oracle-exact. O(manifest)
    * cost: one exchange on the partition column, one sort, no joins.
    */
  def qCompaction(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Layout
      .planCompaction(
        Tables.documents(spark, dir)
          .select(col("source"), col("doc_id"), col("n_chars")),
        "source", "n_chars", "doc_id", targetBytes = 2000L)
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_files"),
        sum("n_chars").as("bytes"),
        min("doc_id").as("first_file"),
        max("doc_id").as("last_file"))
      .orderBy("source", "bin")

  val qCompactionSql: String =
    """WITH m AS (
      |  SELECT source, doc_id, n_chars,
      |    CAST(COALESCE(SUM(n_chars) OVER (PARTITION BY source
      |        ORDER BY doc_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      // 2000 AS BIGINT) AS bin
      |  FROM documents)
      |SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n_files,
      |  CAST(SUM(n_chars) AS BIGINT) AS bytes,
      |  MIN(doc_id) AS first_file, MAX(doc_id) AS last_file
      |FROM m GROUP BY source, bin ORDER BY source, bin""".stripMargin

  /** q159 — per-document perplexity under the q109 bigram LM
    * ([[graft.operators.NgramLm.perplexity]]): the CCNet-style quality
    * filter — the corpus's own transition model scores every document,
    * and improbable-transition docs (boilerplate, wrong-language,
    * garbage) surface with high ppl. Add-0.5 smoothing; the LM stays
    * distributed (two keyed joins, one regroup — never collected).
    *
    * Gate form (was rows-only through r7): the exact-integer halves
    * (n_bigrams, n_oov) hash directly, and the transcendental ppl is
    * pinned as floor(ln(ppl)·1e6) — ln-space because the cross-engine
    * drift of ln(ppl) is ABSOLUTE (≤ ~1e-14: per-term 1-ulp libm ln
    * skew and the distributed sum order both wash out in the /n mean,
    * plus 2 ulps for exp∘ln), so the flip-a-bucket probability is
    * (2·1e-14)/1e-6 ≈ 2e-8 per row — ~1e-4 per corpus at sf0.1, vs
    * the ~1-in-1 odds a per-row GUARD BAND wide enough to matter
    * would trip at this row count (a 500-row corpus put a real value
    * inside the first draft's 1e-3 band). ppl is pinned to 6
    * significant relative digits; any algorithmic defect (wrong
    * count, wrong smoothing mass, lost context) moves it orders of
    * magnitude more. NgramLmSpec still pins exact same-JVM values and
    * the repetitive-beats-random ordering.
    */
  def qLmPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val lm = graft.operators.NgramLm.bigramCounts(
      docs, "text", (c, n) => wordNgramsKernel(c, n), minCount = 3L)
    graft.operators.NgramLm
      .perplexity(docs, "doc_id", "text",
        (c, n) => wordNgramsKernel(c, n), lm)
      .select(col("doc_id"), col("n_bigrams"), col("n_oov"),
        floor(log(col("ppl")) * lit(1e6)).cast("long").as("lnppl_q6"))
      .orderBy("doc_id")
  }

  /** The same LM + smoothing + quantization in DuckDB: the q109 bigram
    * CTE chain (pruned ≥3 AFTER the denominator), per-w1 context
    * totals, the pruned-vocabulary continuation count V, and per doc
    * ln(exp(−Σ ln p / n)) floored at the 1e-6 ln-space grid — the
    * redundant exp∘ln mirrors the Spark side exactly (its operator
    * emits ppl; the gate re-derives ln), keeping the two float paths
    * step-for-step identical.
    */
  val qLmPerplexitySql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      |  FROM documents WHERE trim(text) <> ''),
      |bg AS (
      |  SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(tk)),
      |      i -> struct_pack(w1 := tk[i], w2 := tk[i + 1]))) AS u
      |    FROM tok)),
      |counted AS (
      |  SELECT w1, w2, COUNT(*) AS c_bigram FROM bg GROUP BY w1, w2),
      |with_den AS (
      |  SELECT w1, w2, c_bigram,
      |    CAST(SUM(c_bigram) OVER (PARTITION BY w1) AS BIGINT) AS c_w1
      |  FROM counted),
      |lm AS (
      |  SELECT w1, w2, c_bigram, c_w1 FROM with_den WHERE c_bigram >= 3),
      |den AS (SELECT w1, MAX(c_w1) AS c_ctx FROM lm GROUP BY w1),
      |voc AS (SELECT COUNT(DISTINCT w2) AS v FROM lm),
      |p AS (
      |  SELECT b.doc_id,
      |    (CAST(COALESCE(l.c_bigram, 0) AS DOUBLE) + 0.5) /
      |      (CAST(COALESCE(d.c_ctx, 0) AS DOUBLE)
      |        + 0.5 * CAST(voc.v AS DOUBLE)) AS pr,
      |    CASE WHEN l.c_bigram IS NULL THEN 1 ELSE 0 END AS oov
      |  FROM bg b
      |  LEFT JOIN lm l ON l.w1 = b.w1 AND l.w2 = b.w2
      |  LEFT JOIN den d ON d.w1 = b.w1
      |  CROSS JOIN voc)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(oov) AS BIGINT) AS n_oov,
      |  CAST(floor(ln(exp(-SUM(ln(pr)) / COUNT(*))) * 1e6) AS BIGINT)
      |    AS lnppl_q6
      |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q176 — distributed suffix-array ranking
    * ([[graft.operators.SuffixRank]]): every character position of the
    * every-10th-doc subcorpus gets the dense rank of its 32-char
    * truncated suffix over the whole subcorpus — 5 prefix-doubling
    * rounds of per-doc lead windows + range-sort dense re-ranks, the
    * exact-substring-dedup backbone (q68's sampled word-gram profile
    * is this operator's approximation). Rank is a pure function of the
    * corpus, so the oracle reproduces it as DENSE_RANK over
    * substr(text, pos, 32). Subcorpus because the output is one row
    * per CHARACTER — the gate stays ~15k/150k rows at sf0.01/sf0.1.
    */
  def qSuffixRank(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SuffixRank
      .rank(Tables.documents(spark, dir).filter(col("doc_id") % 10 === 0),
        "doc_id", "text", depth = 32)
      .select(col("id").as("doc_id"), col("pos"), col("rank"))

  private val suffixRankCte: String =
    """WITH c AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
      |u AS (
      |  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS pos
      |  FROM c),
      |p AS (
      |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |    substr(text, CAST(pos AS INT), 32) AS s
      |  FROM u),
      |r AS (
      |  SELECT doc_id, pos,
      |    CAST(DENSE_RANK() OVER (ORDER BY s) AS BIGINT) AS rank
      |  FROM p)""".stripMargin

  val qSuffixRankSql: String =
    s"""$suffixRankCte
       |SELECT doc_id, pos, rank FROM r""".stripMargin

  /** q177 — repeated exact spans from the suffix ranks: equal rank ⇔
    * identical 32-char span, so duplicated-substring mining collapses
    * to one aggregate over q176's output (occurrence count, distinct
    * docs, first location per span class). The consumer shape of the
    * Lee-et-al. exact dedup pipeline: these span classes are what a
    * remove-repeated-spans pass would cut.
    */
  def qRepeatedSpans(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SuffixRank
      .rank(Tables.documents(spark, dir).filter(col("doc_id") % 10 === 0),
        "doc_id", "text", depth = 32)
      .groupBy("rank")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("id")).as("n_docs"),
        min(col("id")).as("min_doc"),
        min(col("pos")).as("min_pos"))
      .filter(col("n_occ") > 1)

  val qRepeatedSpansSql: String =
    s"""$suffixRankCte
       |SELECT rank, COUNT(*) AS n_occ,
       |  COUNT(DISTINCT doc_id) AS n_docs,
       |  MIN(doc_id) AS min_doc, MIN(pos) AS min_pos
       |FROM r GROUP BY rank HAVING COUNT(*) > 1""".stripMargin

  /** The q179/q180 corpus: the q176 subcorpus plus exact copies of
    * its every-3rd member (ids +1,000,000) — repeated full 32-char
    * spans exist BY CONSTRUCTION (the naturally-occurring repeated
    * suffix classes in the synthetic corpus are all shorter than a
    * full window, which would leave the cut list vacuously empty).
    */
  private def spanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
    base.unionByName(base.filter(col("doc_id") % 30 === 0)
      .withColumn("doc_id", col("doc_id") + lit(1000000L)))
  }

  /** Shared CTE tail for the q179/q180 oracles: duplicate-occurrence
    * positions → interval union (gaps and islands) → cut list, the
    * SQL mirror of [[graft.operators.SpanDedup.cutIntervals]]. All
    * integer window arithmetic — both engines agree bit-for-bit.
    */
  private val cutsCte: String =
    """WITH c AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
      |  WHERE doc_id % 30 = 0),
      |u AS (
      |  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS pos
      |  FROM c),
      |p AS (
      |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |    substr(text, CAST(pos AS INT), 32) AS s
      |  FROM u),
      |r AS (
      |  SELECT doc_id, pos,
      |    CAST(DENSE_RANK() OVER (ORDER BY s) AS BIGINT) AS rank
      |  FROM p),
      |lens AS (SELECT doc_id, length(text) AS len FROM c),
       |f AS (
       |  SELECT r.doc_id, r.pos, r.rank,
       |    r.doc_id * 100000 + r.pos AS key
       |  FROM r JOIN lens USING (doc_id)
       |  WHERE r.pos <= len - 31),
       |d AS (
       |  SELECT doc_id, pos FROM (
       |    SELECT doc_id, pos, key,
       |      COUNT(*) OVER (PARTITION BY rank) AS n,
       |      MIN(key) OVER (PARTITION BY rank) AS fk
       |    FROM f)
       |  WHERE n > 1 AND key <> fk),
       |i AS (
       |  SELECT doc_id, pos,
       |    MAX(pos + 31) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
       |  FROM d),
       |j AS (
       |  SELECT doc_id, pos,
       |    SUM(CASE WHEN pm IS NULL OR pos > pm + 1 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS UNBOUNDED PRECEDING) AS isl
       |  FROM i),
       |cuts AS (
       |  SELECT doc_id, MIN(pos) AS cut_start, MAX(pos) + 31 AS cut_end
       |  FROM j GROUP BY doc_id, isl)""".stripMargin

  /** q179 — exact repeated-span cut list
    * ([[graft.operators.SpanDedup.cutIntervals]]): for the q176
    * subcorpus, the maximal character runs covered by non-canonical
    * occurrences of corpus-duplicated 32-char spans — what the Lee
    * et al. dedup transform deletes. One window over the rank class
    * (hottest class costs its member count) + the gaps-and-islands
    * interval union per doc; oracle mirrors it in pure integer SQL.
    */
  def qCutIntervals(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SpanDedup
      .cutIntervals(spanCorpus(spark, dir), "doc_id", "text",
        spanLen = 32)
      .select(col("id").as("doc_id"), col("cut_start"), col("cut_end"))

  val qCutIntervalsSql: String =
    s"""$cutsCte
       |SELECT doc_id, cut_start, cut_end FROM cuts""".stripMargin

  /** q180 — repeated-span REMOVAL end-to-end
    * ([[graft.operators.SpanDedup.removeSpans]]): the q179 cut list
    * applied — every document of the subcorpus re-emitted with its
    * covered runs deleted, verified byte-for-byte via length +
    * sha256 against the oracle reassembling the uncovered segments
    * with string_agg. The full Lee-et-al. exact-dedup transform,
    * driver-verified including the actual output text.
    */
  def qRemoveSpans(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SpanDedup
      .removeSpans(spanCorpus(spark, dir), "doc_id", "text",
        spanLen = 32)
      .select(col("id").as("doc_id"),
        length(col("clean_text")).cast("long").as("clean_len"),
        sha2(col("clean_text"), 256).as("clean_sha"))

  val qRemoveSpansSql: String =
    s"""$cutsCte,
       |seg AS (
       |  SELECT doc_id,
       |    COALESCE(LAG(cut_end) OVER (PARTITION BY doc_id
       |      ORDER BY cut_start), 0) + 1 AS a,
       |    cut_start - 1 AS b
       |  FROM cuts
       |  UNION ALL
       |  SELECT m.doc_id, m.me + 1 AS a, length(c2.text) AS b
       |  FROM (SELECT doc_id, MAX(cut_end) AS me
       |        FROM cuts GROUP BY doc_id) m
       |  JOIN c c2 USING (doc_id)),
       |cleaned AS (
       |  SELECT s.doc_id,
       |    COALESCE(string_agg(
       |      CASE WHEN s.b >= s.a THEN
       |        substr(c2.text, CAST(s.a AS INT),
       |          CAST(s.b - s.a + 1 AS INT)) END,
       |      '' ORDER BY s.a), '') AS ct
       |  FROM seg s JOIN c c2 USING (doc_id)
       |  GROUP BY s.doc_id)
       |SELECT c.doc_id,
       |  CAST(length(COALESCE(cl.ct, c.text)) AS BIGINT) AS clean_len,
       |  sha256(COALESCE(cl.ct, c.text)) AS clean_sha
       |FROM c LEFT JOIN cleaned cl USING (doc_id)""".stripMargin
}
