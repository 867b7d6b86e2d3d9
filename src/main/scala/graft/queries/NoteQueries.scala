package graft.queries

import graft.multimodal.Multimodal
import graft.nlp.NoteOps
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Note/NLP-flow and multimodal queries over the documents table. */
object NoteQueries {

  /** q60 — note selection pipeline: whole-word cohort filter (P4) +
    * content checksum (F11) + trailing-whitespace cleanup (P9).
    */
  def qNoteSelect(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    NoteOps
      .filterByWords(docs, "text", Seq("merge", "join"))
      .select(
        col("doc_id"),
        sha2(NoteOps.stripTrailingWhitespace(col("text")), 256)
          .as("checksum"),
        length(col("text")).cast("long").as("n_chars")
      )
  }

  val qNoteSelectSql: String =
    """SELECT doc_id,
      |  sha256(regexp_replace(text, '(?m)[ \t]+$', '', 'g')) AS checksum,
      |  length(text) AS n_chars
      |FROM documents
      |WHERE regexp_matches(text, '(?i)\b(merge|join)\b')""".stripMargin

  /** q61 — grouped-note concatenation (A9): all docs of a source merged
    * chronologically (by padded doc id); emits the merged hash + length
    * so the oracle compare stays compact.
    */
  def qGroupNotes(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .withColumn("ord", lpad(col("doc_id").cast("string"), 8, "0"))
    NoteOps
      .groupNotes(docs, "source", "ord", "text")
      .select(
        col("source"),
        md5(col("merged_text")).as("merged_md5"),
        length(col("merged_text")).cast("long").as("merged_len"),
        size(col("offsets")).cast("long").as("n_notes")
      )
  }

  val qGroupNotesSql: String =
    """SELECT source,
      |  md5(string_agg(text, chr(10) || chr(10)
      |    ORDER BY lpad(CAST(doc_id AS VARCHAR), 8, '0'))) AS merged_md5,
      |  length(string_agg(text, chr(10) || chr(10)
      |    ORDER BY lpad(CAST(doc_id AS VARCHAR), 8, '0'))) AS merged_len,
      |  COUNT(*) AS n_notes
      |FROM documents GROUP BY source""".stripMargin

  /** q62 — seeded uniform note sample (O3), selection rule pinned to
    * md5 over the seed + full row content, so the sampled set is
    * oracle-exact (formerly rows-only under an engine-specific
    * xxhash64 order).
    */
  def qSampleNotes(spark: SparkSession, dir: String): DataFrame =
    NoteOps
      .sampleNotes(Tables.documents(spark, dir), n = 50, seed = 42L)
      .select("doc_id", "lang", "source")

  val qSampleNotesSql: String =
    """SELECT doc_id, lang, source FROM documents
      |ORDER BY md5(concat_ws(':', '42', CAST(doc_id AS VARCHAR), text,
      |  lang, source, CAST(n_chars AS VARCHAR)))
      |LIMIT 50""".stripMargin

  /** q63 — deterministic hash sample: order by md5(seed:id), take n.
    * The scale-path sampler (no RNG state, reproducible across engines
    * and re-runs, TakeOrdered plan — no full sort materialization);
    * md5 is identical in Spark and DuckDB so this one is oracle-exact,
    * complementing the rows-only reservoir sampler (q62).
    */
  def qHashSample(spark: SparkSession, dir: String): DataFrame =
    NoteOps
      .hashSample(Tables.documents(spark, dir), "doc_id", n = 50,
        seed = "42")
      .select("doc_id", "lang", "source")

  val qHashSampleSql: String =
    """SELECT doc_id, lang, source FROM documents
      |ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)) LIMIT 50""".stripMargin

  /** q33 — multimodal pipeline: decode → resize → embed over opaque
    * binary payloads. The decode kernels are deterministic stubs (codec
    * libs absent), so the oracle checks the engine-portable invariants:
    * row identity through the whole pipeline, kind assignment, original
    * payload size + sha256, and the embedding width produced by the
    * feature extractor.
    */
  def qMediaPipeline(spark: SparkSession, dir: String): DataFrame = {
    // NO spread here (reverted in r11): this pipeline's kernels are
    // stubs (length/sha — cheap per row), so the r10 repartition
    // shipped the whole wide text column to buy parallelism the path
    // doesn't need — idle-host measurement 0.82s WITH vs 0.32s (r9)
    // WITHOUT. The heavy-codec paths (q130/q152) keep their spread.
    val media =
      Multimodal.mediaFromDocuments(spark,
        Tables.documents(spark, dir))
    val decoded = Multimodal.resize(Multimodal.decode(media), 256, 256)
    val emb = Multimodal.embed(decoded, dim = 32)
    media
      .toDF()
      .select(col("media_id"), col("kind"),
        length(col("bytes")).cast("long").as("n_bytes"),
        sha2(col("bytes"), 256).as("payload_sha"))
      .join(emb, Seq("media_id"))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("payload_sha"),
        size(col("embedding")).cast("long").as("emb_dim"))
  }

  val qMediaPipelineSql: String =
    """SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  sha256(text) AS payload_sha,
      |  CAST(32 AS BIGINT) AS emb_dim
      |FROM documents""".stripMargin

  /** q130 — image dedup through REAL codecs end-to-end, the q152
    * audio trick applied to images: per doc a PNG is synthesized
    * ([[Multimodal.synthPng]] — JDK encoder; pattern class = doc_id
    * mod 8, flat brightness offset = (doc_id div 8) mod 4), decoded
    * back by ImageIO, aHashed ([[Multimodal.perceptualHash]]), and
    * grouped by exact hash. aHash thresholds every grid cell against
    * the grid's own mean, so a flat brightness shift moves cells and
    * mean together — the four brightness variants of each pattern
    * class encode to DIFFERENT PNG bytes but MUST collapse into one
    * phash group, while distinct patterns differ in 16 hash bits.
    * The expected grouping is therefore pure integer arithmetic on
    * doc_id and the whole encode→decode→aHash→dedup pipeline is
    * ORACLE-CHECKABLE without comparing hash values cross-engine
    * (converted from rows-only in r7). The banded ≤3-hamming pair
    * join stays pinned in MultimodalSpec. Per-row kernel work + one
    * aggregate; embarrassingly parallel.
    */
  def qImagePhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val synthUdf = udf((id: Long) => Multimodal.synthPng(id))
    // spread before the codec kernels: the PNG encode/decode chain is
    // the query's whole cost and the scan is one file (guide §2.5)
    val media = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id").as("media_id"), lit("image").as("kind"),
        synthUdf(col("doc_id")).as("bytes"))
      .as[Multimodal.MediaRow]
    Multimodal.perceptualHash(Multimodal.decode(media))
      .groupBy("phash")
      .agg(min("media_id").as("keep_id"),
        count(lit(1)).as("n_members"))
      .select("keep_id", "n_members")
      .orderBy("keep_id")
  }

  val qImagePhashSql: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_members
      |FROM documents GROUP BY doc_id % 8 ORDER BY keep_id""".stripMargin

  /** q173 — practitioner enrichment (SURVEY §2.5 J5,
    * [[graft.fhir.FhirJoins.enrichAuthors]]) as a driver-gated query:
    * notes carry either reference form ("PractitionerRole/…",
    * "Practitioner/…", or a dangling ref), the role/practitioner dims
    * are derived from `nation` by integer arithmetic both engines
    * reproduce, and the two broadcast joins + sorted-distinct
    * aggregation resolve codes/specialties/names per note (reference
    * analog: the O(notes×roles) enrichment loop,
    * fhir/fhir_utils.py:206-293). Arrays are emitted CSV-joined so
    * the gate's column sorter handles them; a Practitioner ref shared
    * by several roles (n_nationkey ≡ k mod 10) exercises the
    * multi-match aggregation, the dangling ref the left-outer empties.
    */
  def qAuthorEnrich(spark: SparkSession, dir: String): DataFrame = {
    val notes = Tables.documents(spark, dir).select(
      col("doc_id").as("note_id"),
      when(col("doc_id") % 3 === 0,
        concat(lit("PractitionerRole/r"),
          (col("doc_id") % 25).cast("string")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("Practitioner/p"),
            (col("doc_id") % 10).cast("string")))
        .otherwise(lit("Practitioner/none")).as("author_ref"))
    val nation = Tables.nation(spark, dir)
    val roles = nation.select(
      concat(lit("r"), col("n_nationkey").cast("string")).as("id"),
      concat(lit("Practitioner/p"),
        (col("n_nationkey") % 10).cast("string")).as("practitionerRef"),
      array(concat(lit("C"), col("n_nationkey").cast("string")))
        .as("codes"),
      array(concat(lit("S"), (col("n_nationkey") % 5).cast("string")))
        .as("specialties"))
    val practitioners = nation
      .select((col("n_nationkey") % 10).as("k")).distinct()
      .select(concat(lit("p"), col("k").cast("string")).as("id"),
        concat(lit("P"), col("k").cast("string")).as("name"))
    graft.fhir.FhirJoins
      .enrichAuthors(notes, "note_id", "author_ref", roles, practitioners)
      .select(col("note_id"),
        array_join(col("author_roles"), ",").as("roles_csv"),
        array_join(col("author_specialties"), ",").as("specialties_csv"),
        array_join(col("author_names"), ",").as("names_csv"))
  }

  val qAuthorEnrichSql: String =
    """WITH notes AS (
      |  SELECT doc_id AS note_id,
      |    CASE CAST(doc_id % 3 AS INT)
      |      WHEN 0 THEN 'PractitionerRole/r' || CAST(doc_id % 25 AS VARCHAR)
      |      WHEN 1 THEN 'Practitioner/p' || CAST(doc_id % 10 AS VARCHAR)
      |      ELSE 'Practitioner/none' END AS author_ref
      |  FROM documents),
      |roles AS (
      |  SELECT 'r' || CAST(n_nationkey AS VARCHAR) AS role_id,
      |    'p' || CAST(n_nationkey % 10 AS VARCHAR) AS pract_id,
      |    'C' || CAST(n_nationkey AS VARCHAR) AS code,
      |    'S' || CAST(n_nationkey % 5 AS VARCHAR) AS specialty
      |  FROM nation),
      |practs AS (
      |  SELECT DISTINCT 'p' || CAST(n_nationkey % 10 AS VARCHAR) AS pract_id,
      |    'P' || CAST(n_nationkey % 10 AS VARCHAR) AS name
      |  FROM nation),
      |j AS (
      |  SELECT n.note_id, r.code, r.specialty, p.name
      |  FROM notes n
      |  LEFT JOIN roles r ON
      |    (split_part(n.author_ref, '/', 1) = 'PractitionerRole'
      |       AND split_part(n.author_ref, '/', 2) = r.role_id)
      |    OR (split_part(n.author_ref, '/', 1) = 'Practitioner'
      |       AND split_part(n.author_ref, '/', 2) = r.pract_id)
      |  LEFT JOIN practs p ON r.pract_id = p.pract_id)
      |SELECT note_id,
      |  coalesce(array_to_string(
      |    list(DISTINCT code ORDER BY code), ','), '') AS roles_csv,
      |  coalesce(array_to_string(
      |    list(DISTINCT specialty ORDER BY specialty), ','), '')
      |    AS specialties_csv,
      |  coalesce(array_to_string(
      |    list(DISTINCT name ORDER BY name), ','), '') AS names_csv
      |FROM j GROUP BY note_id""".stripMargin

  /** q152 — audio dedup through REAL codecs end-to-end: per doc a WAV
    * is synthesized ([[Multimodal.synthWav]] — JDK encoder; tone class
    * = doc_id mod 8, amplitude class = (doc_id div 8) mod 5), decoded
    * back by `javax.sound.sampled`, spectrally fingerprinted (Goertzel
    * probe energies, [[Multimodal.spectralFingerprint]]), and grouped
    * by exact fingerprint. The fingerprint is amplitude-invariant, so
    * the five amplitude variants of each tone class MUST collapse into
    * one group — making the grouping a pure function of doc_id and the
    * whole decode→DSP→dedup pipeline ORACLE-CHECKABLE: 8 groups keyed
    * by doc_id mod 8, fingerprint values never compared cross-engine.
    * Per-row kernel work + one aggregate; embarrassingly parallel.
    */
  def qAudioDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val synthUdf = udf((id: Long) => Multimodal.synthWav(id))
    // spread before the codec kernels (same rationale as q130)
    val media = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id").as("media_id"), lit("audio").as("kind"),
        synthUdf(col("doc_id")).as("bytes"))
      .as[Multimodal.MediaRow]
    Multimodal.spectralFingerprint(Multimodal.decode(media))
      .groupBy("fingerprint")
      .agg(min("media_id").as("keep_id"),
        count(lit(1)).as("n_members"))
      .select("keep_id", "n_members")
      .orderBy("keep_id")
  }

  val qAudioDedupSql: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_members
      |FROM documents GROUP BY doc_id % 8 ORDER BY keep_id""".stripMargin
}
