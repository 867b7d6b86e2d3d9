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

  /** q62 — seeded uniform note sample (O3; rows-only: hash-order
    * sampling is engine-specific, determinism asserted in NoteOpsSpec).
    */
  def qSampleNotes(spark: SparkSession, dir: String): DataFrame =
    NoteOps
      .sampleNotes(Tables.documents(spark, dir), n = 50, seed = 42L)
      .select("doc_id", "lang", "source")

  /** q33 — multimodal pipeline (rows-only: decode kernels are stubs):
    * decode → resize → embed, one row per media item with metadata and
    * the embedding norm.
    */
  def qMediaPipeline(spark: SparkSession, dir: String): DataFrame = {
    val media =
      Multimodal.mediaFromDocuments(spark, Tables.documents(spark, dir))
    val decoded = Multimodal.resize(Multimodal.decode(media), 256, 256)
    val emb = Multimodal.embed(decoded, dim = 32)
    decoded
      .toDF()
      .select(col("media_id"), col("kind"), col("meta.width"),
        col("meta.height"), col("meta.durationMs"))
      .join(emb, Seq("media_id"))
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("durationMs"),
        graft.operators.Similarity.l2Norm(col("embedding"))
          .as("embedding_norm"))
  }
}
