package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns at pipeline scale (SURVEY §7.5): media as opaque
  * `binary` columns + typed metadata structs, with decode / resize /
  * frame-sample / feature-extract as partition-parallel operators.
  *
  * The actual codecs are NOT in this container, so the decode kernels are
  * STUBBED with deterministic fakes (clearly marked below). Everything
  * around them — schema contract, mapPartitions batch shape, partition
  * sizing, null/error routing — is real and tested; swapping in a real
  * codec (javacv, TwelveMonkeys, ffmpeg via pipe) only replaces the
  * marked function bodies.
  */
object Multimodal {

  /** Decoded-media metadata contract (all media kinds share it; unused
    * fields null).
    */
  final case class MediaMeta(
      width: Int,
      height: Int,
      channels: Int,
      durationMs: Long,
      format: String
  )

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte]
  )

  final case class DecodedRow(
      media_id: Long,
      kind: String,
      bytes: Array[Byte],
      meta: MediaMeta
  )

  // ---- STUB KERNELS ----------------------------------------------------
  // Real implementations would parse the container format. These fakes
  // are pure functions of the bytes so the pipeline stays deterministic
  // and testable without codec libraries.

  /** STUB: header parse. Real: ImageIO/ffprobe on `bytes`. */
  private def fakeDecodeMeta(kind: String, bytes: Array[Byte]): MediaMeta = {
    val h = java.util.Arrays.hashCode(bytes)
    val w = 64 + math.abs(h % 512)
    kind match {
      case "image" => MediaMeta(w, 64 + math.abs((h >> 4) % 512), 3, 0L, "fake/raw")
      case "audio" => MediaMeta(0, 0, math.abs(h % 2) + 1,
        1000L + math.abs(h % 600000), "fake/pcm")
      case _ => MediaMeta(w, 64 + math.abs((h >> 4) % 512), 3,
        1000L + math.abs(h % 600000), "fake/v1")
    }
  }

  /** STUB: pixel resample. Real: scaled re-encode of `bytes`. */
  private def fakeResize(bytes: Array[Byte], w: Int, hgt: Int): Array[Byte] =
    java.util.Arrays.copyOf(bytes, math.min(bytes.length, w * hgt / 64 + 16))

  /** STUB: embedding. Real: a vision/audio model over decoded frames.
    * Deterministic projection of byte chunks into `dim` floats.
    */
  private def fakeEmbed(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }
  // ---- END STUBS -------------------------------------------------------

  /** Decode metadata for each media row. mapPartitions so a real codec
    * amortizes per-partition init (model load, ffmpeg process); the
    * iterator shape is the same one a JNI/pipe client needs.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codecs initialize per-partition state HERE (once, not per row)
      rows.map { r =>
        DecodedRow(r.media_id, r.kind, r.bytes,
          fakeDecodeMeta(r.kind, r.bytes))
      }
    }
  }

  /** Resize images to a bounding box; non-images pass through. */
  def resize(decoded: Dataset[DecodedRow], maxW: Int, maxH: Int)
      : Dataset[DecodedRow] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions { rows =>
      rows.map { r =>
        if (r.kind != "image") r
        else {
          val scale = math.min(1.0,
            math.min(maxW.toDouble / r.meta.width,
              maxH.toDouble / r.meta.height))
          val nw = math.max(1, (r.meta.width * scale).toInt)
          val nh = math.max(1, (r.meta.height * scale).toInt)
          r.copy(bytes = fakeResize(r.bytes, nw, nh),
            meta = r.meta.copy(width = nw, height = nh))
        }
      }
    }
  }

  /** Frame sampling: one output row per sampled frame of each video
    * (every `everyMs` of duration) — the explode-shaped fan-out a
    * video pipeline needs; ids stay joinable back to the source row.
    */
  def sampleFrames(decoded: Dataset[DecodedRow], everyMs: Long): DataFrame = {
    val df = decoded.toDF()
    df.filter(col("kind") === "video")
      .select(
        col("media_id"),
        explode(sequence(lit(0L), col("meta.durationMs"), lit(everyMs)))
          .as("frame_ms")
      )
  }

  /** Feature extraction: embedding column (`array<float>`) per media
    * row, ready for [[graft.operators.Similarity]] ANN search.
    */
  def embed(decoded: Dataset[DecodedRow], dim: Int = 64): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions { rows =>
      // real models batch rows here (e.g. groups of 32 through a session)
      rows.grouped(32).flatMap { batch =>
        batch.map(r => (r.media_id, fakeEmbed(r.bytes, dim)))
      }
    }.toDF("media_id", "embedding")
  }

  /** Build a media table from any (id, text) corpus — test/bench helper
    * that treats UTF-8 text bytes as the opaque payload.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")
        ).as("kind"),
        encode(col("text"), "UTF-8").as("bytes")
      )
      .as[MediaRow]
  }
}
