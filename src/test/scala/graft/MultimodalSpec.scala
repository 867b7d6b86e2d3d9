package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {

  private lazy val media = Multimodal.mediaFromDocuments(
    spark,
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  )

  test("decode is deterministic and preserves ids/partitioning") {
    val d1 = Multimodal.decode(media).collect()
      .map(r => r.media_id -> r.meta).toMap
    val d2 = Multimodal.decode(media).collect()
      .map(r => r.media_id -> r.meta).toMap
    assert(d1 === d2)
    assert(d1.size === media.count())
    assert(d1.values.forall(m => m.format.startsWith("fake/")))
  }

  test("resize only shrinks images within bounds") {
    val decoded = Multimodal.decode(media)
    val resized = Multimodal.resize(decoded, 128, 128).collect()
    resized.filter(_.kind == "image").foreach { r =>
      assert(r.meta.width <= 128 && r.meta.height <= 128)
    }
    val before = decoded.collect().map(r => r.media_id -> r.meta).toMap
    resized.filterNot(_.kind == "image").foreach { r =>
      assert(r.meta === before(r.media_id)) // pass-through
    }
  }

  test("frame sampling explodes one row per sampled frame") {
    val decoded = Multimodal.decode(media)
    val frames = Multimodal.sampleFrames(decoded, everyMs = 60000)
    val counts = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val durations = decoded.filter(col("kind") === "video").collect()
      .map(r => r.media_id -> r.meta.durationMs).toMap
    assert(counts.keySet === durations.keySet)
    durations.foreach { case (id, ms) =>
      assert(counts(id) === ms / 60000 + 1)
    }
  }

  test("embeddings have the contract shape and feed ANN search") {
    val decoded = Multimodal.decode(media)
    val emb = Multimodal.embed(decoded, dim = 16)
    assert(emb.schema("embedding").dataType.simpleString
      === "array<float>")
    assert(emb.select(size(col("embedding"))).distinct().head().getInt(0)
      === 16)
    // plug straight into the similarity operator
    val topk = graft.operators.Similarity.bruteForceTopK(
      emb, "media_id", "embedding", emb.limit(3), "media_id",
      "embedding", k = 2)
    assert(topk.count() === 6)
  }
}
