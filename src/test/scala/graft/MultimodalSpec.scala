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

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("real PNG payloads decode, resize, and embed through JDK codecs") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", pngBytes(100, 60, 0xffffff)),
      Multimodal.MediaRow(2L, "image", pngBytes(40, 40, 0x000000)),
      Multimodal.MediaRow(3L, "image", "not an image".getBytes("UTF-8"))
    ).toDS()
    val decoded = Multimodal.decode(rows)
    val metas = decoded.collect().map(r => r.media_id -> r.meta).toMap
    // real headers on real payloads
    assert(metas(1L).width === 100 && metas(1L).height === 60)
    assert(metas(1L).format === "image/decoded")
    assert(metas(2L).width === 40 && metas(2L).height === 40)
    // junk payload falls back to the deterministic fake, not an error
    assert(metas(3L).format === "fake/raw")

    // resize produces a REAL smaller PNG: decoding the output re-reads
    // the new dimensions
    val resized = Multimodal.resize(decoded, 50, 50).collect()
      .map(r => r.media_id -> r).toMap
    assert(resized(1L).meta.width === 50 && resized(1L).meta.height === 30)
    assert(resized(1L).meta.format === "image/png")
    val reRead = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized(1L).bytes))
    assert(reRead.getWidth === 50 && reRead.getHeight === 30)
    // 40x40 already inside the box: a true pass-through — the exact
    // bytes survive (no silent PNG transcode of a no-op resize)
    assert(resized(2L).meta.width === 40 && resized(2L).meta.height === 40)
    assert(java.util.Arrays.equals(resized(2L).bytes,
      decoded.collect().find(_.media_id == 2L).get.bytes))

    // pixel embedding reflects real luminance: white ≈ 1.0, black = 0.0
    val emb = Multimodal.embed(decoded, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(emb(1L).forall(v => v > 0.95f))
    assert(emb(2L).forall(v => v === 0.0f))

    // non-perfect-square dim: every slot still receives pixels (the
    // ⌈√dim⌉ grid folds by modulo; a ⌊√dim⌋ grid left trailing zeros)
    val emb32 = Multimodal.embed(decoded, dim = 32).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(emb32(1L).forall(v => v > 0.95f))
  }

  test("real WAV payloads expose channel count and duration") {
    import spark.implicits._
    // 0.5s of silence, 8kHz mono 8-bit PCM, written by the JDK itself
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val data = new Array[Byte](4000)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, data.length)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", baos.toByteArray)).toDS()
    val meta = Multimodal.decode(rows).collect().head.meta
    assert(meta.channels === 1)
    assert(meta.durationMs === 500L)
    assert(meta.format === "audio/wav")
  }

  private def pngOf(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) img.setRGB(x, y, f(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("perceptual hash: identity collides, brightness shift tolerated, structure rejected") {
    import spark.implicits._
    def grey(v: Int) = (v << 16) | (v << 8) | v
    val grad = pngOf((x, _) => grey(x * 255 / 63))
    val gradBright = pngOf((x, _) => grey(math.min(255, x * 255 / 63 + 8)))
    val checker = pngOf((x, y) =>
      if (((x / 8) + (y / 8)) % 2 == 0) 0xFFFFFF else 0)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", grad),
      Multimodal.MediaRow(2L, "image", grad),
      Multimodal.MediaRow(3L, "image", gradBright),
      Multimodal.MediaRow(4L, "image", checker)).toDS()
    val h = Multimodal.perceptualHash(Multimodal.decode(media))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(1L) === h(2L))
    assert(hamming(h(1L), h(3L)) <= 3)
    assert(hamming(h(1L), h(4L)) > 3)
    val pairs = Multimodal.phashPairs(
      Multimodal.perceptualHash(Multimodal.decode(media)), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.get((1L, 2L)).contains(0))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((3L, 4L)))
  }

  test("aHash kernel thresholds cells by their own mean") {
    val cells = new Array[Float](64)
    cells(0) = 1.0f; cells(63) = 1.0f // mean = 2/64; only those two >= mean
    val bits = Multimodal.aHashBits(cells)
    assert(bits === ((1L << 0) | (1L << 63)))
    // uniform cells: every cell >= mean, all 64 bits set
    assert(Multimodal.aHashBits(Array.fill(64)(0.5f)) === -1L)
  }

  test("spectral audio fingerprint: amplitude-invariant, tone-separating") {
    import spark.implicits._
    // synthWav ids: same tone class (id mod 8), different amplitude
    // class (id div 8 mod 5) → MUST collide; different tone → differ
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", Multimodal.synthWav(1L)), // 300 Hz a0
      Multimodal.MediaRow(9L, "audio", Multimodal.synthWav(9L)), // 300 Hz a1
      Multimodal.MediaRow(33L, "audio", Multimodal.synthWav(33L)), // 300 Hz a4
      Multimodal.MediaRow(2L, "audio", Multimodal.synthWav(2L)), // 400 Hz
      Multimodal.MediaRow(7L, "audio", Multimodal.synthWav(7L)) // 900 Hz
    ).toDS()
    val fp = Multimodal.spectralFingerprint(Multimodal.decode(media))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(9L), "amplitude variant must collide")
    assert(fp(1L) === fp(33L), "amplitude variant must collide")
    assert(fp(1L) !== fp(2L), "different tones must separate")
    assert(fp(2L) !== fp(7L), "different tones must separate")
    // real decode round-trip: the fingerprint came from PCM samples,
    // not the byte fallback — the fallback of two different-amplitude
    // payloads could never collide (different bytes, different md5)
    val fallback = Multimodal
      .spectralFingerprint(Multimodal.decode(Seq(
        Multimodal.MediaRow(1L, "video", Multimodal.synthWav(1L)),
        Multimodal.MediaRow(9L, "video", Multimodal.synthWav(9L))).toDS()))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fallback(1L) !== fallback(9L))
  }

  test("synthPng: brightness variants collide per pattern class, classes separate") {
    import spark.implicits._
    // 8 pattern classes × 4 brightness offsets; the PNGs are genuinely
    // different payloads (real re-encodes), yet aHash must collapse the
    // brightness axis and keep the pattern axis — the q130 oracle
    // contract (grouping == id mod 8) through real JDK codecs
    val ids = (0L until 32L)
    val pngs = ids.map(Multimodal.synthPng)
    assert(pngs.map(_.toSeq).distinct.size === 32,
      "each (pattern, brightness) pair must be a distinct payload")
    // all really decode as PNGs (no fallback kernel in this path)
    pngs.foreach { b =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(b))
      assert(img != null && img.getWidth === 64 && img.getHeight === 64)
    }
    val media = ids.map(i =>
      Multimodal.MediaRow(i, "image", Multimodal.synthPng(i))).toDS()
    val h = Multimodal.perceptualHash(Multimodal.decode(media))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { i =>
      assert(h(i) === h(i % 8),
        s"brightness variant $i must collide with class base ${i % 8}")
    }
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (a <- 0L until 8L; b <- 0L until a) {
      assert(hamming(h(a), h(b)) === 16,
        s"classes $a/$b: one bright column each → 16 differing bits")
    }
    // and the banded pair join only pairs within a class
    val pairs = Multimodal.phashPairs(
        Multimodal.perceptualHash(Multimodal.decode(media)), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length === 8 * (4 * 3 / 2))
    assert(pairs.forall { case (a, b) => a % 8 === b % 8 })
  }
}
