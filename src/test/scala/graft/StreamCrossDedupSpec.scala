package graft

import java.nio.file.Files

import graft.operators.CrossDedup
import graft.streaming.StreamCrossDedup
import org.apache.spark.sql.DataFrame

/** Streaming corpus admission: each micro-batch dedups against the
  * corpus-so-far (reference + earlier admissions), proven equal to a
  * sequential batch replay with the q135 operator; restarts continue
  * from the returned artifacts.
  */
class StreamCrossDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val refText = "the reference corpus document about parquet " +
    "footers and column statistics that prune row groups during scans"
  private val textA = "structured streaming keeps per key state in a " +
    "store and evicts it when the watermark passes the window end " +
    "which bounds memory use"
  // verified: shares all 4 md5-LSH bands with textA (tail-word change)
  private val textD = textA.replace("memory use", "memory growth")
  private val textE = "a completely fresh document mentioning broadcast " +
    "joins adaptive execution and skew handling with its own vocabulary"

  private def flagsMap(df: DataFrame): Map[Long, (Boolean, Long, Boolean)] =
    df.collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("stream admission dedups against earlier admitted batches") {
    val srcDir = Files.createTempDirectory("xd-src").toString
    val ckpt = Files.createTempDirectory("xd-ckpt").toString
    val reference = Seq((1L, refText)).toDF("doc_id", "text")

    // wave 1: A fresh (admit), B exact copy of the reference (reject)
    Seq((10L, textA), (11L, refText)).toDF("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def src = spark.readStream.schema(schema).parquet(srcDir)

    val seen = scala.collection.mutable.ArrayBuffer.empty[Map[Long, (Boolean, Long, Boolean)]]
    val (n1, h1, b1) = StreamCrossDedup.run(
      src, reference, "doc_id", "text", ckpt)((f, _, _) => seen += flagsMap(f))
    assert(n1 === 1)
    assert(seen(0)(10L) === ((false, 0L, true))) // fresh → admitted
    assert(seen(0)(11L)._1 === true) // exact vs reference
    assert(seen(0)(11L)._3 === false)

    // wave 2, after a RESTART seeded with the returned artifacts:
    // C exact copy of the ADMITTED A, D near-dup of A, E fresh
    Seq((20L, textA), (21L, textD), (22L, textE)).toDF("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    val (n2, h2, b2) = StreamCrossDedup.runWithArtifacts(
      src, h1, b1, "doc_id", "text", ckpt)((f, _, _) => seen += flagsMap(f))
    assert(n2 === 1)
    val w2 = seen(1)
    assert(w2(20L)._1 === true) // exact vs an earlier ADMISSION
    assert(!w2(21L)._1 && w2(21L)._2 >= 1L && !w2(21L)._3) // near-dup of A
    assert(w2(22L) === ((false, 0L, true))) // fresh → admitted

    // parity: wave 2 equals the batch operator run against
    // reference ∪ wave-1 admissions
    val corpusAfter1 = reference
      .unionByName(Seq((10L, textA)).toDF("doc_id", "text"))
    val batch2 = flagsMap(CrossDedup.flagAgainst(corpusAfter1,
      Seq((20L, textA), (21L, textD), (22L, textE)).toDF("doc_id", "text"),
      "doc_id", "text"))
    assert(w2 === batch2)

    // restart with no new data: checkpoint prevents re-processing
    val (n3, _, _) = StreamCrossDedup.runWithArtifacts(
      src, h2, b2, "doc_id", "text", ckpt)((f, _, _) => seen += flagsMap(f))
    assert(n3 === 0)
  }

  test("intra-batch exact copies index once but both flags emit") {
    val srcDir = Files.createTempDirectory("xd2-src").toString
    val ckpt = Files.createTempDirectory("xd2-ckpt").toString
    val reference = Seq((1L, refText)).toDF("doc_id", "text")
    Seq((30L, textE), (31L, textE)).toDF("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def src = spark.readStream.schema(schema).parquet(srcDir)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Map[Long, (Boolean, Long, Boolean)]]
    val (_, h1, b1) = StreamCrossDedup.run(
      src, reference, "doc_id", "text", ckpt)((f, _, _) => seen += flagsMap(f))
    // both admitted (intra-batch copies are not flagged against each
    // other — the operator contract)...
    assert(seen(0)(30L)._3 && seen(0)(31L)._3)
    // ...the index keeps ONE row for the pair...
    assert(b1.filter(b1("__ref_id") >= 30L).select("__ref_id")
      .distinct().count() === 1L)
    // ...and a later copy is rejected against it
    Seq((32L, textE)).toDF("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    StreamCrossDedup.runWithArtifacts(
      src, h1, b1, "doc_id", "text", ckpt)((f, _, _) => seen += flagsMap(f))
    assert(seen(1)(32L)._1 === true && seen(1)(32L)._3 === false)
  }
  test("artifact re-application is idempotent (crash-replay safety)") {
    val reference = Seq((1L, refText)).toDF("doc_id", "text")
    val (h1, b1) = CrossDedup.artifacts(
      reference.unionByName(Seq((10L, textA)).toDF("doc_id", "text")),
      "doc_id", "text")
    // duplicate every artifact row — the state a crashed-then-replayed
    // batch update leaves behind
    val h2 = h1.unionByName(h1)
    val b2 = b1.unionByName(b1)
    val probe = Seq((20L, textA), (21L, textD), (22L, textE))
      .toDF("doc_id", "text")
    val once = flagsMap(CrossDedup
      .flagAgainstArtifacts(h1, b1, probe, "doc_id", "text"))
    val twice = flagsMap(CrossDedup
      .flagAgainstArtifacts(h2, b2, probe, "doc_id", "text"))
    assert(once === twice)
  }
}
