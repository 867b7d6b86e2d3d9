package graft

import java.util.concurrent.atomic.LongAdder

import graft.nlp.ModelRunner
import org.apache.spark.sql.functions._

/** Deterministic fake provider counting invocations via accumulators
  * (top-level so the closure stays serializable).
  */
class FakeModelClient(
    callCounter: org.apache.spark.util.LongAccumulator,
    promptCounter: org.apache.spark.util.LongAccumulator
) extends ModelRunner.ModelClient {
  override def complete(prompts: Seq[String]): Seq[String] = {
    callCounter.add(1)
    promptCounter.add(prompts.length)
    prompts.map(p => s"ANN:${p.toUpperCase}")
  }
}

class ModelRunnerSpec extends SparkSpecBase {
  import spark.implicits._

  test("annotate: cache hits skip the model, misses batch through it") {
    val calls = spark.sparkContext.longAccumulator("calls")
    val prompts = spark.sparkContext.longAccumulator("prompts")
    val client = new FakeModelClient(calls, prompts)

    val notes = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("note_id", "text")
    val alphaSum = Seq("alpha").toDF("t")
      .select(sha2(col("t"), 256)).head().getString(0)
    val cache = Seq((alphaSum, "CACHED")).toDF("checksum", "result")

    val (annotated, fresh) = ModelRunner.annotate(
      notes, "note_id", "text", cache, client, batchSize = 2)
    val byId = annotated.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId(1L) === "CACHED")
    assert(byId(2L) === "ANN:BETA")
    assert(byId(3L) === "ANN:GAMMA")
    assert(prompts.value === 2) // only the two misses hit the model
    assert(fresh.count() === 2)

    // merge fresh entries, rerun: zero model traffic
    val cache2 = cache.unionByName(fresh)
    val calls2 = spark.sparkContext.longAccumulator("calls2")
    val prompts2 = spark.sparkContext.longAccumulator("prompts2")
    val (annotated2, fresh2) = ModelRunner.annotate(
      notes, "note_id", "text", cache2,
      new FakeModelClient(calls2, prompts2))
    annotated2.collect()
    assert(prompts2.value === 0)
    assert(fresh2.count() === 0)
  }
}
