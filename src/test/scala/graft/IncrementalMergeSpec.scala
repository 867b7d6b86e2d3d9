package graft

import java.nio.file.Files

import graft.operators.MergeOps.MergeSpec
import graft.sinks.GraftTable
import graft.streaming.IncrementalMerge
import org.apache.spark.sql.functions._

class IncrementalMergeSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed upserts merge exactly-once across restarts") {
    val srcDir = Files.createTempDirectory("inc-src").toString
    val tableDir = Files.createTempDirectory("inc-table").toString
    val ckpt = Files.createTempDirectory("inc-ckpt").toString

    // wave 1: initial rows (with an in-batch duplicate — last wins)
    Seq((1L, "a", 1L), (2L, "b", 1L), (2L, "b2", 2L))
      .toDF("id", "v", "seq")
      .write.mode("append").parquet(srcDir)

    val spec = MergeSpec(Seq("id"))
    val table = GraftTable(spark, tableDir, spec)
    val schema = spark.read.parquet(srcDir).schema

    def drain(): Long = IncrementalMerge.run(
      spark.readStream.schema(schema).parquet(srcDir),
      table, spec, ckpt, orderCol = Some("seq"))

    assert(drain() >= 1)
    val after1 = table.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(after1.toSeq === Seq((1L, "a"), (2L, "b2")))

    // restart with no new data: checkpoint prevents re-application
    assert(drain() === 0)
    assert(table.read().count() === 2)

    // wave 2: update + insert, then drain again from the same checkpoint
    Seq((2L, "b3", 3L), (3L, "c", 1L)).toDF("id", "v", "seq")
      .write.mode("append").parquet(srcDir)
    assert(drain() >= 1)
    val after2 = table.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(after2.toSeq === Seq((1L, "a"), (2L, "b3"), (3L, "c")))
  }
}
