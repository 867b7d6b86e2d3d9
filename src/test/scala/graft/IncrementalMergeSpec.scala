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

  test("stream-maintained aggregate equals a full recompute") {
    import graft.operators.IncrementalAgg
    val srcDir = Files.createTempDirectory("iva-src").toString
    val tableDir = Files.createTempDirectory("iva-table").toString
    val ckpt = Files.createTempDirectory("iva-ckpt").toString

    // wave 1: two groups, plus an in-batch duplicate on id=2
    Seq((1L, "g1", 10.0, 1L), (2L, "g1", 20.0, 1L),
      (2L, "g1", 21.0, 2L), (3L, "g2", 30.0, 1L))
      .toDF("id", "grp", "v", "seq")
      .write.mode("append").parquet(srcDir)

    val spec = MergeSpec(Seq("id"))
    val table = GraftTable(spark, tableDir, spec)
    val schema = spark.read.parquet(srcDir).schema
    def drain() = IncrementalMerge.runWithAgg(
      spark.readStream.schema(schema).parquet(srcDir),
      table, spec, ckpt, "grp", "v", orderCol = Some("seq"))

    val (b1, agg1) = drain()
    assert(b1 >= 1)
    val toMap = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
    assert(toMap(agg1) ===
      toMap(IncrementalAgg.countSum(table.read(), "grp", "v")))
    assert(toMap(agg1)("g1") === ((2L, 31.0))) // 10 + last-wins 21

    // wave 2: update g1's id=1 and insert a g3 row; the maintained
    // aggregate (seeded from the table, folded with the new batch's
    // change feed) must equal recomputing over the merged table
    Seq((1L, "g1", 11.0, 3L), (4L, "g3", 40.0, 1L))
      .toDF("id", "grp", "v", "seq")
      .write.mode("append").parquet(srcDir)
    val (b2, agg2) = drain()
    assert(b2 >= 1)
    assert(toMap(agg2) ===
      toMap(IncrementalAgg.countSum(table.read(), "grp", "v")))
    assert(toMap(agg2)("g1") === ((2L, 32.0)))
    assert(toMap(agg2)("g3") === ((1L, 40.0)))
  }

  test("stream-maintained index stats equal a full recompute") {
    import graft.functions.TextFunctions
    import graft.operators.IndexStats
    val srcDir = Files.createTempDirectory("idx-src").toString
    val tableDir = Files.createTempDirectory("idx-table").toString
    val ckpt = Files.createTempDirectory("idx-ckpt").toString

    // wave 1: three docs, one in-batch duplicate on id=2 (last wins —
    // its FIRST version's terms must not leak into the df table)
    Seq((1L, "alpha beta", 1L), (2L, "beta gamma", 1L),
      (2L, "beta delta", 2L), (3L, "alpha", 1L))
      .toDF("id", "text", "seq")
      .write.mode("append").parquet(srcDir)

    val spec = MergeSpec(Seq("id"))
    val table = GraftTable(spark, tableDir, spec)
    val schema = spark.read.parquet(srcDir).schema
    def drain() = IncrementalMerge.runWithIndexStats(
      spark.readStream.schema(schema).parquet(srcDir),
      table, spec, ckpt, "text", TextFunctions.tokensLocal,
      orderCol = Some("seq"))

    val toMap = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (b1, df1) = drain()
    assert(b1 >= 1)
    assert(toMap(df1) === toMap(IndexStats.termDf(
      table.read(), "text", TextFunctions.tokensLocal)))
    assert(toMap(df1) ===
      Map("alpha" -> 2L, "beta" -> 2L, "delta" -> 1L))

    // wave 2: update doc 1 (retires "beta" from it) + insert doc 4;
    // the maintained df must equal recomputing over the merged corpus
    Seq((1L, "alpha epsilon", 3L), (4L, "gamma", 1L))
      .toDF("id", "text", "seq")
      .write.mode("append").parquet(srcDir)
    val (b2, df2) = drain()
    assert(b2 >= 1)
    assert(toMap(df2) === toMap(IndexStats.termDf(
      table.read(), "text", TextFunctions.tokensLocal)))
    assert(toMap(df2) === Map("alpha" -> 2L, "beta" -> 1L,
      "delta" -> 1L, "epsilon" -> 1L, "gamma" -> 1L))
  }

  test("runWithAgg returns an empty aggregate when nothing streams") {
    val srcDir = Files.createTempDirectory("iva-empty-src").toString
    val tableDir = Files.createTempDirectory("iva-empty-table").toString
    val ckpt = Files.createTempDirectory("iva-empty-ckpt").toString
    val schema = Seq((1L, "g", 1.0, 1L)).toDF("id", "grp", "v", "seq")
      .schema
    // fresh table + a source that delivers zero micro-batches: the
    // returned aggregate must be an EMPTY frame, not null
    val (_, agg) = IncrementalMerge.runWithAgg(
      spark.readStream.schema(schema).parquet(srcDir),
      GraftTable(spark, tableDir, MergeSpec(Seq("id"))),
      MergeSpec(Seq("id")), ckpt, "grp", "v", orderCol = Some("seq"))
    assert(agg != null)
    assert(agg.isEmpty)
  }
}
