package graft

import graft.fhir.SchemaWidening
import graft.operators.SkewOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SkewAndSchemaSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedJoin matches the plain join result on skewed data") {
    // 90% of rows share one hot key
    val skewed = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id"))
        .as("k"), col("id").as("payload"))
    val dim = Seq((1L, "hot"), (20L, "cold"), (30L, "other"))
      .toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).agg(
      count(lit(1)), sum("payload")).head()
    val salted = SkewOps.saltedJoin(skewed, dim, "k", saltFactor = 8)
      .agg(count(lit(1)), sum("payload")).head()
    assert(plain === salted)
  }

  test("bloomPrefilter: join result unchanged, fact rows cut hard") {
    val fact = spark.range(20000)
      .select((col("id") % 1000).as("k"), col("id").as("payload"))
    // 1% -selective dim: 10 of the 1000 key values
    val dim = spark.range(10).select((col("id") * 100).as("k"),
      concat(lit("d"), col("id")).as("label"))
    val plain = fact.join(dim, Seq("k"))
      .agg(count(lit(1)), sum("payload")).head()
    val pruned = SkewOps.bloomPrefilter(fact, "k", dim, "k",
      expectedItems = 10, fpp = 0.01)
    val viaBloom = pruned.join(dim, Seq("k"))
      .agg(count(lit(1)), sum("payload")).head()
    assert(plain === viaBloom) // no false negatives, FPs die in the join
    // the point of the operator: the shuffle input shrank ~100×
    val kept = pruned.count()
    assert(kept >= 200) // the 10 real keys' rows (20 each) all survive
    assert(kept <= 1000, s"bloom kept $kept of 20000 rows")
  }

  test("bloomPrefilter keeps string-keyed joins intact") {
    // regression: a long-cast of string keys nulls out and would drop
    // every row — the filter must hash the key's own representation
    val fact = spark.range(1000)
      .select(concat(lit("k"), col("id") % 100).as("k"),
        col("id").as("payload"))
    val dim = Seq("k7", "k42").toDF("k")
    val plain = fact.join(dim, Seq("k")).count()
    val viaBloom = SkewOps.bloomPrefilter(fact, "k", dim, "k",
      expectedItems = 2, fpp = 0.01)
      .join(dim, Seq("k")).count()
    assert(plain === 20L)
    assert(viaBloom === plain)
  }

  test("bloomPrefilter handles mismatched key types without false negatives") {
    // double fact key × long dim key: the bloom must hash the dim key
    // in the FACT key's representation, or "7" vs "7.0" mismatches
    // would silently drop matching rows before the join
    val fact = spark.range(100)
      .select((col("id") % 10).cast("double").as("k"),
        col("id").as("payload"))
    val dim = Seq(7L, 3L).toDF("k")
    val plain = fact.join(dim, fact("k") === dim("k")).count()
    val viaBloom = SkewOps.bloomPrefilter(fact, "k", dim, "k",
      expectedItems = 2, fpp = 0.01)
    assert(plain === 20L)
    assert(viaBloom.join(dim, viaBloom("k") === dim("k")).count() === plain)
  }

  test("keySkewProfile surfaces the heavy hitter") {
    val skewed = spark.range(1000)
      .select(when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id"))
        .as("k"))
    val top = SkewOps.keySkewProfile(skewed, "k", topN = 1).head()
    assert(top.getLong(0) === 1L)
    assert(top.getDouble(2) > 0.8)
  }

  test("schema widening appends observed fields, keeps catalog types") {
    val catalog = StructType(Seq(
      StructField("id", StringType),
      StructField("nested", StructType(Seq(
        StructField("a", StringType)))),
      StructField("arr", ArrayType(StructType(Seq(
        StructField("x", StringType)))))
    ))
    val observed = StructType(Seq(
      StructField("id", LongType), // conflict → catalog wins
      StructField("nested", StructType(Seq(
        StructField("a", StringType),
        StructField("b", DoubleType)))), // new nested field
      StructField("arr", ArrayType(StructType(Seq(
        StructField("x", StringType),
        StructField("y", BooleanType))))),
      StructField("extra", StringType) // new top-level
    ))
    val widened = SchemaWidening.widen(catalog, observed)
    assert(widened("id").dataType === StringType)
    assert(widened("nested").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("a", "b"))
    assert(widened("arr").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].fieldNames.toSeq
      === Seq("x", "y"))
    assert(widened.fieldNames.contains("extra"))
  }

  test("widened schema round-trips through a real read + scrub") {
    val dir = java.nio.file.Files.createTempDirectory("widen").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "Patient.ndjson"),
      """{"resourceType":"Patient","id":"p1","gender":"female","customField":"site-specific"}"""
        .getBytes("UTF-8"))
    val observed = spark.read.json(s"$dir/Patient.ndjson").schema
    val widened = SchemaWidening.widen(
      graft.fhir.FhirSchemas.patient, observed)
    val df = graft.sources.NdjsonSource.readResource(
      spark, dir, "Patient", Some(widened))
    assert(df.columns.contains("customField")) // observed survives
    assert(df.columns.contains("birthDate")) // catalog survives
    val cb = graft.deid.Codebook.withSalt("42" * 32)
    val out = graft.deid.ScrubCompiler.scrub(df, "Patient", cb)
    assert(!out.columns.contains("customField")) // and policy drops it
  }
}
