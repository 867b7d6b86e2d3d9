package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokenCount handles empty, blank, and multi-space text") {
    val df = Seq(
      ("", 0L),
      ("   ", 0L),
      ("one", 1L),
      ("a b  c", 3L),
      (" padded text ", 2L)
    ).toDF("text", "expected")
    df.select(tokenCount(col("text")).as("n"), col("expected"))
      .collect()
      .foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("typeTokenRatio: diverse = 1.0, repeated → 1/n") {
    val out = Seq("a b c d", "x x x x")
      .toDF("text")
      .select(typeTokenRatio(col("text")))
      .collect()
      .map(_.getDouble(0))
    assert(out(0) === 1.0)
    assert(out(1) === 0.25)
  }

  test("wordNgrams produces sliding shingles; short docs yield one") {
    val grams = Seq("a b c d")
      .toDF("text")
      .select(wordNgrams(col("text"), 3))
      .head()
      .getSeq[String](0)
    assert(grams === Seq("a b c", "b c d"))
    val short = Seq("a b")
      .toDF("text")
      .select(wordNgrams(col("text"), 3))
      .head()
      .getSeq[String](0)
    assert(short === Seq("a b"))
  }

  test("fingerprint: equal texts equal, different texts differ") {
    val fps = Seq(
      (1, "the quick brown fox jumps over the lazy dog today"),
      (2, "the quick brown fox jumps over the lazy dog today"),
      (3, "an entirely different sentence with other words inside it")
    ).toDF("id", "text")
      .select(col("id"), fingerprint(col("text")).as("fp"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    assert(fps(1) === fps(2))
    assert(fps(1) !== fps(3))
  }

  test("langId recognizes real-language samples") {
    val df = Seq(
      ("the cat sat on the mat and looked out of the window", "en"),
      ("der Hund und die Katze spielen in dem großen Garten", "de"),
      ("le chien et le chat jouent dans le jardin que nous aimons", "fr"),
      ("el perro y el gato juegan en el jardín de la casa", "es"),
      ("今天天气很好我们一起去公园散步吧", "zh"),
      ("", "und")
    ).toDF("text", "expected")
    df.select(langId(col("text")).as("pred"), col("expected"))
      .collect()
      .foreach(r => assert(r.getString(0) === r.getString(1),
        s"predicted ${r.getString(0)}, expected ${r.getString(1)}"))
  }

  test("contamination report counts shared grams and bench docs hit") {
    import graft.operators.Decontaminate
    val docs = Seq(
      (1L, "a b c d e f"), // shares "a b c" with bench 10, "d e f" with 11
      (2L, "x y z w v u"), // clean
      (3L, "a b c q r s")  // shares "a b c" with bench 10 only
    ).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "a b c"),
      (11L, "d e f")
    ).toDF("bench_id", "text")
    val got = Decontaminate
      .contaminationReport(docs, "doc_id", "text", bench, "bench_id",
        "text", n = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === Map(1L -> ((2L, 2L)), 3L -> ((1L, 1L)))) // doc 2 absent
  }

  test("repetition kernel counts tokens, top grams, and distinct trigrams") {
    val r = Seq("a a a b a b x")
      .toDF("text")
      .select(repetitionStatsUdf(col("text")).as("s"))
      .select("s._1", "s._2", "s._3", "s._4", "s._5", "s._6")
      .head()
    assert(r.getLong(0) === 7) // tokens
    assert(r.getLong(1) === 4) // "a" appears 4×
    assert(r.getLong(2) === 6) // bigrams
    assert(r.getLong(3) === 2) // "a a" and "a b" both twice; max 2
    assert(r.getLong(4) === 5) // trigrams
    assert(r.getLong(5) === 5) // "a a a","a a b","a b a","b a b","a b x" all distinct
  }

  test("quality ratios on punctuation-bearing text") {
    val r = Seq("Hello, world! This is fine.")
      .toDF("text")
      .select(
        punctRatio(col("text")).as("p"),
        alphaRatio(col("text")).as("a"),
        stopwordRatio(col("text"), Seq("is", "this")).as("s")
      )
      .head()
    assert(r.getDouble(0) > 0.0 && r.getDouble(0) < 0.2)
    assert(r.getDouble(1) > 0.7)
    assert(r.getDouble(2) === 0.2) // "is" of 5 tokens ("This" differs by case)
  }

  test("qChunking emits no rows for empty/whitespace-only documents") {
    // without the n_tok > 0 guard, sequence(0, n_chunks - 1) becomes
    // sequence(0, -1) whose implicit -1 step emits spurious chunks
    val dir = java.nio.file.Files.createTempDirectory("chunk-test")
    Seq((1L, "one two three"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.TextQueries.qChunking(spark, dir.toString)
      .collect()
    assert(rows.map(_.getLong(0)).toSet === Set(1L))
    assert(rows.length === 1) // 3 tokens → one 3-token chunk
    assert(rows.head.getLong(2) === 3L)
  }
}
