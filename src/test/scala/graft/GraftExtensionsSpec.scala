package graft

class GraftExtensionsSpec extends SparkSpecBase {

  test("hmac_sha256_hex is callable from SQL once registered") {
    // same builder lambda the spark.sql.extensions path injects; a fresh
    // SparkContext (where the static conf applies) isn't possible in the
    // shared-JVM suite
    GraftExtensions.registerAll(spark)
    val out = spark
      .sql("SELECT hmac_sha256_hex(X'0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b', 'Hi There') AS h")
      .head()
      .getString(0)
    // RFC 4231 test case 1
    assert(out ===
      "b0344c61d8db38535ca8afceaf0bf12b881dc200c9833da726e9376c2e32cff7")
  }

  test("fvec_cosine is callable from SQL and type-checks") {
    GraftExtensions.registerAll(spark)
    val out = spark
      .sql("""SELECT fvec_cosine(
              |  CAST(ARRAY(1.0, 0.0) AS ARRAY<FLOAT>),
              |  CAST(ARRAY(0.6, 0.8) AS ARRAY<FLOAT>)) AS c""".stripMargin)
      .head()
      .getDouble(0)
    // float32 inputs → ~1e-8 representation error around 0.6
    assert(math.abs(out - 0.6) < 1e-6)
    // wrong input type → analysis-time failure, not wrong numbers
    intercept[Exception] {
      spark.sql("SELECT fvec_cosine(ARRAY('a'), ARRAY('b'))").head()
    }
  }
}
