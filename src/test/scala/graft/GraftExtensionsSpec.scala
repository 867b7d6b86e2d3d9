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
}
