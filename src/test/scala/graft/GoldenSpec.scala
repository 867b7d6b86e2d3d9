package graft

/** Whole-tree golden diff (the reference's primary harness shape,
  * SURVEY §5.1-2): run the full ETL over checked-in fixtures with a
  * pinned codebook salt and compare every output table structurally
  * against the reviewed expected files. Regenerate intentionally with
  * `sbt "Test/runMain graft.GoldenGen"` and review the diff.
  */
class GoldenSpec extends SparkSpecBase {

  test("full pipeline output matches the golden files") {
    val actual = GoldenHarness.run(spark)
    GoldenHarness.tables.foreach { table =>
      val expected = GoldenHarness.readExpected(table)
      val got = actual.getOrElse(table, Nil)
      assert(got === expected, s"golden mismatch for table '$table'")
    }
    // determinism guard: rerunning yields identical canonical rows
    val again = GoldenHarness.run(spark)
    assert(again === actual)
  }
}
