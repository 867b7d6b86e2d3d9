package graft

import graft.operators.Boilerplate
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    // srcA: header in 3/4 docs, body paragraphs unique
    (1L, "srcA", "HEAD nav\n\nbody one"),
    (2L, "srcA", "HEAD nav\n\nbody two"),
    (3L, "srcA", "HEAD nav\n\nbody three"),
    (4L, "srcA", "body four"),
    // srcB: same HEAD text appears in only 1/3 docs — NOT boilerplate there
    (5L, "srcB", "HEAD nav\n\nbody five"),
    (6L, "srcB", "body six"),
    (7L, "srcB", "body seven\n\nbody seven")
  ).toDF("id", "source", "text")

  test("df-threshold flags every occurrence, scoped per source") {
    val out = Boilerplate
      .flagBoilerplate(docs, "id", "source", "text", minNum = 1L, minDen = 2L)
      .cache()
    // srcA: HEAD nav in 3/4 docs >= 1/2 -> all 3 occurrences flagged
    assert(out.filter($"source" === "srcA" && $"boiler").count() === 3)
    assert(out.filter($"source" === "srcA" && $"boiler")
      .select("para_docs").distinct().as[Long].collect().toSeq === Seq(3L))
    // srcB: HEAD nav in 1/3 docs < 1/2 -> not flagged there
    assert(out.filter($"source" === "srcB" && $"id" === 5L && $"idx" === 0L)
      .select("boiler").as[Boolean].head() === false)
    // doc 7's repeated paragraph is 1 doc of 3 — repetition within a doc
    // does not inflate document frequency
    assert(out.filter($"id" === 7L && $"boiler").count() === 0)
    out.unpersist()
  }

  test("threshold boundary is exact: df == num/den * srcDocs flags") {
    // srcA has 4 docs; a para in exactly 2 of them at 1/2 must flag
    val d = Seq(
      (1L, "s", "X\n\na"), (2L, "s", "X\n\nb"),
      (3L, "s", "c"), (4L, "s", "d")).toDF("id", "source", "text")
    val out = Boilerplate.flagBoilerplate(d, "id", "source", "text", 1L, 2L)
    assert(out.filter($"boiler").count() === 2)
    // and 2/4 under a strict 3/4 threshold must not
    val strict = Boilerplate.flagBoilerplate(d, "id", "source", "text", 3L, 4L)
    assert(strict.filter($"boiler").count() === 0)
  }

  test("blank paragraphs are dropped, offsets and lengths kept") {
    val d = Seq((1L, "s", "  \n\npara here\n\n")).toDF("id", "source", "text")
    val out = Boilerplate.flagBoilerplate(d, "id", "source", "text", 9L, 10L)
    val rows = out.select("idx", "plen").as[(Long, Long)].collect()
    assert(rows.toSeq === Seq((1L, 9L)))
  }
}
