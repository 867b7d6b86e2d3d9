package graft

import graft.operators.SpanDedup
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpecBase {
  import spark.implicits._

  /** Independent brute force: mark characters covered by every
    * non-first occurrence of a duplicated L-char span, drop them.
    */
  private def bruteClean(
      docs: Seq[(Long, String)], L: Int): Map[Long, String] = {
    val occ = for {
      (id, t) <- docs
      p <- 1 to t.length - L + 1
    } yield (t.substring(p - 1, p - 1 + L), (id, p.toLong))
    val dup: Set[(Long, Long)] = occ.groupBy(_._1).values
      .filter(_.size > 1)
      .flatMap(_.map(_._2).sortBy(identity).drop(1))
      .toSet
    docs.map { case (id, t) =>
      val covered = Array.fill(t.length)(false)
      for {
        p <- 1 to math.max(0, t.length - L + 1)
        if dup((id, p.toLong))
        c <- p until p + L
      } covered(c - 1) = true
      id -> t.zipWithIndex.collect {
        case (ch, i) if !covered(i) => ch
      }.mkString
    }.toMap
  }

  // repeated 8-char spans within and across docs, an exact-duplicate
  // pair, short docs below the span length, and a doc that is one big
  // duplicated region
  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog by the river"),
    (2L, "the quick brown fox naps under the lazy dog by the shore"),
    (3L, "the quick brown fox jumps over the lazy dog by the river"),
    (4L, "tiny"),
    (5L, "unrelated content with no repeats whatsoever in this one!")
  )

  test("removeSpans equals independent brute-force span removal") {
    for (l <- Seq(8, 16, 32)) {
      val got = SpanDedup
        .removeSpans(corpus.toDF("doc_id", "text"), "doc_id", "text",
          spanLen = l)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === bruteClean(corpus, l), s"spanLen=$l")
    }
  }

  test("exact-duplicate doc empties; canonical copy survives intact") {
    val got = SpanDedup
      .removeSpans(corpus.toDF("doc_id", "text"), "doc_id", "text",
        spanLen = 32)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 is the canonical copy of the 1/3 duplicate pair: every one
    // of doc 3's full windows duplicates doc 1, so doc 3 is fully
    // covered and doc 1 keeps its text
    assert(got(1L) === corpus.toMap.apply(1L))
    assert(got(3L) === "")
    // short doc has no full window — untouched
    assert(got(4L) === "tiny")
    assert(got(5L) === corpus.toMap.apply(5L))
  }

  test("cutIntervals emits disjoint in-bounds maximal runs") {
    val cuts = SpanDedup
      .cutIntervals(corpus.toDF("doc_id", "text"), "doc_id", "text",
        spanLen = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val text = corpus.toMap
    cuts.groupBy(_._1).foreach { case (id, is) =>
      val sorted = is.sortBy(_._2)
      sorted.foreach { case (_, s, e) =>
        assert(s >= 1 && e <= text(id).length && s <= e)
      }
      // disjoint and non-adjacent (maximality: adjacent runs merge)
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) => assert(s2 > e1 + 1)
        case _ =>
      }
    }
    assert(cuts.nonEmpty)
  }
}
