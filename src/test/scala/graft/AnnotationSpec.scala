package graft

import graft.operators.Annotation
import org.apache.spark.sql.functions._

class AnnotationSpec extends SparkSpecBase {
  import spark.implicits._

  test("resolveVotes collapses an annotator's duplicate votes to the min label") {
    val raw = Seq(
      (1L, 0L, "y"), (1L, 0L, "x"), // duplicate votes, min wins
      (1L, 1L, "y"),
      (2L, 0L, null.asInstanceOf[String]) // null is not a vote
    ).toDF("item", "ann", "lbl")
    val got = Annotation.resolveVotes(raw, "item", "ann", "lbl")
      .as[(Long, Long, String)].collect().toSet
    assert(got === Set((1L, 0L, "x"), (1L, 1L, "y")))
  }

  test("majorityVote picks most votes, ties to the smallest label") {
    val votes = Seq(
      (1L, 0L, "x"), (1L, 1L, "x"), (1L, 2L, "y"), // clear majority
      (2L, 0L, "y"), (2L, 1L, "x") // tie -> smallest label x
    ).toDF("item", "ann", "label")
    val got = Annotation.majorityVote(votes, "item", "label")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got === Set((1L, "x", 2L, 3L), (2L, "x", 1L, 2L)))
  }

  test("cohenKappa matches the hand-computed 4-item example exactly") {
    // pairs (x,x),(x,y),(y,y),(y,y): agree=3, n=4, na(x,y)=(2,2),
    // nb=(1,3), pe_num=2*1+2*3=8, kappa=(12-8)/(16-8)=0.5
    val votes = Seq(
      (1L, 0L, "x"), (1L, 1L, "x"),
      (2L, 0L, "x"), (2L, 1L, "y"),
      (3L, 0L, "y"), (3L, 1L, "y"),
      (4L, 0L, "y"), (4L, 1L, "y")
    ).toDF("item", "ann", "label")
    val r = Annotation.cohenKappa(votes, "item", "ann",
      col("label"), lit(0L), lit(1L)).head()
    assert(r.getAs[Long]("n_items") === 4L)
    assert(r.getAs[Long]("agree") === 3L)
    assert(r.getAs[Long]("pe_num") === 8L)
    assert(r.getAs[Long]("kappa_num") === 4L)
    assert(r.getAs[Long]("kappa_den") === 8L)
    assert(r.getAs[Double]("kappa") === 0.5)
  }

  test("fleissKappa matches the hand-computed 3-item 2-rater example") {
    // cells: i1 {x:2}, i2 {x:1,y:1}, i3 {y:2} -> S2=10, Se=18, Nn=6,
    // kappa = ((10-6)*6 - 18) / (36 - 18) = 6/18 = 1/3; an item with
    // only one rater must be excluded
    val votes = Seq(
      (1L, 0L, "x"), (1L, 1L, "x"),
      (2L, 0L, "x"), (2L, 1L, "y"),
      (3L, 0L, "y"), (3L, 1L, "y"),
      (9L, 0L, "x") // 1 rater only -> excluded at n=2
    ).toDF("item", "ann", "label")
    val r = Annotation.fleissKappa(votes, "item", "label", n = 2).head()
    assert(r.getAs[Long]("n_items") === 3L)
    assert(r.getAs[Long]("s2") === 10L)
    assert(r.getAs[Long]("se") === 18L)
    assert(r.getAs[Long]("kappa_num") === 6L)
    assert(r.getAs[Long]("kappa_den") === 18L)
    assert(math.abs(r.getAs[Double]("kappa") - 1.0 / 3.0) < 1e-15)
  }

  test("perfect agreement gives kappa exactly 1 in both statistics") {
    val votes = Seq(
      (1L, 0L, "x"), (1L, 1L, "x"),
      (2L, 0L, "y"), (2L, 1L, "y"),
      (3L, 0L, "x"), (3L, 1L, "x")
    ).toDF("item", "ann", "label")
    val c = Annotation.cohenKappa(votes, "item", "ann",
      col("label"), lit(0L), lit(1L)).head()
    assert(c.getAs[Double]("kappa") === 1.0)
    val f = Annotation.fleissKappa(votes, "item", "label", n = 2).head()
    assert(f.getAs[Double]("kappa") === 1.0)
  }
}
