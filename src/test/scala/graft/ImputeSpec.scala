package graft

import graft.operators.Impute
import org.apache.spark.sql.functions._

class ImputeSpec extends SparkSpecBase {
  import spark.implicits._

  test("nulls are filled with the group's exact lower-rank median") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(3.0)), ("a", Some(7.0)), ("a", None),
      ("b", Some(2.0)), ("b", Some(4.0)), ("b", None), ("b", None)
    ).toDF("g", "v")
    val out = Impute.medianImpute(df, "g", "v")
    // a: observed {1,3,7}, n=3, rank ceil(1.5)=2 -> 3.0
    assert(out.filter($"g" === "a" && $"imputed")
      .select("v").as[Double].collect().toSeq === Seq(3.0))
    // b: observed {2,4}, n=2, rank ceil(1)=1 -> lower median 2.0
    assert(out.filter($"g" === "b" && $"imputed")
      .select("v").as[Double].collect().toSeq === Seq(2.0, 2.0))
    // observed rows untouched, flag false
    assert(out.filter(!$"imputed").count() === 5)
    assert(out.filter(!$"imputed" && $"v".isNull).count() === 0)
  }

  test("an all-null group keeps its nulls but stays flagged") {
    val df = Seq(("a", Some(5.0)), ("c", None), ("c", None)).toDF("g", "v")
    val out = Impute.medianImpute(df, "g", "v")
    assert(out.filter($"g" === "c").select("imputed").as[Boolean]
      .collect().toSeq === Seq(true, true))
    assert(out.filter($"g" === "c" && $"v".isNull).count() === 2)
  }

  test("winsorize clips to exact lower-rank percentiles, nulls pass") {
    // 1..10 in one group: p10 -> rank ceil(1)=1 -> 1.0 is lo;
    // p80 -> rank ceil(8)=8 -> 8.0 is hi
    val df = ((1 to 10).map(i => ("g", Some(i.toDouble))) :+
      ("g", Option.empty[Double])).toDF("g", "v")
    val out = Impute.winsorize(df, "g", "v", 0.10, 0.80).cache()
    assert(out.select("p_low", "p_high").distinct()
      .as[(Double, Double)].collect().toSeq === Seq((1.0, 8.0)))
    // 9 and 10 clip high, nothing clips low (lo is the minimum)
    assert(out.filter($"clip_high").select("v").as[Double]
      .collect().toSet === Set(9.0, 10.0))
    assert(out.filter($"clip_low").count() === 0)
    assert(out.filter($"clip_high").select("v_w").as[Double]
      .collect().toSet === Set(8.0))
    // the null row stays null, unflagged (greatest/least null guard)
    assert(out.filter($"v".isNull)
      .select($"v_w".isNull, $"clip_low", $"clip_high")
      .as[(Boolean, Boolean, Boolean)].collect().toSeq ===
      Seq((true, false, false)))
    out.unpersist()
  }

  test("tied values count multiplicity in the order statistic") {
    // {1,1,1,9}: rank ceil(2)=2 -> 1.0 (value-histogram cum counts)
    val df = Seq(("g", Some(1.0)), ("g", Some(1.0)), ("g", Some(1.0)),
      ("g", Some(9.0)), ("g", None)).toDF("g", "v")
    val out = Impute.medianImpute(df, "g", "v")
    assert(out.filter($"imputed").select("v").as[Double]
      .collect().toSeq === Seq(1.0))
  }
}
