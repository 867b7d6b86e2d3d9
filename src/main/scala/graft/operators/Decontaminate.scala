package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find corpus documents that share word
  * n-gram shingles with a benchmark/eval set (the contamination check a
  * training-data pipeline runs before a corpus ships; cf. the Dolma /
  * GPT-3 appendix methodology of n-gram overlap against eval sets).
  *
  * Scale shape: benchmark sets are small by nature (thousands of
  * questions), so their distinct grams are collected into ONE broadcast
  * hash map (gram → benchmark ids) and the corpus streams through a
  * single kernel pass — no explode, no join, no shuffle at all. The
  * equivalent explode + broadcast-join + two-countDistinct plan measured
  * 3.9s at sf0.1 vs 0.1s for this form, and at 100 TB the difference is
  * a full corpus-sized shuffle of exploded shingles vs none.
  */
object Decontaminate {

  /** Per-document contamination report: documents sharing at least one
    * distinct n-gram with the benchmark, with the number of distinct
    * shared grams and of distinct benchmark docs hit.
    *
    * Output: (idCol, n_shared_grams, n_bench_hit).
    */
  def contaminationReport(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      n: Int = 5
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val benchRows: Array[(Long, String)] = bench
      .select(col(benchIdCol).cast("long"), col(benchTextCol))
      .as[(Long, String)]
      .collect()
    val gramMap = new java.util.HashMap[String, Array[Long]]()
    benchRows.foreach { case (bid, text) =>
      TextFunctions.distinctGramsJvm(text, n).foreach { g =>
        val prev = gramMap.get(g)
        gramMap.put(g, if (prev == null) Array(bid) else prev :+ bid)
      }
    }
    val bc = spark.sparkContext.broadcast(gramMap)
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val m = bc.value
        rows.flatMap { case (id, text) =>
          var shared = 0L
          val hit = new java.util.HashSet[Long]()
          TextFunctions.distinctGramsJvm(text, n).foreach { g =>
            val bids = m.get(g)
            if (bids != null) {
              shared += 1
              var i = 0
              while (i < bids.length) { hit.add(bids(i)); i += 1 }
            }
          }
          if (shared > 0) Some((id, shared, hit.size.toLong)) else None
        }
      }
      .toDF(idCol, "n_shared_grams", "n_bench_hit")
  }
}
