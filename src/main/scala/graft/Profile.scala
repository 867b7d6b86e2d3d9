package graft

import org.apache.spark.sql.functions._

/** Dev scratch: stage-level timings for the slow dedup queries. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("profile")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    // warm the JVM/scan once
    graft.tables.Tables.documents(spark, sfDir).count()

    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      val input = time("corpusWithCopies count") {
        val docs = graft.tables.Tables.documents(spark, sfDir)
        val in = docs.unionByName(docs
          .filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + lit(1000000L)))
        in.count(); in
      }
      val sigs = time("md5Sigs (kernel + ckpt)") {
        input
          .select(col("doc_id"),
            graft.functions.TextFunctions.md5MinHash8Udf(col("text"))
              .as("sig"))
          .localCheckpoint(true)
      }
      val cands = time("bandCandidates") {
        val bandArr = array((0 until 4).map { b =>
          concat_ws("|", col("sig")(2 * b), col("sig")(2 * b + 1))
        }: _*)
        val bands = sigs.select(col("doc_id"),
          posexplode(bandArr).as(Seq("band", "bv")))
        bands.as("a")
          .join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .distinct()
          .localCheckpoint(true)
      }
      val comps = time("connectedComponents") {
        graft.operators.GraphOps.connectedComponents(
          spark, cands, "id_a", "id_b",
          nodes = Some(input.select(col("doc_id"))))
      }
      time("dedupGroups + count") {
        graft.operators.GraphOps.dedupGroups(comps).count()
      }
      time("q37 full") {
        graft.queries.TextQueries.qDedupGroups(spark, sfDir).count()
      }
      time("q36 full") {
        graft.queries.TextQueries.qBandPairs(spark, sfDir).count()
      }
      time("q38 full") {
        graft.queries.TextQueries.qDedupCorpus(spark, sfDir).count()
      }
      time("q25 full") {
        graft.queries.TextQueries.qMinHashPairs(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
