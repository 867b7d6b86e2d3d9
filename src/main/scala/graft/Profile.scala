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

    val which = if (args.isEmpty) Set("dedup") else args.toSet

    if (which("dedup")) (1 to 3).foreach { round =>
      println(s"--- dedup round $round ---")
      val input = time("corpusWithCopies count") {
        val docs = graft.tables.Tables.documents(spark, sfDir)
        val in = graft.tables.Tables.withIdCopies(docs, "doc_id", 7, 1000000L)
        in.count(); in
      }
      val sigs = time("md5Sigs (kernel + ckpt)") {
        input
          .select(col("doc_id"),
            graft.functions.TextFunctions.md5MinHash8Udf(col("text"))
              .as("sig"))
          .localCheckpoint(true)
      }
      val star = time("bandStarEdges count") {
        val e = graft.queries.TextQueries.bandStarEdges(sigs)
        println(s"[profile]   edges=${e.count()}")
        e
      }
      val comps = time("connectedComponents(star)") {
        graft.operators.GraphOps.connectedComponents(
          spark, star, "id_a", "id_b",
          nodes = Some(input.select(col("doc_id"))))
      }
      time("dedupGroups + count") {
        graft.operators.GraphOps.dedupGroups(comps).count()
      }
      time("q38 full") {
        graft.queries.TextQueries.qDedupCorpus(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      time("q87 full") {
        graft.queries.TextQueries.qDedupBest(spark, sfDir)
          .queryExecution.toRdd.count()
      }
    }

    if (which("micro")) (1 to 3).foreach { round =>
      println(s"--- micro round $round ---")
      import spark.implicits._
      val a = spark.range(5000).select(col("id"), (col("id") % 100).as("k"))
        .localCheckpoint(true)
      val b = spark.range(2500).select(col("id").as("k2"), col("id").as("v"))
        .localCheckpoint(true)
      time("join+agg+ckpt") {
        a.join(b, col("k") === col("k2"))
          .groupBy("k").agg(min("v").as("m"))
          .localCheckpoint(true)
      }
      time("agg+ckpt") {
        a.groupBy("k").agg(min("id").as("m")).localCheckpoint(true)
      }
      time("agg+observe+ckpt") {
        val o = org.apache.spark.sql.Observation()
        a.groupBy("k").agg(min("id").as("m"))
          .observe(o, sum("m").as("s")).localCheckpoint(true)
        o.get("s")
      }
      time("ckpt only") { a.select(col("id")).localCheckpoint(true) }
      time("count only") { a.count() }
      def aggCkpt(tag: String): Unit =
        time(s"agg+ckpt [$tag]") {
          a.groupBy("k").agg(min("id").as("m")).localCheckpoint(true)
        }
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      aggCkpt("sp=4"); aggCkpt("sp=4 b")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      aggCkpt("aqe=off"); aggCkpt("aqe=off b")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      aggCkpt("wscg=off")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      time("agg+toRdd.count") {
        a.groupBy("k").agg(min("id").as("m")).queryExecution.toRdd.count()
      }
      time("agg+rdd-ckpt") {
        val r = a.groupBy("k").agg(min("id").as("m")).queryExecution.toRdd
        r.localCheckpoint(); r.count()
      }
    }

    if (which("e2e")) (1 to 3).foreach { round =>
      println(s"--- e2e round $round ---")
      time("q195 full") {
        graft.queries.EndToEndQueries.qCurationE2e(spark, sfDir)
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
