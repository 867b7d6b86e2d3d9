package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is executed `SPARK_GRAFT_BENCH_RUNS`
  * times (default 2) and the fastest run is reported — first execution
  * pays one-time JVM/codegen/scan-footer costs that a long-lived cluster
  * amortizes away, which is the regime the baseline describes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // min-of-3 by default: the shared bench host shows 1.5× wall-clock
    // swings from external load; a third sample tightens the min
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional args = subset of query names (dev loop); default all.
    // A typo'd name must FAIL, not silently produce an empty run that
    // looks like success.
    val unknown = args.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown quer${if (unknown.size == 1) "y" else "ies"}: " +
        s"${unknown.toSeq.sorted.mkString(", ")}")
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter(kv => args.contains(kv._1))
    val failed = scala.collection.mutable.SortedSet.empty[String]
    val results = selected.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val times = (1 to math.max(1, runs)).map { _ =>
          val t0 = System.nanoTime()
          // materialize the FULL output (queryExecution.toRdd), not
          // df.count(): under count() Catalyst prunes every unused
          // projection, so a map-only query's per-row work was never
          // measured at all — one interpreted-HOF query benched 0.2s
          // while costing 9 CPU-minutes when actually evaluated. This
          // measures what a consumer of the result pays.
          try { fn(spark, sfDir).queryExecution.toRdd.count() }
          catch {
            // a failed query must not masquerade as a fast one: record it
            case e: Throwable =>
              failed += name
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
          val dt = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[bench] $name%-22s $dt%8.2fs")
          dt
        }
        name -> times.min
    }
    // failed queries are EXCLUDED from the timings map and the total —
    // an analysis failure's latency is not a runtime, and round 5's
    // report showed how convincingly it can impersonate one
    val ok = results.filterNot { case (k, _) => failed.contains(k) }
    val qs = ok
      .map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    // The full line above is ~3.5 KB at 130+ queries and the driver's
    // output capture keeps only the LAST 2000 chars of the run — which
    // cut the line's FRONT off and made it unparseable in every prior
    // round ("parsed": null). Emit a compact line LAST so a complete
    // JSON object always sits inside the capture window: the SAME
    // per-query map, but keyed by the query's numeric id ("q38" for
    // "q38_dedup_corpus" — ids are unique) at 2-decimal precision,
    // ~1.6 KB at 134 queries. The full-name line above and
    // bench_latest.json remain the human/audit record.
    val qsShort = ok
      .map { case (k, v) => "\"" + k.takeWhile(_ != '_') + f"""\":$v%.2f""" }
      .mkString("{", ",", "}")
    val failedShort = failed
      .map("\"" + _.takeWhile(_ != '_') + "\"").mkString("[", ",", "]")
    val compact =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qsShort,"failed":$failedShort,"sf":"$sfDir"}"""
    // headroom guard: if the suite ever grows the compact line past the
    // capture window (minus ~100 chars of trailing sbt output), fall
    // back to a totals-only line rather than re-introduce the
    // truncated-front failure this line exists to prevent
    if (compact.length <= 1850) println(compact)
    else println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${ok.size},"failed":$failedShort,"sf":"$sfDir"}""")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_BENCH_OUT", "bench_latest.json")),
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""" + "\n")
    catch { case _: Exception => () } // read-only CWD is fine
    spark.stop()
  }
}
