package graft

import java.nio.file.{Files, Paths}

import graft.etl.EtlPipeline

/** End-to-end ETL throughput measurement (not part of the driver's
  * query bench): synthesizes a bulk-export NDJSON directory, runs the
  * full pipeline (read → widen → scrub → dedup → bucketed merge →
  * completion), and reports rows/sec for a cold load plus a small
  * incremental second run (the bucketed-merge fast path).
  * `runMain graft.EtlBench [nPatients] [nObservations]`
  */
object EtlBench {

  /** One ETL measurement at a fixed fixture scale — reusable from
    * [[Bench]] so the headline ETL path is tracked per round beside
    * the query timings (a query bench cannot see a regression in
    * scrub-projection analysis cost or bucketed-merge constants).
    */
  final case class EtlTimings(rows: Long, coldS: Double, incrS: Double,
      tinyS: Double)

  def main(args: Array[String]): Unit = {
    val nPat = if (args.length > 0) args(0).toInt else 100000
    val nObs = if (args.length > 1) args(1).toInt else 200000
    val spark = GraftSession.get("graft-etl-bench")
    spark.sparkContext.setLogLevel("WARN")
    val t = runOnce(spark, nPat, nObs)
    println(f"[etl-bench] cold load: ${t.rows} rows in ${t.coldS}%.1fs " +
      f"(${t.rows / t.coldS}%.0f rows/s)")
    println(f"[etl-bench] incremental (${nObs / 100} updates into " +
      f"$nObs-row table): ${t.incrS}%.1fs")
    println(f"[etl-bench] tiny batch (5 updates): ${t.tinyS}%.1fs")
    spark.stop()
  }

  def runOnce(spark: org.apache.spark.sql.SparkSession, nPat: Int,
      nObs: Int): EtlTimings = {
    val in = Files.createTempDirectory("etlbench-in").toString
    val out = Files.createTempDirectory("etlbench-out").toString
    val phi = Files.createTempDirectory("etlbench-phi").toString

    // synthesize a realistic-shape export (deterministic contents)
    def patient(i: Int): String = {
      val zip = f"${(i * 37) % 100000}%05d"
      s"""{"resourceType":"Patient","id":"pat-$i","gender":"${if (i % 2 == 0) "female" else "male"}","birthDate":"19${50 + i % 50}%02d-07-15","name":[{"family":"Fam$i","given":["G$i"]}],"address":[{"city":"City$i","state":"MA","postalCode":"$zip"}],"managingOrganization":{"reference":"Organization/org-${i % 100}"},"meta":{"lastUpdated":"2024-01-01T00:00:00Z"}}"""
        .replace("%02d", "")
    }
    def observation(i: Int): String =
      s"""{"resourceType":"Observation","id":"obs-$i","status":"final","code":{"coding":[{"system":"http://loinc.org","code":"${1000 + i % 500}-1","display":"Test ${i % 500}"}],"text":"obs text $i"},"subject":{"reference":"Patient/pat-${i % nPat}"},"encounter":{"reference":"Encounter/enc-${i % (nPat / 2 + 1)}"},"effectiveDateTime":"2021-06-07T08:09:10Z","valueQuantity":{"value":${i % 300},"unit":"mg/dL"},"valueString":"free text $i"}"""

    def writeShards(base: String, n: Int, mk: Int => String,
        shards: Int): Unit =
      (0 until shards).foreach { s =>
        val sb = new StringBuilder()
        var i = s
        while (i < n) { sb.append(mk(i)).append('\n'); i += shards }
        Files.write(Paths.get(in, f"$base.$s%03d.ndjson"),
          sb.toString.getBytes("UTF-8"))
      }
    writeShards("Patient", nPat, patient, 8)
    writeShards("Observation", nObs, observation, 8)

    val tasks = EtlPipeline.DefaultTasks
      .filter(t => Set("Patient", "Observation").contains(t.resourceType))

    val t0 = System.nanoTime()
    val results = EtlPipeline.run(spark, in, out, phi, tasks = tasks,
      groupName = "bench", exportTime = "2024-01-01T00:00:00Z")
    val coldS = (System.nanoTime() - t0) / 1e9
    val rows = results.map(_.rows).sum

    // incremental: re-export 1% of observations as updates
    val in2 = Files.createTempDirectory("etlbench-in2").toString
    val upd = (0 until nObs / 100).map(i => observation(i * 100))
    Files.write(Paths.get(in2, "Observation.000.ndjson"),
      upd.mkString("\n").getBytes("UTF-8"))
    val t1 = System.nanoTime()
    EtlPipeline.run(spark, in2, out, phi,
      tasks = tasks.filter(_.resourceType == "Observation"),
      groupName = "bench2", exportTime = "2024-01-02T00:00:00Z")
    val incS = (System.nanoTime() - t1) / 1e9

    // tiny batch: hash-bucket fast path (touches few of the 16 buckets;
    // at production bucket counts nearly all batches look like this)
    val in3 = Files.createTempDirectory("etlbench-in3").toString
    Files.write(Paths.get(in3, "Observation.000.ndjson"),
      (0 until 5).map(i => observation(i)).mkString("\n")
        .getBytes("UTF-8"))
    val t2 = System.nanoTime()
    EtlPipeline.run(spark, in3, out, phi,
      tasks = tasks.filter(_.resourceType == "Observation"),
      groupName = "bench3", exportTime = "2024-01-03T00:00:00Z")
    val tinyS = (System.nanoTime() - t2) / 1e9
    EtlTimings(rows, coldS, incS, tinyS)
  }
}
