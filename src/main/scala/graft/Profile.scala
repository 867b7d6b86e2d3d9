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

    if (which("scan")) {
      val docs = graft.tables.Tables.documents(spark, sfDir)
      println(s"[profile] documents scan partitions = ${docs.rdd.getNumPartitions}")
      val input = graft.tables.Tables.withIdCopies(docs, "doc_id", 7, 1000000L)
      (1 to 3).foreach { round =>
        println(s"--- scan round $round ---")
        time("md5Sigs as-is") {
          input.select(col("doc_id"),
            graft.functions.TextFunctions.md5MinHash8Udf(col("text")).as("sig"))
            .localCheckpoint(true)
        }
        time("md5Sigs repart32") {
          input.repartition(32).select(col("doc_id"),
            graft.functions.TextFunctions.md5MinHash8Udf(col("text")).as("sig"))
            .localCheckpoint(true)
        }
        time("normalize+quality as-is") {
          graft.operators.QualityRules.withQualityRules(
            input.select(col("doc_id"), col("source"),
              graft.functions.TextFunctions.normalizeText(col("text")).as("text")),
            "text", minWords = 30L, maxWords = 100000L,
            stopwords = Seq("the", "a", "and", "of", "to", "data", "value", "table"))
            .filter(col("keep")).select("doc_id", "source", "text")
            .localCheckpoint(true)
        }
        time("normalize+quality repart32") {
          graft.operators.QualityRules.withQualityRules(
            input.repartition(32).select(col("doc_id"), col("source"),
              graft.functions.TextFunctions.normalizeText(col("text")).as("text")),
            "text", minWords = 30L, maxWords = 100000L,
            stopwords = Seq("the", "a", "and", "of", "to", "data", "value", "table"))
            .filter(col("keep")).select("doc_id", "source", "text")
            .localCheckpoint(true)
        }
        time("norm+qual nondet repart32") {
          val pats = Seq("the", "a", "and", "of", "to", "data", "value",
            "table").map(w =>
            java.util.regex.Pattern.compile("\\b" + w + "\\b")).toArray
          val statsNd = udf { (text: String) =>
            graft.operators.QualityRules.statsLocal(text, pats)
          }.asNondeterministic()
          val base = input.repartition(32).select(col("doc_id"), col("source"),
            graft.functions.TextFunctions.normalizeText(col("text")).as("text"))
          base.withColumn("__gs", statsNd(col("text")))
            .withColumn("keep",
              col("__gs._1") >= 30L && col("__gs._1") <= 100000L &&
                lit(3L) * col("__gs._1") <= col("__gs._2") &&
                col("__gs._2") <= lit(10L) * col("__gs._1") &&
                lit(10L) * col("__gs._3") <= col("__gs._1") &&
                lit(10L) * col("__gs._5") <= lit(9L) * col("__gs._4") &&
                lit(10L) * col("__gs._6") <= lit(3L) * col("__gs._4") &&
                col("__gs._7") >= 2L)
            .filter(col("keep")).select("doc_id", "source", "text")
            .localCheckpoint(true)
        }
        time("normalize only repart32") {
          input.repartition(32).select(col("doc_id"), col("source"),
            graft.functions.TextFunctions.normalizeText(col("text")).as("text"))
            .localCheckpoint(true)
        }
      }
    }

    if (which("audio")) (1 to 3).foreach { round =>
      println(s"--- audio round $round ---")
      import spark.implicits._
      import graft.multimodal.Multimodal
      val synthUdf = udf((id: Long) => Multimodal.synthWav(id))
      val media0 = graft.tables.Tables.spread(
        graft.tables.Tables.documents(spark, sfDir))
        .select(col("doc_id").as("media_id"), lit("audio").as("kind"),
          synthUdf(col("doc_id")).as("bytes"))
      val mediaCk = time("synthWav ckpt") { media0.localCheckpoint(true) }
      val media = mediaCk.as[Multimodal.MediaRow]
      time("decode only") {
        Multimodal.decode(media).queryExecution.toRdd.count()
      }
      time("decode+fp") {
        Multimodal.spectralFingerprint(Multimodal.decode(media))
          .queryExecution.toRdd.count()
      }
      time("q152 full") {
        graft.queries.NoteQueries.qAudioDedup(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      time("q130 full") {
        graft.queries.NoteQueries.qImagePhash(spark, sfDir)
          .queryExecution.toRdd.count()
      }
    }

    if (which("setsim")) (1 to 3).foreach { round =>
      println(s"--- setsim round $round ---")
      val docs = graft.tables.Tables.spread(graft.tables.Tables
        .withIdCopies(graft.tables.Tables.documents(spark, sfDir),
          "doc_id", 7, 1000000L))
        .select(col("doc_id"),
          graft.functions.TextFunctions
            .md5GramSet64Udf(col("text"), lit(3)).as("grams"))
      val toks = time("toks build") {
        docs.select(col("doc_id").as("id"),
          array_distinct(col("grams")).as("toks"))
          .filter(size(col("toks")) > 0)
      }
      val occ = time("occ explode ckpt") {
        toks.select(col("id"), explode(col("toks")).as("tok"))
          .localCheckpoint(true)
      }
      println(s"[profile]   occ rows=${occ.count()}")
      val dfreq = occ.groupBy("tok").agg(count(lit(1)).as("df"))
      val sorted = time("sorted collect_list ckpt") {
        occ.join(dfreq, "tok")
          .groupBy("id")
          .agg(sort_array(collect_list(struct(col("df"), col("tok"))))
            .as("skeys"))
          .select(col("id"),
            expr("transform(skeys, k -> k.tok)").as("stoks"))
          .withColumn("n", size(col("stoks")).cast("long"))
          .withColumn("plen",
            (col("n") - ceil(lit(0.5) * col("n") - lit(1e-9)) + 1).cast("int"))
          .localCheckpoint(true)
      }
      val prefixes = sorted.select(Seq(col("id"), col("n")) :+
        posexplode(expr("slice(stoks, 1, plen)")).as(Seq("pos", "tok")): _*)
      val alpha =
        ceil(lit(0.5 / 1.5) * (col("a.n") + col("b.n")) - lit(1e-9))
      val cand = time("cand join+distinct") {
        prefixes.as("a")
          .join(prefixes.as("b"),
            col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
              col("a.n").cast("double") >= lit(0.5) * col("b.n") - lit(1e-9) &&
              col("b.n").cast("double") >= lit(0.5) * col("a.n") - lit(1e-9) &&
              least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >= alpha)
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .distinct()
          .localCheckpoint(true)
      }
      println(s"[profile]   cand rows=${cand.count()}")
      time("verify joins") {
        cand
          .join(sorted.select(col("id").as("id_a"), col("stoks").as("toks_a"),
            col("n").as("n_a")), "id_a")
          .join(sorted.select(col("id").as("id_b"), col("stoks").as("toks_b"),
            col("n").as("n_b")), "id_b")
          .withColumn("inter",
            size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
          .withColumn("jaccard", col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")).cast("double"))
          .filter(col("jaccard") >= 0.5)
          .select("id_a", "id_b", "n_a", "n_b", "inter", "jaccard")
          .orderBy("id_a", "id_b")
          .queryExecution.toRdd.count()
      }
      val verif0 = sorted.select(col("id"), sort_array(col("stoks")).as("vt"),
        col("n")).localCheckpoint(true)
      val interDet = udf { (a: Seq[Long], b: Seq[Long]) =>
        var i = 0; var j = 0; var n = 0L
        while (i < a.length && j < b.length) {
          val x = a(i); val y = b(j)
          if (x == y) { n += 1; i += 1; j += 1 }
          else if (x < y) i += 1 else j += 1
        }
        n
      }
      val interNd = interDet.asNondeterministic()
      def verify(inter: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
          useVt: Boolean, label: String): Unit = time(label) {
        val side = if (useVt) verif0 else sorted.select(col("id"),
          col("stoks").as("vt"), col("n"))
        cand
          .join(broadcast(side.select(col("id").as("id_a"), col("vt").as("toks_a"),
            col("n").as("n_a"))), "id_a")
          .join(broadcast(side.select(col("id").as("id_b"), col("vt").as("toks_b"),
            col("n").as("n_b"))), "id_b")
          .withColumn("inter", inter(col("toks_a")))
          .withColumn("jaccard", col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")).cast("double"))
          .filter(col("jaccard") >= 0.5)
          .select("id_a", "id_b", "n_a", "n_b", "inter", "jaccard")
          .orderBy("id_a", "id_b")
          .queryExecution.toRdd.count()
      }
      verify(a => size(array_intersect(a, col("toks_b"))).cast("long"),
        useVt = false, "verify intersect bcast")
      verify(a => interDet(a, col("toks_b")), useVt = true,
        "verify kernel det")
      verify(a => interNd(a, col("toks_b")), useVt = true,
        "verify kernel nondet")
      time("q148 full") {
        graft.queries.TextQueries.qSetSimJoin(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    if (which("scrub")) {
      import graft.deid.{Codebook, DefaultScrubPolicy, ScrubCompiler}
      val tmp = java.nio.file.Files.createTempDirectory("scrubprof").toString
      val cb = Codebook.loadOrCreate(tmp)
      val schema = graft.fhir.FhirSchemas.forResource("Observation")
      val obs =
        """{"resourceType":"Observation","id":"obs-1","status":"final","code":{"coding":[{"system":"http://loinc.org","code":"1000-1","display":"T"}],"text":"t"},"subject":{"reference":"Patient/pat-1"},"effectiveDateTime":"2021-06-07T08:09:10Z","valueQuantity":{"value":1,"unit":"mg"}}"""
      val in = java.nio.file.Files.createTempDirectory("scrubprof-in")
      java.nio.file.Files.write(in.resolve("Observation.000.ndjson"),
        (1 to 5).map(_ => obs).mkString("\n").getBytes("UTF-8"))
      (1 to 3).foreach { round =>
        println(s"--- scrub round $round ---")
        val raw = time("read") {
          graft.sources.NdjsonSource.readResourceFiles(spark,
            graft.sources.NdjsonSource.detectResourceFiles(spark,
              in.toString).getOrElse("Observation", Nil),
            "Observation", schema, widen = true)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        }
        val scrubbed = time("scrub build (scala)") {
          ScrubCompiler.scrub(raw, "Observation", cb,
            DefaultScrubPolicy.policy, false, false)
        }
        val qe = scrubbed.queryExecution
        time("analyze") { qe.analyzed }
        time("optimize") { qe.optimizedPlan }
        time("physical") { qe.executedPlan }
        time("execute") { qe.toRdd.count() }
        time("execute again (new plan)") {
          ScrubCompiler.scrub(raw, "Observation", cb,
            DefaultScrubPolicy.policy, false, false)
            .queryExecution.toRdd.count()
        }
        raw.unpersist()
      }
    }

    if (which("e2e")) (1 to 3).foreach { round =>
      println(s"--- e2e round $round ---")
      import graft.functions.TextFunctions.{normalizeText, tokenCount, tokens}
      import graft.operators.{Decontaminate, GraphOps, Packing, QualityRules, Sampling}
      val Stop = Seq("the", "a", "and", "of", "to", "data", "value", "table")
      val docs = graft.tables.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source"), col("text"))
      val input = docs.unionByName(
        docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            col("source"), concat(col("text"), lit(" qq")).as("text")))
      val norm = input.select(col("doc_id"), col("source"),
        normalizeText(col("text")).as("text"))
      val quality = time("1+2 normalize+quality ckpt") {
        QualityRules
          .withQualityRules(norm, "text",
            minWords = 30L, maxWords = 100000L, stopwords = Stop)
          .filter(col("keep"))
          .select("doc_id", "source", "text")
          .localCheckpoint(true)
      }
      val exd = time("3 exact dedup ckpt") {
        val exKeep = quality.groupBy(md5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("doc_id"))
        quality
          .join(exKeep.select("doc_id"), Seq("doc_id"), "left_semi")
          .localCheckpoint(true)
      }
      val nd = time("4 near dedup") {
        val comps = GraphOps.connectedComponents(spark,
          graft.queries.TextQueries.bandStarEdges(
            graft.queries.TextQueries.md5Sigs(exd)), "id_a", "id_b",
          nodes = Some(exd.select(col("doc_id"))))
        exd.join(
          GraphOps.dedupGroups(comps).select(col("keep_id").as("doc_id")),
          Seq("doc_id"), "left_semi")
      }
      val clean = time("5 decontam ckpt") {
        val tks = tokens(col("text"))
        val bench = norm
          .filter(col("doc_id") % 97 === 0 && col("doc_id") < 1000000L)
          .select(col("doc_id").as("bench_id"),
            concat_ws(" ", slice(tks, lit(1),
              greatest(floor(size(tks) * 0.6), lit(1)).cast("int"))).as("text"))
        val dirty = Decontaminate
          .contaminationReport(nd, "doc_id", "text", bench, "bench_id", "text",
            n = 5)
          .select("doc_id")
        nd.join(dirty, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("source"),
            tokenCount(col("text")).as("n_toks"))
          .localCheckpoint(true)
      }
      time("6-8 mix+pack+shard") {
        graft.queries.EndToEndQueries.qCurationE2e(spark, sfDir)
        // time just the tail by rebuilding from clean
        val src = clean.groupBy("source").agg(sum("n_toks").as("src_tokens"))
        val totals = src.agg(sum("src_tokens").as("total_tokens"),
          count(lit(1)).as("n_sources"))
        val admitted = clean
          .join(broadcast(src), Seq("source"))
          .crossJoin(broadcast(totals))
          .withColumn("rate",
            when(col("src_tokens") === 0L, lit(1.0))
              .otherwise(least(lit(1.0),
                expr("total_tokens div 5").cast("double")
                  / col("n_sources").cast("double")
                  / col("src_tokens").cast("double"))))
          .filter(Sampling.hashUniform(col("doc_id"), "mix") < col("rate"))
          .select("doc_id", "source", "n_toks")
        val packed = Packing
          .packSequences(admitted, "doc_id", "n_toks", seqLen = 2048L,
            seed = "pk1")
          .select("doc_id", "source", "n_toks", "tok_offset", "seq_start",
            "seq_end", "n_seqs")
        val sharded = Sampling
          .trainShards(admitted.select(col("doc_id")), "doc_id", seed = "sh1",
            shardSize = 128L)
          .select("doc_id", "shard", "pos_in_shard")
        packed.join(sharded, Seq("doc_id")).queryExecution.toRdd.count()
      }
      time("q195 full") {
        graft.queries.EndToEndQueries.qCurationE2e(spark, sfDir)
          .queryExecution.toRdd.count()
      }
    }

    // q121/q133 phase split (VERDICT r10 item 7): is the cost the
    // 4-table TPC-H edge build or the rank/relaxation loop?
    if (which("graph")) (1 to 3).foreach { round =>
      println(s"--- graph round $round ---")
      val l = graft.tables.Tables.lineitem(spark, sfDir)
      val o = graft.tables.Tables.orders(spark, sfDir)
      val c = graft.tables.Tables.customer(spark, sfDir)
      val s = graft.tables.Tables.supplier(spark, sfDir)
      val edges = l
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(s, l("l_suppkey") === s("s_suppkey"))
        .select(c("c_nationkey").as("src"), s("s_nationkey").as("dst"))
        .distinct()
      val edgesCk = time("edge build (4-table join)") {
        edges.localCheckpoint(true)
      }
      time("pageRank loop (ckpt edges)") {
        graft.operators.GraphOps.pageRank(edgesCk, "src", "dst", iters = 5)
          .queryExecution.toRdd.count()
      }
      val wedges = l
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(s, l("l_suppkey") === s("s_suppkey"))
        .groupBy(c("c_nationkey").as("src"), s("s_nationkey").as("dst"))
        .agg(countDistinct(o("o_orderkey")).as("w"))
      val wedgesCk = time("weighted edge build") {
        wedges.localCheckpoint(true)
      }
      time("sssp loop (ckpt edges)") {
        graft.operators.GraphOps.shortestPaths(wedgesCk, "src", "dst",
          Some("w"), source = 0L, iters = 3)
          .queryExecution.toRdd.count()
      }
      time("q121 full") {
        graft.queries.CurationQueries.qPageRank(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      time("q133 full") {
        graft.queries.CurationQueries.qSssp(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    // q176/q177/q180 stage split: rank pass vs span-class window vs
    // cut application
    if (which("spans")) (1 to 3).foreach { round =>
      println(s"--- spans round $round ---")
      val sub = graft.tables.Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("text"))
      val corpus = sub.unionByName(sub.filter(col("doc_id") % 30 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L)))
      time("rank all-pos (q176 shape)") {
        graft.operators.SuffixRank
          .rank(sub, "doc_id", "text", depth = 32)
          .queryExecution.toRdd.count()
      }
      time("rank fullWindows (q180 shape)") {
        graft.operators.SuffixRank
          .rank(corpus, "doc_id", "text", depth = 32,
            fullWindowsOnly = true)
          .queryExecution.toRdd.count()
      }
      time("cutIntervals") {
        graft.operators.SpanDedup
          .cutIntervals(corpus, "doc_id", "text", spanLen = 32)
          .queryExecution.toRdd.count()
      }
      time("q176 full") {
        graft.queries.CorpusQueries.qSuffixRank(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      time("q177 full") {
        graft.queries.CorpusQueries.qRepeatedSpans(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      time("q180 full") {
        graft.queries.CorpusQueries.qRemoveSpans(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
