package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling diagnostics: decomposes the full-transform pipeline into stages
  * and measures each at two parallelism levels over the SAME materialized
  * input as [[Bench]], so the N→4N efficiency loss can be attributed
  * (scan vs parse vs enrich vs id vs aggregate). Usage:
  *   runMain graft.BenchProbe [rows]
  * Prints one JSON line per (stage, cpus) with best-of-3 wall seconds.
  */
object BenchProbe {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def stages(spark: SparkSession, path: String): Seq[(String, () => Unit)] = {
    def input = spark.read.parquet(path)
    Seq(
      "scan" -> (() =>
        input.agg(sum(octet_length(col("text")))).collect()),
      "scan_64m_bins" -> (() => {
        spark.conf.set("spark.sql.files.maxPartitionBytes", "64m")
        try input.agg(sum(octet_length(col("text")))).collect()
        finally spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
      }),
      "full_64m_bins" -> (() => {
        spark.conf.set("spark.sql.files.maxPartitionBytes", "64m")
        try pipeline.TranscriptPipeline.transform(input)
          .agg(count(lit(1)), count(col("service")), count(col("tool_kind")),
            count(col("doc_id"))).collect()
        finally spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
      }),
      "status_route" -> (() =>
        pipeline.TranscriptPipeline.metrics(input).collect()),
      "parse_fields" -> (() =>
        pipeline.TranscriptPipeline.parse(input)
          .agg(count(col("service")), count(col("line")), count(col("message")))
          .collect()),
      "parse_enrich" -> (() => {
        val e = enrich.Enrich.enrichInline(pipeline.TranscriptPipeline.parse(input))
        e.agg(count(col("service")), count(col("tool_kind"))).collect()
      }),
      "full_transform" -> (() =>
        pipeline.TranscriptPipeline.transform(input)
          .agg(count(lit(1)), count(col("service")), count(col("tool_kind")),
            count(col("doc_id"))).collect())
    )
  }

  /** hardware-ceiling probe — delegates to [[Bench.calibrate]] so the two
    * tools can never drift apart and always report comparable ceilings. */
  private def calibrate(threads: Int, bufBytes: Int, millis: Long): Double =
    Bench.calibrate(threads, bufBytes, millis)

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 64000000L
    val path = s"/tmp/graft_bench_input_v2_$rows" // versioned with Bench.inputPath
    require(new java.io.File(s"$path/_SUCCESS").exists(), s"run Bench first: $path")

    if (args.length > 1 && args(1) == "sessions") {
      // hot-conversation proof: sessionize the full materialized corpus
      // (hotFraction=0.2 → conv 0 holds ~20% of all rows). The capped
      // ordered-top-k fold must complete with bounded task memory.
      val s = session(32)
      val df = s.read.parquet(path)
      val t0 = System.nanoTime()
      val sess = operators.Actions.sessionize(df, maxTurns = 1000)
      val n = sess.count()
      val hot = sess.orderBy(org.apache.spark.sql.functions.desc("n_turns"))
        .select("n_turns").first().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"sessions_hot","rows":$rows,"convs":$n,"hot_conv_turns":$hot,"sec":$sec%.1f}""")
      // the opt-in mitigation: same fold, 16-way residue salting — the hot
      // conv's 12.8 M-turn group becomes 16 parallel ~800 k-turn groups
      val salts = 16
      val t1 = System.nanoTime()
      val salted = operators.Actions.saltedSessionize(df, salts, maxTurns = 1000)
      val ns = salted.count()
      val maxGroup = salted.agg(org.apache.spark.sql.functions.max("n_turns"))
        .first().getLong(0)
      val secS = (System.nanoTime() - t1) / 1e9
      println(f"""{"probe":"sessions_hot_salted","rows":$rows,"salts":$salts,""" +
        f""""groups":$ns,"max_group_turns":$maxGroup,"sec":$secS%.1f,""" +
        f""""straggler_drop":${hot.toDouble / maxGroup}%.1f,""" +
        f""""speedup_vs_plain":${sec / secS}%.2f}""")
      s.stop()
      return
    }
    if (args.length > 1 && args(1) == "parsers") {
      // round-3 parser throughput: syslog + CEF lines materialized ONCE from
      // the bench corpus (5-/4-variant builders shared with the oracle
      // queries), then pure parse walls at 8 and 32 threads — lines/s of
      // each kernel with zero line-construction cost inside the timed pass.
      val sysPath = s"/tmp/graft_probe_syslog_$rows"
      val cefPath = s"/tmp/graft_probe_cef_$rows"
      val winPath = s"/tmp/graft_probe_winevt_$rows"
      val builders = Seq(
        sysPath -> (() => SparkEntry.syslogLine),
        cefPath -> (() => SparkEntry.cefLine),
        winPath -> (() => SparkEntry.winevtXml))
      val missing = builders.filterNot { case (p, _) =>
        new java.io.File(s"$p/_SUCCESS").exists()
      }
      if (missing.nonEmpty) { // regenerate only the absent caches
        val s = session(32)
        for ((p, line) <- missing)
          s.read.parquet(path).select(line().as("line"))
            .write.mode("overwrite").parquet(p)
        s.stop()
      }
      for ((name, p, agg) <- Seq(
        ("parse_syslog", sysPath, (d: org.apache.spark.sql.DataFrame) => {
          val x = d.withColumn("_p", graft.functions.parse_syslog(col("line"), "auto", 2024, 0))
          x.agg(count(col("_p.hostname")), count(col("_p.ts")),
            count(col("_p.message")), sum(col("_p.severity"))).collect()
        }),
        ("decode_cef", cefPath, (d: org.apache.spark.sql.DataFrame) => {
          val x = d.withColumn("_c", graft.functions.decode_cef(col("line")))
          x.agg(count(col("_c.device_vendor")), count(col("_c.extensions")),
            count(col("_c.errors"))).collect()
        }),
        ("decode_wineventlog", winPath, (d: org.apache.spark.sql.DataFrame) => {
          val x = d.withColumn("_w", graft.functions.decode_wineventlog(col("line")))
          x.agg(count(col("_w.event_id")), count(col("_w.level")),
            count(col("_w.event_data")), sum(col("_w.record_id"))).collect()
        }))) {
        val walls = scala.collection.mutable.Map(8 -> Double.MaxValue, 32 -> Double.MaxValue)
        for (round <- 0 until 3; cpus <- Seq(32, 8)) {
          val s = session(cpus)
          val t0 = System.nanoTime()
          agg(s.read.parquet(p))
          val sec = (System.nanoTime() - t0) / 1e9
          if (round > 0) walls(cpus) = math.min(walls(cpus), sec)
          s.stop()
        }
        println(f"""{"probe":"$name","rows":$rows,"sec_8":${walls(8)}%.2f,"sec_32":${walls(32)}%.2f,""" +
          f""""lines_per_sec_32":${rows / walls(32)}%.0f,"eff_8_to_32":${walls(8) / walls(32) / 4.0}%.3f}""")
      }
      return
    }
    if (args.length > 1 && args(1) == "bpe") {
      // tokenizer-apply throughput: train a merge table on a deterministic
      // sample of the bench corpus (driver-side incremental learner), then
      // measure the KERNEL apply (reference-object merge-rank table,
      // per-task word cache) over docsN documents at 8 and 32 threads —
      // tokens/s with table size at tokenizer scale. The chained-replace
      // fold is measured at its 64-rule plan ceiling on the same corpus:
      // the kernel carries a ~100× larger table at comparable wall.
      val docsN = if (args.length > 2) args(2).toLong else 8000000L
      val every = math.max(1L, rows / docsN)
      val s0 = session(32)
      val sample = s0.read.parquet(path)
        .where(pmod(expr("CAST(substring(conv_id, 6, 8) AS BIGINT)"), lit(997)) === 0)
        .limit(60000)
      val t0 = System.nanoTime()
      val merges = textops.TextOps.trainBpe(sample, numMerges = 8000)
      val trainSec = (System.nanoTime() - t0) / 1e9
      s0.stop()
      System.err.println(f"[bpe] trained ${merges.length} merges in $trainSec%.1f s")
      val walls = scala.collection.mutable.Map.empty[(String, Int), Double]
      val toks = scala.collection.mutable.Map.empty[String, Long]
      for (round <- 0 until 3; cpus <- Seq(32, 8)) {
        val s = session(cpus)
        val d = s.read.parquet(path)
          .where(pmod(col("turn_idx").cast("long") * 131L +
            expr("CAST(substring(conv_id, 6, 8) AS BIGINT)"), lit(every)) === 0)
        for ((name, seg) <- Seq(
          "kernel_8k" -> textops.TextOps.bpeSegmentKernel(col("text"), merges),
          "fold_64" -> textops.TextOps.bpeSegmentFold(col("text"),
            merges.take(textops.TextOps.BpeFoldLimit)))) {
          val t1 = System.nanoTime()
          val n = d.select(sum(size(flatten(seg))).as("n"))
            .collect()(0).getLong(0)
          val sec = (System.nanoTime() - t1) / 1e9
          toks(name) = n
          if (round > 0)
            walls((name, cpus)) =
              math.min(walls.getOrElse((name, cpus), Double.MaxValue), sec)
          System.err.println(f"[bpe] round=$round cpus=$cpus $name%-10s $sec%7.2f s subwords=$n")
        }
        s.stop()
      }
      for (name <- Seq("kernel_8k", "fold_64")) {
        val s8 = walls((name, 8)); val s32 = walls((name, 32))
        println(f"""{"probe":"bpe_$name","merges":${if (name == "kernel_8k") merges.length else textops.TextOps.BpeFoldLimit},"subwords":${toks(name)},""" +
          f""""train_sec":$trainSec%.1f,"sec_8":$s8%.2f,"sec_32":$s32%.2f,""" +
          f""""subwords_per_sec_32":${toks(name) / s32}%.0f,""" +
          f""""eff_8_to_32":${s8 / s32 / 4.0}%.3f}""")
      }
      return
    }
    if (args.length > 1 && args(1) == "curation") {
      // corpus-tier scaling evidence: run the curation-family operators on a
      // large documents-shaped corpus synthesized ONCE from the bench input
      // (one doc per transcript turn, doc_id = conv·1e8 + turn — unique,
      // deterministic), then pure operator walls at 8 and 32 threads.
      // Survivor counts print alongside the walls so the reader sees the
      // workload shape each stage actually processed (log-like text fails
      // the Gopher stopword rule often — that is the honest corpus).
      val docsN = if (args.length > 2) args(2).toLong else 8000000L
      val every = math.max(1L, rows / docsN)
      val docsPath = s"/tmp/graft_probe_docs_$docsN"
      if (!new java.io.File(s"$docsPath/_SUCCESS").exists()) {
        val s = session(32)
        s.read.parquet(path)
          .select(
            (expr("CAST(substring(conv_id, 6, 8) AS BIGINT)") * 100000000L +
              col("turn_idx").cast("long")).as("doc_id"),
            col("text"), col("role").as("source"))
          .where(pmod(col("doc_id"), lit(every)) === 0)
          .write.mode("overwrite").parquet(docsPath)
        s.stop()
      }
      def curStages(s: SparkSession): Seq[(String, () => Array[Long])] = {
        def d = s.read.parquet(docsPath)
        Seq(
          "quality_gate" -> (() => {
            val r = textops.TextOps.gopherFilter(d)
              .agg(count(lit(1)), sum(when(col("keep"), 1L).otherwise(0L)))
              .collect()(0)
            Array(r.getLong(0), r.getLong(1))
          }),
          "exact_dedup" -> (() => {
            val r = textops.TextOps.dedupExact(d)
              .agg(count(lit(1)), sum(col("n_dupes"))).collect()(0)
            Array(r.getLong(0), r.getLong(1))
          }),
          "decontaminate" -> (() => {
            val r = textops.CorpusOps.decontaminate(
              d.where(pmod(col("doc_id"), lit(17)) =!= 3),
              d.where(pmod(col("doc_id"), lit(17)) === 3), n = 4)
              .agg(count(lit(1)),
                sum(when(col("contaminated"), 1L).otherwise(0L))).collect()(0)
            Array(r.getLong(0), r.getLong(1))
          }),
          // join-free decontamination: the same verdict with the benchmark
          // gram set inside a codegen'd expression — one narrow map, no
          // gram explode / broadcast join / per-doc agg on the train side
          "decontaminate_inline" -> (() => {
            val r = textops.CorpusOps.decontaminateInline(
              d.where(pmod(col("doc_id"), lit(17)) =!= 3),
              d.where(pmod(col("doc_id"), lit(17)) === 3), n = 4,
              maxGrams = 256 << 20)
              .agg(count(lit(1)),
                sum(when(col("contaminated"), 1L).otherwise(0L))).collect()(0)
            Array(r.getLong(0), r.getLong(1))
          }),
          // bloom-prefiltered decontamination: fixed-memory scale shape —
          // bloom probe narrow map, exact verification join over the
          // bloom-positive slice only
          "decontaminate_bloom" -> (() => {
            val r = textops.CorpusOps.decontaminateBloom(
              d.where(pmod(col("doc_id"), lit(17)) =!= 3),
              d.where(pmod(col("doc_id"), lit(17)) === 3), n = 4)
              .agg(count(lit(1)),
                sum(when(col("contaminated"), 1L).otherwise(0L))).collect()(0)
            Array(r.getLong(0), r.getLong(1))
          }),
          // pack per (source, 64-way shard): the scaladoc's own advice when
          // one stratum dominates — the probe exercises the sharded shape
          "pack_sequences" -> (() => {
            val r = textops.CorpusOps.packSequences(
              d, seqLen = 2048,
              stratum = concat(col("source"), lit(":"),
                pmod(col("doc_id"), lit(64)).cast("string")))
              .agg(count(lit(1)), max(col("last_seq"))).collect()(0)
            Array(r.getLong(0), r.getLong(1))
          }),
          // the near-dup PAIR REPORT on a deterministic ~1/512 subset:
          // template-generated log text is a worst-case near-dup corpus —
          // duplicates form cliques, so the verified pair set itself is
          // QUADRATIC in the subset no matter how buckets are capped
          // (1/32 → >70 GB of candidate spill; 1/128 still ran 441 s at 32
          // threads); the small subset keeps the stage a bucketed-join
          // measurement rather than an output-materialization one — the
          // pair report is the wrong contract for this corpus, which is
          // exactly what minhash_clusters demonstrates
          "minhash_pairs" -> (() => {
            val sub = d.where(pmod(col("doc_id"), lit(every * 512)) === 0)
            Array(dedup.Dedup.minhashPairs(sub, 80).count())
          }),
          // the near-dup CLUSTERING scale path on a ~1/64 subset (8x the
          // pair subset): one VERIFIED star edge per bucket member, linear
          // in the corpus even though this corpus is one big pile of
          // cliques — the same tier where the pair report drowns
          "minhash_clusters" -> (() => {
            val sub = d.where(pmod(col("doc_id"), lit(every * 64)) === 0)
            val r = dedup.Dedup.minhashClusters(sub, 80)
              .agg(count(lit(1)), sum(when(col("keep"), 1L).otherwise(0L)))
              .collect()(0)
            Array(r.getLong(0), r.getLong(1))
          }))
      }
      val walls = scala.collection.mutable.Map.empty[(String, Int), Double]
      val counts = scala.collection.mutable.Map.empty[String, Array[Long]]
      // three tiers, interleaved: 2→8 is the pre-saturation gate tier (the
      // same operating point the main Bench gate uses), 32 the all-cores
      // throughput point read against the host's memory ceiling
      // expensive stages get one warm-up + one recorded round; the cheap
      // narrow-map stages keep min-of-2 over three rounds
      val roundsOf = Map("decontaminate" -> 2, "decontaminate_inline" -> 2,
        "decontaminate_bloom" -> 2, "minhash_pairs" -> 2,
        "minhash_clusters" -> 2).withDefaultValue(3)
      for (round <- 0 until 3; cpus <- Seq(32, 8, 2)) {
        val s = session(cpus)
        for ((name, fn) <- curStages(s) if round < roundsOf(name)) {
          val t0 = System.nanoTime()
          val c = fn()
          val sec = (System.nanoTime() - t0) / 1e9
          counts(name) = c
          val key = (name, cpus)
          if (round > 0)
            walls(key) = math.min(walls.getOrElse(key, Double.MaxValue), sec)
          // partial evidence survives a crash; stderr keeps stdout JSON-only
          System.err.println(
            f"[curation] round=$round cpus=$cpus $name%-14s $sec%7.2f s " +
              s"counts=${c.mkString(",")}")
          // the stage's DataFrames are unreachable now — give ContextCleaner
          // a GC cycle so its shuffle files leave /tmp before the next stage
          // piles on (five stages × 8M docs of spill exceed the sandbox disk)
          System.gc()
          Thread.sleep(1500)
        }
        s.stop()
      }
      for (name <- Seq("quality_gate", "exact_dedup", "decontaminate",
        "decontaminate_inline", "decontaminate_bloom", "pack_sequences",
        "minhash_pairs", "minhash_clusters")) {
        val s2 = walls((name, 2)); val s8 = walls((name, 8))
        val s32 = walls((name, 32))
        val stageDocs = name match {
          case "minhash_pairs"    => docsN / 512
          case "minhash_clusters" => docsN / 64
          case _                  => docsN
        }
        val c = counts(name).mkString("[", ",", "]")
        println(f"""{"probe":"curation_$name","docs":$stageDocs,"counts":$c,""" +
          f""""sec_2":$s2%.2f,"sec_8":$s8%.2f,"sec_32":$s32%.2f,""" +
          f""""docs_per_sec_32":${stageDocs / s32}%.0f,""" +
          f""""eff_2_to_8":${s2 / s8 / 4.0}%.3f,""" +
          f""""eff_8_to_32":${s8 / s32 / 4.0}%.3f}""")
      }
      return
    }
    if (args.length > 1 && args(1) == "curve") {
      // full-transform wall at 4/8/16/32 threads, best-of-2 after warm-up
      val walls = scala.collection.mutable.LinkedHashMap.empty[Int, Double]
      for (round <- 0 until 3; cpus <- Seq(32, 16, 8, 4)) {
        val s = session(cpus)
        val t0 = System.nanoTime()
        pipeline.TranscriptPipeline.transform(s.read.parquet(path))
          .agg(count(lit(1)), count(col("service")), count(col("tool_kind")),
            count(col("doc_id"))).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        if (round > 0) walls(cpus) = math.min(walls.getOrElse(cpus, Double.MaxValue), sec)
        s.stop()
      }
      val parts = walls.toSeq.sortBy(_._1)
        .map { case (c, w) => f""""$c":$w%.2f""" }.mkString(",")
      println(s"""{"probe":"thread_curve","rows":$rows,"sec":{$parts}}""")
      return
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[(String, Int), Double]
    for (round <- 0 until 4; cpus <- Seq(32, 8)) {
      val s = session(cpus)
      for ((name, fn) <- stages(s, path)) {
        val t0 = System.nanoTime()
        fn()
        val sec = (System.nanoTime() - t0) / 1e9
        val key = (name, cpus)
        if (round > 0) // round 0 = warm-up
          results(key) = math.min(results.getOrElse(key, Double.MaxValue), sec)
      }
      s.stop()
    }
    results.groupBy(_._1._1).foreach { case (name, m) =>
      val s8 = m((name, 8)); val s32 = m((name, 32))
      println(f"""{"stage":"$name","sec_8":$s8%.3f,"sec_32":$s32%.3f,"eff":${s8 / s32 / 4.0}%.3f}""")
    }
    // hardware N→4N ceilings by working-set tier
    for ((tier, buf) <- Seq("l1_4k" -> 4096, "l2_256k" -> 262144, "dram_16m" -> 16777216)) {
      calibrate(8, buf, 500) // warm
      val eff = calibrate(32, buf, 2000) / (4.0 * calibrate(8, buf, 2000))
      println(f"""{"ceiling":"$tier","eff_8_to_32":$eff%.3f}""")
    }
  }
}
