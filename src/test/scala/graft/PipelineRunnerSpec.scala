package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.checkpoint.Registry
import graft.model.Sinks
import graft.pipeline.{PipelineRunner, TranscriptPipeline}
import graft.sources.Transcripts

/** E2E checkpoint/resume gates, mirroring the reference's registrar system
  * tests (filebeat/tests/system/test_registrar.py: offset equality after
  * restart, no duplicate publication). */
class PipelineRunnerSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-runner").toString

  private lazy val input = Transcripts.fromEvents(spark, "/root/testdata/sf0.001").cache()

  test("full run: sink fan-out + atomic commits + observer metrics parity") {
    val root = tmpDir()
    val results = PipelineRunner.run(input, root, groups = 4)
    assert(results.map(_.group) == Seq(0, 1, 2, 3))

    val m = PipelineRunner.observedMetrics(root, spark)
    assert(m("events.total") == 1000)
    assert(m("events.published") + m("events.filtered") + m("events.dropped") == 1000)
    // per-write output stats (bytes landed across sinks) are recorded
    assert(m("output.write_bytes") > 0)
    assert(results.map(_.writeBytes.values.sum).sum == m("output.write_bytes"))

    // parity with the declarative route counts (the north-rule gate)
    val expected = TranscriptPipeline.transform(input)
      .groupBy("sink").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val reg = new Registry(root, spark)
    assert(reg.readSink(Sinks.Es).get.count() == expected(Sinks.Es))
    assert(reg.readSink(Sinks.Ls).get.count() == expected(Sinks.Ls))
    assert(reg.readSink(Sinks.Dropped).map(_.count()).getOrElse(0L) ==
      expected.getOrElse(Sinks.Dropped, 0L))
  }

  test("a null conv_id row is routed and counted, never silently lost") {
    import spark.implicits._
    val root = tmpDir()
    val withNull = input.limit(10).union(
      Seq(graft.model.TranscriptEvent(null, 1, "user", "evt=click id=1", "",
        new java.sql.Timestamp(1704067200000L))).toDS().toDF())
    PipelineRunner.run(withNull, root, groups = 4)
    val m = PipelineRunner.observedMetrics(root, spark)
    assert(m("events.total") == 11,
      s"the null-conv row must reach a group and be counted: $m")
    assert(m("events.published") + m("events.filtered") + m("events.dropped") == 11)
  }

  test("observedMetrics on a fresh (never-run) root reports zeros, not a throw") {
    val m = PipelineRunner.observedMetrics(tmpDir(), spark)
    assert(m.values.forall(_ == 0L), s"fresh root must be all-zero: $m")
  }

  test("kill between group commits → resume is exactly-once (no dupes, no loss)") {
    val rootCrash = tmpDir()
    // crash after the first group commits
    intercept[RuntimeException] {
      PipelineRunner.run(input, rootCrash, groups = 4, failAfterGroup = 0)
    }
    val reg = new Registry(rootCrash, spark)
    val committedBefore = reg.committedGroups()
    assert(committedBefore.nonEmpty && committedBefore.size < 4)

    // resume: same command; previously committed groups must be skipped
    val resumed = PipelineRunner.run(input, rootCrash, groups = 4)
    assert(resumed.map(_.group).toSet == (0 until 4).toSet.diff(committedBefore.toSet))

    // compare against an uninterrupted reference run
    val rootClean = tmpDir()
    PipelineRunner.run(input, rootClean, groups = 4)
    val a = PipelineRunner.observedMetrics(rootCrash, spark)
    val b = PipelineRunner.observedMetrics(rootClean, spark)
    assert(a == b)

    // no duplicate doc_ids across the resumed sinks
    val es = reg.readSink(Sinks.Es).get
    assert(es.select("doc_id").distinct().count() == es.count())

    // per-turn text equality under stable (conv_id, turn_idx) order vs input
    val back = reg.readSink(Sinks.Es).get.unionByName(reg.readSink(Sinks.Ls).get)
    val diff = back.alias("s")
      .join(input.alias("i"), Seq("conv_id", "turn_idx"))
      .filter(col("s.text") =!= col("i.text"))
    assert(diff.count() == 0)
  }

  test("registry offsets record per-conversation high-water marks") {
    val root = tmpDir()
    PipelineRunner.run(input, root, groups = 2)
    val reg = new Registry(root, spark).registry()
    val expected = input.groupBy("conv_id").agg(max("turn_idx")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val actual = reg.collect().map(r =>
      r.getAs[String]("partition_key") -> r.getAs[Int]("max_turn_idx")).toMap
    assert(actual == expected)
  }

  test("two concurrent runners on one root: fence decides, loser exits clean") {
    val root = tmpDir()
    // race two full runs of the SAME input over the same checkpoint root
    // (the reference's concurrent-access story: filestream store
    // ref-counting, input-logfile/store.go:37-300)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(PipelineRunner.run(input, root, groups = 4))
    val fb = Future(PipelineRunner.run(input, root, groups = 4))
    val (ra, rb) = (Await.result(fa, 5.minutes), Await.result(fb, 5.minutes))

    // every group committed exactly once; each was WON by at most one runner
    // (a runner that saw the marker early skips; one that raced loses the
    // rename and abandons) — no group double-counted, none lost
    val reg = new Registry(root, spark)
    assert(reg.committedGroups() == Seq(0, 1, 2, 3))
    val wonGroups = (ra ++ rb).map(_.group)
    assert(wonGroups.distinct.size == wonGroups.size)
    assert(wonGroups.toSet.subsetOf((0 until 4).toSet))

    // the combined result equals a clean single-runner run: no dupes, right counts
    val rootClean = tmpDir()
    PipelineRunner.run(input, rootClean, groups = 4)
    assert(PipelineRunner.observedMetrics(root, spark) ==
      PipelineRunner.observedMetrics(rootClean, spark))
    val es = reg.readSink(Sinks.Es).get
    assert(es.select("doc_id").distinct().count() == es.count())

    // losers left no residue: staging is gone, and every physical file in
    // each sink table's data/ dir is referenced by the table's current
    // snapshot (a CAS loser deletes the files it moved in)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/_staging")))
    for (s <- Sinks.All) {
      val tbl = reg.sinkTable(s)
      val st = tbl.state()
      val dataDir = new org.apache.hadoop.fs.Path(s"${tbl.root}/data")
      if (fs.exists(dataDir)) {
        val onDisk = fs.listStatus(dataDir).map(_.getPath.getName)
          .filterNot(_.startsWith(".")) // LocalFileSystem .crc sidecars
          .map(n => s"data/$n").toSet
        assert(onDisk == st.files.map(_.path).toSet,
          s"unreferenced files in $s: ${onDisk.diff(st.files.map(_.path).toSet)}")
      }
    }
  }

  test("commit marker is the atomicity point: uncommitted output is invisible") {
    val root = tmpDir()
    intercept[RuntimeException] {
      PipelineRunner.run(input, root, groups = 4, failAfterGroup = 0)
    }
    val reg = new Registry(root, spark)
    // snapshot-isolated readers see only committed groups
    val visible = reg.readSink(Sinks.Ls).get
      .withColumn("g", pmod(abs(crc32(col("conv_id"))), lit(4L)).cast("int"))
    assert(visible.select("g").distinct().collect().map(_.getInt(0)).toSet
      .subsetOf(reg.committedGroups().toSet))
  }

  test("resume after a PARTIAL sink commit reconciles through txn keys") {
    val root = tmpDir()
    // simulate a run that died between its sink_es snapshot commit and the
    // group ack: stage group 0's fan-out, commit ONLY the es slice, crash.
    val crashed = new Registry(root, spark)
    val g0 = input
      .withColumn("_grp", pmod(abs(crc32(col("conv_id"))), lit(4L)).cast("int"))
      .filter(col("_grp") === 0).drop("_grp")
    val staging = crashed.stagingGroupDir(0)
    TranscriptPipeline.transform(g0)
      .filter(col("sink") =!= TranscriptPipeline.Filtered)
      .write.mode("overwrite").partitionBy("sink").parquet(staging)
    val partial = crashed.commitSinkStaged(Sinks.Es, 0, s"$staging/sink=${Sinks.Es}")
    assert(!partial.alreadyCommitted)

    // BEFORE resume: the es append is durable in its table, but the
    // read-committed view hides it (group 0 has no ack in the commit log)
    assert(new Registry(root, spark).readSink(Sinks.Es).isEmpty)

    // resume: a fresh runner processes all four groups; its group-0 es
    // append must reconcile to the crashed run's snapshot, not duplicate it
    val resumed = PipelineRunner.run(input, root, groups = 4)
    assert(resumed.map(_.group) == Seq(0, 1, 2, 3))

    val reg = new Registry(root, spark)
    // the es table's group-0 snapshot belongs to the CRASHED run (reused);
    // the commit-log ack belongs to the resuming runner
    assert(reg.sinkTable(Sinks.Es).snapshotForTxn("group-0")
      .exists(_.run == crashed.runId))
    assert(reg.markerRun(0).exists(_ != crashed.runId))

    // end state identical to a clean uninterrupted run: no dupes, no loss
    val rootClean = tmpDir()
    PipelineRunner.run(input, rootClean, groups = 4)
    assert(PipelineRunner.observedMetrics(root, spark) ==
      PipelineRunner.observedMetrics(rootClean, spark))
    val es = reg.readSink(Sinks.Es).get
    assert(es.select("doc_id").distinct().count() == es.count())
  }
}
