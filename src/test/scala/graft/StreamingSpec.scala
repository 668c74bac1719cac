package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.Sinks
import graft.pipeline.TranscriptPipeline
import graft.sources.Transcripts
import graft.streaming.StreamingPipeline

class StreamingSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  lazy val input = Transcripts.fromEvents(spark, "/root/testdata/sf0.001")

  test("streaming fan-out matches the batch pipeline's per-sink counts") {
    val src = tmpDir("stream-src")
    val out = tmpDir("stream-out")
    val ckpt = tmpDir("stream-ckpt")
    input.write.mode("overwrite").parquet(src)

    val q = StreamingPipeline.start(
      StreamingPipeline.fromDirectory(spark, src), out, ckpt,
      Trigger.AvailableNow())
    q.awaitTermination(120000)

    val batchCounts = TranscriptPipeline.transform(input)
      .groupBy("sink").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (s <- Sinks.All) {
      val streamed = spark.read.parquet(s"$out/$s/batch=*").count()
      assert(streamed == batchCounts.getOrElse(s, 0L),
        s"sink $s: streamed=$streamed batch=${batchCounts.get(s)}")
    }
  }

  test("streaming restart from checkpoint does not duplicate sink rows") {
    val src = tmpDir("stream-src2")
    val out = tmpDir("stream-out2")
    val ckpt = tmpDir("stream-ckpt2")
    input.write.mode("overwrite").parquet(src)

    StreamingPipeline.start(
      StreamingPipeline.fromDirectory(spark, src), out, ckpt,
      Trigger.AvailableNow()).awaitTermination(120000)
    // second run, same checkpoint: no new input → no new output
    StreamingPipeline.start(
      StreamingPipeline.fromDirectory(spark, src), out, ckpt,
      Trigger.AvailableNow()).awaitTermination(120000)

    val total = Sinks.All.map(s => spark.read.parquet(s"$out/$s/batch=*").count()).sum
    val expected = TranscriptPipeline.routed(input).count()
    assert(total == expected, s"dupes after restart: $total vs $expected")
  }

  test("convOffsets tracks per-conv high-water marks") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[graft.model.TranscriptEvent]
    val events = input.limit(200).as[graft.model.TranscriptEvent].collect()
    mem.addData(events.toSeq)

    val q = StreamingPipeline.convOffsets(mem.toDS())
      .writeStream.format("memory").queryName("offsets")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    // ProcessingTimeTimeout keeps scheduling wall-clock batches even under
    // AvailableNow — wait for the data batch, then stop explicitly.
    q.awaitTermination(30000)
    q.stop()

    val got = spark.table("offsets").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val expect = events.groupBy(_.conv_id).map { case (c, ts) => c -> ts.map(_.turn_idx).max }
    assert(got == expect)
  }

  test("windowed metrics stream aggregates per window × sink") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[graft.model.TranscriptEvent]
    val events = input.limit(500).as[graft.model.TranscriptEvent].collect()
    mem.addData(events.toSeq)

    val q = StreamingPipeline.windowedMetrics(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("winmetrics")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    q.stop()

    val rows = spark.table("winmetrics").collect()
    assert(rows.map(_.getLong(2)).sum == events.length.toLong)
    assert(rows.map(_.getString(1)).toSet.subsetOf(
      Set(Sinks.Es, Sinks.Ls, Sinks.Dropped, TranscriptPipeline.Filtered)))
  }
}
