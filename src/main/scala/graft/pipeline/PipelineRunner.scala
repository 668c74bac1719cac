package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.checkpoint.Registry
import graft.model.Sinks

/** Checkpointed, resumable execution of the transcript pipeline — the
  * publish plane of the reference (queue → batch → per-sink workers with
  * ACK → registrar) rebuilt on Spark's batch model:
  *
  *  - the input is split into `groups` conv_id-bucket groups (the analogue of
  *    queue batches, libbeat/publisher/queue/memqueue/broker.go:114-184);
  *    each group is processed and committed independently, so a kill between
  *    groups loses no acknowledged work
  *  - per-group: transform → fan-out write to sink_es / sink_ls / dropped
  *    (partitioned parquet, sortWithinPartitions(conv_id, turn_idx) so the
  *    north-rule per-turn ordering is physically materialized — never a
  *    global sort) → offsets parquet → ATOMIC commit marker (the ACK)
  *  - resume = rerun the same command; committed groups are skipped
  *    (filebeat registrar semantics: offsets persisted only after ACK,
  *    filebeat/beater/acker.go:37-68), uncommitted partial output is
  *    overwritten deterministically → effectively-once end-to-end
  *
  * At cluster scale each group is a full distributed job over one bucket
  * range; `groups` trades failure-domain granularity against job overhead
  * (reference flush-coalescing, registrar.go:160-190).
  */
object PipelineRunner {

  final case class GroupResult(group: Int, counts: Map[String, Long],
                               writeBytes: Map[String, Long] = Map.empty)

  /** deterministic conv bucket in [0, groups) — NOT Spark's hash() so the
    * assignment is engine-independent and replay-stable. */
  private def bucketCol(groups: Int) =
    pmod(abs(crc32(col("conv_id"))), lit(groups.toLong)).cast("int")

  /** Run (or resume) the pipeline over `input`, writing under `root`.
    * Returns per-group sink counts for groups executed in THIS invocation. */
  def run(input: DataFrame, root: String, groups: Int = 4,
          failAfterGroup: Int = Int.MaxValue): Seq[GroupResult] = {
    val spark = input.sparkSession
    val reg = new Registry(root, spark)
    val bucketed = input.withColumn("_grp", bucketCol(groups))

    val results = scala.collection.mutable.ArrayBuffer.empty[GroupResult]
    var done = 0
    for (g <- 0 until groups if !reg.isCommitted(g)) {
      val slice = bucketed.filter(col("_grp") === g).drop("_grp")
      val routed = TranscriptPipeline.transform(slice)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // fan-out: one filtered write per real sink (outil selector fan-out,
        // libbeat/outputs/outil/select.go:90-93); `filtered` rows are counted
        // but never written (monitoring.go:139)
        for (s <- Sinks.All) {
          routed.filter(col("sink") === s)
            .sortWithinPartitions("conv_id", "turn_idx")
            .write.mode("overwrite").parquet(s"$root/$s/group=$g")
        }
        // offsets/lineage rows (file.State analogue)
        val offsets = routed.groupBy(col("conv_id").as("partition_key"))
          .agg(max("turn_idx").as("max_turn_idx"),
            count(lit(1)).as("row_count"),
            sum(when(col("sink") === TranscriptPipeline.Filtered, 1L).otherwise(0L)).as("filtered"),
            sum(when(col("sink") === Sinks.Dropped, 1L).otherwise(0L)).as("dropped"))
          .withColumn("group", lit(g))
          .withColumn("committed_at", current_timestamp())
        reg.writeOffsets(g, offsets)

        val counts = routed.groupBy("sink").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        // per-write output stats (bytes/files landed per sink — the
        // reference's per-output-worker metrics, libbeat/outputs/metrics.go)
        val writeStats = Sinks.All.map(s => s -> reg.sinkGroupStats(s, g)).toMap
        val lineage = counts.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
        val bytesJson = writeStats
          .map { case (k, (b, f)) => s""""$k":{"bytes":$b,"files":$f}""" }
          .mkString("{", ",", "}")
        reg.commit(g, s"""{"group":$g,"counts":$lineage,"writes":$bytesJson}""")
        results += GroupResult(g, counts, writeStats.map { case (k, (b, _)) => k -> b })
      } finally routed.unpersist()

      done += 1
      if (done > failAfterGroup) // test hook: simulate a crash between commits
        throw new RuntimeException(s"injected failure after group $g")
    }
    results.toSeq
  }

  /** Pipeline-level metric counters over all committed groups, mirroring the
    * reference observer names (libbeat/publisher/pipeline/monitoring.go:94-104). */
  def observedMetrics(root: String, spark: SparkSession): Map[String, Long] = {
    val reg = new Registry(root, spark)
    def cnt(s: String): Long = reg.readSink(s).map(_.count()).getOrElse(0L)
    val published = cnt(Sinks.Es) + cnt(Sinks.Ls)
    val dropped = cnt(Sinks.Dropped)
    val r = reg.registry().agg(sum("row_count"), sum("filtered")).collect()(0)
    val total = r.getLong(0)
    val filtered = r.getLong(1)
    val writeBytes = (for {
      s <- Sinks.All
      g <- reg.committedGroups()
    } yield reg.sinkGroupStats(s, g)._1).sum
    Map(
      "events.total" -> total,
      "events.published" -> published,
      "events.filtered" -> filtered,
      "events.dropped" -> dropped,
      "output.write_bytes" -> writeBytes
    )
  }
}
