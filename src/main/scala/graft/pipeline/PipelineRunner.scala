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
  *  - per-group: ONE transform pass fans out to sink_es / sink_ls / dropped
  *    via a dynamic `partitionBy(sink)` parquet write with observe()-attached
  *    per-sink counters (sortWithinPartitions(sink, conv_id, turn_idx) so the
  *    north-rule per-turn ordering is physically materialized — never a
  *    global sort); each sink's slice then commits as a SNAPSHOT into that
  *    sink's table, the offsets MERGE INTO the registry table, and the
  *    lineage row (counts + per-sink snapshot ids) appends to the commit
  *    log — the ACK (see [[graft.checkpoint.Registry]] for the protocol and
  *    [[graft.checkpoint.SnapshotTable]] for the table format)
  *  - resume = rerun the same command; acked groups are skipped (filebeat
  *    registrar semantics: offsets persisted only after ACK,
  *    filebeat/beater/acker.go:37-68); a crash between a sink's snapshot
  *    commit and the group ack reconciles through the per-table txn keys —
  *    the re-append is a no-op returning the crashed run's snapshot id →
  *    effectively-once end-to-end, even across PARTIAL sink commits
  *  - CONCURRENT runners on the same root are safe: staged files carry
  *    run-unique names and every commit is an optimistic CAS with txn-key
  *    idempotence; the commit-log append decides the winner per group and
  *    the loser cleans its staging (PipelineRunnerSpec races two runners)
  *
  * At cluster scale each group is a full distributed job over one bucket
  * range; `groups` trades failure-domain granularity against job overhead
  * (reference flush-coalescing, registrar.go:160-190).
  */
object PipelineRunner {

  final case class GroupResult(group: Int, counts: Map[String, Long],
                               writeBytes: Map[String, Long] = Map.empty)

  /** deterministic conv bucket in [0, groups) — NOT Spark's hash() so the
    * assignment is engine-independent and replay-stable. A null conv_id
    * buckets like the empty string: crc32(null) would null the bucket,
    * match NO group filter, and silently drop the row from every sink AND
    * every counter — the one failure mode an effectively-once pipeline
    * must not have. */
  private def bucketCol(groups: Int) =
    pmod(abs(crc32(coalesce(col("conv_id"), lit("")))), lit(groups.toLong)).cast("int")

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
      // ONE pass over the transformed group (no persist — at 100 TB a
      // MEMORY_AND_DISK persist is a full extra copy of the group):
      // dynamic fan-out write partitioned by sink (outil selector fan-out,
      // libbeat/outputs/outil/select.go:90-93), with the per-sink counts
      // attached to the SAME job via observe() accumulators, so counting
      // costs no extra scan. `filtered` rows are counted but never written
      // (monitoring.go:139). The sortWithinPartitions leads with `sink` so
      // the dynamic-partition writer's required task ordering is already
      // satisfied (no extra sort inserted) and rows inside each sink file
      // stay in the north-rule (conv_id, turn_idx) order.
      val obs = org.apache.spark.sql.Observation()
      val sinkNames = Sinks.All :+ TranscriptPipeline.Filtered
      val countCols = sinkNames.map(s =>
        sum(when(col("sink") === s, 1L).otherwise(0L)).as(s))
      // the fan-out write stages into THIS run's private directory; files
      // become table-visible only at each sink's snapshot commit below
      val staging = reg.stagingGroupDir(g)
      TranscriptPipeline.transform(slice)
        .observe(obs, countCols.head, countCols.tail: _*)
        .filter(col("sink") =!= TranscriptPipeline.Filtered)
        .sortWithinPartitions("sink", "conv_id", "turn_idx")
        .write.mode("overwrite").partitionBy("sink")
        .parquet(staging)
      val counts = {
        val m = obs.get
        sinkNames.map(s => s -> m(s).asInstanceOf[Long])
          .filter(_._2 > 0).toMap
      }

      // snapshot-commit each sink's staged slice (txn key = the group, so a
      // crashed run's partial commits reconcile to no-ops on resume)
      val sinkSnaps = Sinks.All.flatMap { s =>
        val dir = s"$staging/sink=$s"
        if (counts.getOrElse(s, 0L) > 0)
          Some(s -> reg.commitSinkStaged(s, g, dir))
        else None
      }.toMap

      // offsets/lineage rows (file.State analogue): a second, CHEAP pass via
      // the status-only routing fast path — identical sink decision to the
      // full transform (pinned by PipelineSpec) without the 13-field
      // extraction, so the group is never materialized twice at full width
      val offsets = TranscriptPipeline.sinkFast(slice)
        .groupBy(col("conv_id").as("partition_key"))
        .agg(max("turn_idx").as("max_turn_idx"),
          count(lit(1)).as("row_count"),
          sum(when(col("sink") === TranscriptPipeline.Filtered, 1L).otherwise(0L)).as("filtered"),
          sum(when(col("sink") === Sinks.Dropped, 1L).otherwise(0L)).as("dropped"))
        .withColumn("group", lit(g))
        .withColumn("committed_at", current_timestamp())
      reg.mergeOffsets(g, offsets)

      // lineage row: counts + per-write output stats (bytes/files per sink —
      // the reference's per-output-worker metrics, libbeat/outputs/metrics.go,
      // read straight off the snapshot metadata) + the PER-SINK SNAPSHOT IDS
      // this group produced, so any historical pipeline state can be
      // reconstructed table-version by table-version
      val writeStats = sinkSnaps.map { case (s, r) => s -> ((r.addedBytes, r.addedFiles.toLong)) }
      val lineage = counts.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      val bytesJson = writeStats
        .map { case (k, (b, f)) => s""""$k":{"bytes":$b,"files":$f}""" }
        .mkString("{", ",", "}")
      val snapsJson = sinkSnaps
        .map { case (s, r) => s""""$s":"${r.snapshotId}"""" }
        .mkString("{", ",", "}")
      val won = reg.commitGroup(g,
        s"""{"group":$g,"counts":$lineage,"writes":$bytesJson,"snapshots":$snapsJson}""")
      if (won)
        results += GroupResult(g, counts, writeStats.map { case (k, (b, _)) => k -> b })
      // staged files were either moved into tables or discarded by the
      // txn-key check; the scratch directory is garbage either way
      reg.cleanupStaging(g)

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
    // a monitoring caller may arrive before the first group commits (or on
    // a fresh root): report zeros, never throw — registry() requires
    // committed offsets and an empty filter sums to NULL
    val committed = reg.committedGroups().toSet
    val (total, filtered) =
      if (committed.isEmpty) (0L, 0L)
      else {
        val r = reg.registry().agg(sum("row_count"), sum("filtered")).collect()(0)
        (if (r.isNullAt(0)) 0L else r.getLong(0),
          if (r.isNullAt(1)) 0L else r.getLong(1))
      }
    val writeBytes = Sinks.All.map(s =>
      reg.sinkGroupStatsAll(s)
        .collect { case (g, (bytes, _)) if committed(g) => bytes }.sum).sum
    Map(
      "events.total" -> total,
      "events.published" -> published,
      "events.filtered" -> filtered,
      "events.dropped" -> dropped,
      "output.write_bytes" -> writeBytes
    )
  }
}
