package graft.checkpoint

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Checkpoint registry — the Spark-native rebuild of Filebeat's registrar
  * (filebeat/registrar/registrar.go:139-214) and the filestream cursor store
  * (filebeat/input/filestream/internal/input-logfile/store.go:37-300):
  * a table of per-partition offsets + lineage, committed ATOMICALLY after the
  * sink writes of each batch group, so a killed job resumes idempotently.
  *
  * Commit protocol (Iceberg-snapshot-style optimistic concurrency,
  * implemented over any HDFS-compatible FS). Every runner carries a unique
  * `runId` FENCE — the multi-writer story the reference gets from the
  * filestream store's ref-counted shared resources (store.go:37-300):
  *   1. sinks for group g are written under  data/run=<runId>/group=<g>/
  *      sink=<sink>/ in ONE dynamic-partitioned write. Each runner writes
  *      ONLY its own run-scoped directory, so concurrent runners never
  *      clobber each other's files — the write plane is conflict-free by
  *      construction.
  *   2. checkpoint rows parquet under        <root>/registry/run=<runId>/
  *      group=<g>/
  *   3. a commit marker                      <root>/_commits/group-<g>
  *      recording the winning runId is created via create-then-rename — the
  *      atomicity point (the ACK: reference registrar only persists offsets
  *      AFTER the output ACKs, filebeat/beater/acker.go:37-68). Exactly ONE
  *      rename wins per group; the loser observes the winner's marker,
  *      reports defeat ([[commit]] → false), and deletes its orphaned
  *      run-scoped output ([[abandonGroup]]).
  *
  * A group is "processed" iff its marker exists, and readers resolve the
  * group's data through the RUN RECORDED IN THE MARKER — a loser's files are
  * unreachable even before cleanup. This is Iceberg's optimistic-commit
  * contract (writers stage files, a single metadata pointer swap decides the
  * winner) emulated with rename-atomicity.
  */
final class Registry(root: String, spark: SparkSession,
                     val runId: String = Registry.newRunId()) {

  private val fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerPath(group: Int): Path = new Path(s"$root/_commits/group-$group")

  def isCommitted(group: Int): Boolean = fs.exists(markerPath(group))

  def committedGroups(): Seq[Int] = {
    val dir = new Path(s"$root/_commits")
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("group-")).map(_.stripPrefix("group-").toInt).sorted
  }

  /** The runId recorded in a group's commit marker (the fence winner). */
  def markerRun(group: Int): Option[String] = {
    val p = markerPath(group)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val content = try {
      new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
    } finally in.close()
    Registry.RunField.findFirstMatchIn(content).map(_.group(1))
  }

  /** group's data+registry run scope: the committed winner's, else ours
    * (the pre-commit writer view). */
  private def resolvedRun(group: Int): String = markerRun(group).getOrElse(runId)

  /** this runner's data dir for a group — the ONLY place it may write. */
  def dataGroupDir(group: Int): String = s"$root/data/run=$runId/group=$group"

  /** Atomically mark `group` committed, recording lineage JSON under this
    * runner's fence. Returns true when THIS run owns the group afterwards;
    * false when a concurrent runner's marker won the rename race — the
    * caller lost and must not count the group (clean up via
    * [[abandonGroup]]). Re-running commit for a group this run already owns
    * is idempotent success. */
  def commit(group: Int, lineageJson: String): Boolean = {
    val tmp = new Path(s"$root/_commits/.tmp-group-$group-$runId-${System.nanoTime()}")
    fs.mkdirs(tmp.getParent)
    val out = fs.create(tmp, true)
    out.write(
      s"""{"run":"$runId","lineage":$lineageJson}""".getBytes(StandardCharsets.UTF_8))
    out.close()
    if (fs.rename(tmp, markerPath(group))) true
    else {
      fs.delete(tmp, false)
      markerRun(group) match {
        case Some(winner) => winner == runId
        case None =>
          throw new java.io.IOException(s"checkpoint commit failed for group $group")
      }
    }
  }

  /** Delete this run's staged (uncommitted or fence-defeated) output for a
    * group — the loser's clean exit. Never touches another run's files. */
  def abandonGroup(group: Int): Unit = {
    fs.delete(new Path(dataGroupDir(group)), true)
    fs.delete(new Path(s"$root/registry/run=$runId/group=$group"), true)
    // drop this run's now-empty scope dirs so a fully-defeated runner
    // leaves zero filesystem residue
    Seq(s"$root/data/run=$runId", s"$root/registry/run=$runId").foreach { d =>
      val p = new Path(d)
      if (fs.exists(p) && fs.listStatus(p).isEmpty) fs.delete(p, false)
    }
  }

  /** Write the per-partition offset rows for a group (step 2 of the protocol).
    * Schema ≈ file.State (filebeat/input/file/state.go:29-43):
    * (partition_key, max_turn_idx, row_count, run_id, committed_at). */
  def writeOffsets(group: Int, offsets: DataFrame): Unit =
    offsets.write.mode("overwrite").parquet(s"$root/registry/run=$runId/group=$group")

  /** All committed registry rows (the queryable "registrar state"),
    * resolved through each group's marker fence. */
  def registry(): DataFrame = {
    val groups = committedGroups()
    require(groups.nonEmpty, "no committed groups")
    val dfs = groups.map(g =>
      spark.read.parquet(s"$root/registry/run=${resolvedRun(g)}/group=$g"))
    dfs.reduce(_ unionByName _)
  }

  /** Sink paths covered by commit markers — the snapshot-isolated read view
    * (each group's path goes through its marker's winning run). */
  def committedSinkPaths(sink: String): Seq[String] =
    committedGroups()
      .map(g => s"$root/data/run=${resolvedRun(g)}/group=$g/sink=$sink")
      .filter(p => fs.exists(new Path(p)))

  /** Snapshot-isolated read of one sink table. The `sink` value is a
    * partition directory, recovered as a column via basePath; the internal
    * `run`/`group` partition columns are not part of the sink schema. */
  def readSink(sink: String): Option[DataFrame] = {
    val paths = committedSinkPaths(sink)
    if (paths.isEmpty) None
    else Some(spark.read.option("basePath", s"$root/data")
      .parquet(paths: _*).drop("run", "group"))
  }

  /** On-disk (bytes, files) of one sink group's write — the per-write output
    * stats the reference tracks per output worker (libbeat/outputs/metrics.go:
    * events/bytes acked per batch). Resolves through the marker fence for
    * committed groups; pre-commit it reports this run's staged write. */
  def sinkGroupStats(sink: String, group: Int): (Long, Long) = {
    val p = new Path(s"$root/data/run=${resolvedRun(group)}/group=$group/sink=$sink")
    if (!fs.exists(p)) return (0L, 0L)
    var bytes = 0L
    var files = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) { bytes += f.getLen; files += 1 }
    }
    (bytes, files)
  }
}

object Registry {
  private val RunField = """"run"\s*:\s*"([^"]+)"""".r

  /** process-unique fence id. The leading letter is LOAD-BEARING: the id
    * becomes a `run=<id>` partition directory value, and Spark's partition
    * inference parses an all-digits-plus-'e' value (a real outcome for a
    * bare hex id, e.g. "8091283e6568343") as a scientific-notation Decimal —
    * evaluating 10^<millions> in BigInteger and hanging the read. A
    * non-numeric first character forces string inference. */
  def newRunId(): String =
    "r" + java.util.UUID.randomUUID().toString.replace("-", "").take(15)
}
