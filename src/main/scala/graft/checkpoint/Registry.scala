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
  * Commit protocol (Iceberg-snapshot-style, implemented over any
  * HDFS-compatible FS):
  *   1. sinks for group g are written under  data/group=<g>/sink=<sink>/
  *      in ONE dynamic-partitioned write (overwrite — a re-run of an
  *      uncommitted group replaces its partial output)
  *   2. checkpoint rows parquet under        <root>/registry/group=<g>/
  *   3. a commit marker                      <root>/_commits/group-<g>
  *      is created via create-then-rename — the atomicity point (the ACK:
  *      reference registrar only persists offsets AFTER the output ACKs,
  *      filebeat/beater/acker.go:37-68)
  *
  * A group is "processed" iff its marker exists. Resume = skip committed
  * groups. Sinks readers must union only group dirs with markers (the
  * [[committedSinkPaths]] helper) — exactly Iceberg's snapshot-isolation
  * contract, emulated with rename-atomicity.
  */
final class Registry(root: String, spark: SparkSession) {

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

  /** Atomically mark `group` committed, recording lineage JSON. */
  def commit(group: Int, lineageJson: String): Unit = {
    val tmp = new Path(s"$root/_commits/.tmp-group-$group-${System.nanoTime()}")
    fs.mkdirs(tmp.getParent)
    val out = fs.create(tmp, true)
    out.write(lineageJson.getBytes(StandardCharsets.UTF_8))
    out.close()
    if (!fs.rename(tmp, markerPath(group))) {
      fs.delete(tmp, false)
      // a concurrent/previous attempt won the rename — idempotent success
      if (!fs.exists(markerPath(group))) {
        throw new java.io.IOException(s"checkpoint commit failed for group $group")
      }
    }
  }

  /** Write the per-partition offset rows for a group (step 2 of the protocol).
    * Schema ≈ file.State (filebeat/input/file/state.go:29-43):
    * (partition_key, max_turn_idx, row_count, run_id, committed_at). */
  def writeOffsets(group: Int, offsets: DataFrame): Unit =
    offsets.write.mode("overwrite").parquet(s"$root/registry/group=$group")

  /** All committed registry rows (the queryable "registrar state"). */
  def registry(): DataFrame = {
    val groups = committedGroups()
    require(groups.nonEmpty, "no committed groups")
    val dfs = groups.map(g => spark.read.parquet(s"$root/registry/group=$g"))
    dfs.reduce(_ unionByName _)
  }

  /** Sink paths covered by commit markers — the snapshot-isolated read view. */
  def committedSinkPaths(sink: String): Seq[String] =
    committedGroups().map(g => s"$root/data/group=$g/sink=$sink")
      .filter(p => fs.exists(new Path(p)))

  /** Snapshot-isolated read of one sink table. The `sink` value is a
    * partition directory, recovered as a column via basePath; the internal
    * `group` partition column is not part of the sink schema. */
  def readSink(sink: String): Option[DataFrame] = {
    val paths = committedSinkPaths(sink)
    if (paths.isEmpty) None
    else Some(spark.read.option("basePath", s"$root/data")
      .parquet(paths: _*).drop("group"))
  }

  /** On-disk (bytes, files) of one sink group's write — the per-write output
    * stats the reference tracks per output worker (libbeat/outputs/metrics.go:
    * events/bytes acked per batch). */
  def sinkGroupStats(sink: String, group: Int): (Long, Long) = {
    val p = new Path(s"$root/data/group=$group/sink=$sink")
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
