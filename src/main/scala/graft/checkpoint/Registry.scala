package graft.checkpoint

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** Checkpoint registry — the Spark-native rebuild of Filebeat's registrar
  * (filebeat/registrar/registrar.go:139-214) and the filestream cursor store
  * (filebeat/input/filestream/internal/input-logfile/store.go:37-300), now
  * layered on the real snapshot table format ([[SnapshotTable]]):
  *
  * {{{
  *   <root>/sinks/<sink>/     one snapshot table per sink (append-only)
  *   <root>/registry/         offsets table — per-partition high-water marks,
  *                            updated by copy-on-write MERGE INTO on
  *                            partition_key
  *   <root>/commits/          the pipeline commit log — one lineage row per
  *                            group recording counts, the winning run and
  *                            the PER-SINK SNAPSHOT IDS that group produced
  * }}}
  *
  * Per group, the protocol is:
  *   1. append the group's rows to each sink table with txn key
  *      `group-<g>` — idempotent: a retry or a racing runner gets
  *      `alreadyCommitted` with the original snapshot id, never a duplicate;
  *   2. MERGE the group's offsets into the registry table (same txn key);
  *   3. append the lineage row to the commit log (same txn key) — THE ack
  *      point (reference registrar persists offsets only after the output
  *      ACKs, filebeat/beater/acker.go:37-68). Exactly one runner's append
  *      wins; the loser reports defeat and cleans its staging.
  *
  * Crash between 1 and 3 (a PARTIAL sink commit) reconciles on resume: the
  * group is absent from the commit log so it re-runs, and each sink table's
  * txn key turns the re-append into a no-op returning the crashed run's
  * snapshot id — effectively-once without ever scanning data.
  *
  * Reads are snapshot-isolated per table, and [[readSink]] additionally
  * resolves through the commit log (only snapshots whose group is in the
  * log are visible), so a partially-committed group is invisible to
  * consumers until its ack lands — the cross-table read-committed view.
  */
final class Registry(root: String, spark: SparkSession,
                     val runId: String = Registry.newRunId()) {

  private val fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def sinkTable(sink: String): SnapshotTable =
    new SnapshotTable(s"$root/sinks/$sink", spark, runId)
  val offsetsTable: SnapshotTable = new SnapshotTable(s"$root/registry", spark, runId)
  val commitLog: SnapshotTable = new SnapshotTable(s"$root/commits", spark, runId)

  private def txnKey(group: Int): String = s"group-$group"

  def isCommitted(group: Int): Boolean =
    commitLog.state().txnKeys.contains(txnKey(group))

  def committedGroups(): Seq[Int] =
    commitLog.state().txnKeys.keys
      .filter(_.startsWith("group-")).map(_.stripPrefix("group-").toInt)
      .toSeq.sorted

  /** The runId that won a group's commit-log append (the fence winner). */
  def markerRun(group: Int): Option[String] =
    commitLog.snapshotForTxn(txnKey(group)).map(_.run)

  /** this runner's private staging dir for a group's fan-out write. */
  def stagingGroupDir(group: Int): String =
    s"$root/_staging/run=$runId/group=$group"

  /** step 1: commit one sink's staged slice of the group into its table. */
  def commitSinkStaged(sink: String, group: Int,
                       stagedDir: String): SnapshotTable.CommitResult =
    sinkTable(sink).commitStagedDir(stagedDir, Some(txnKey(group)))

  /** step 2: MERGE the group's offset rows into the registry table —
    * partition_key is the merge key, so a re-run of a conversation's data
    * advances its high-water mark instead of duplicating the row. */
  def mergeOffsets(group: Int, offsets: DataFrame): SnapshotTable.CommitResult =
    offsetsTable.merge(offsets, Seq("partition_key"), Some(txnKey(group)))

  /** step 3 — the ACK: append the group's lineage row (counts + per-sink
    * snapshot ids, under this runner's fence) to the commit log. Returns
    * true when THIS run owns the group afterwards; false when a concurrent
    * runner's append won — the caller lost and must not count the group. */
  def commitGroup(group: Int, lineageJson: String): Boolean = {
    import spark.implicits._
    val row = Seq((group, runId, lineageJson)).toDF("group", "run", "lineage")
    val res = commitLog.append(row, Some(txnKey(group)))
    !res.alreadyCommitted || markerRun(group).contains(runId)
  }

  /** drop this runner's staged files for a group (post-commit or defeat). */
  def cleanupStaging(group: Int): Unit = {
    fs.delete(new Path(stagingGroupDir(group)), true)
    // drop the now-empty scope dirs so a finished runner leaves no residue.
    // The empty-check + non-recursive delete races a CONCURRENT runner
    // creating its own staging underneath (check-then-act); losing that race
    // just means the shared dir survives — never fail the finishing runner.
    Seq(new Path(s"$root/_staging/run=$runId"), new Path(s"$root/_staging"))
      .foreach { d =>
        try if (fs.exists(d) && fs.listStatus(d).isEmpty) fs.delete(d, false)
        catch { case _: java.io.IOException => () }
      }
  }

  /** All committed registry rows (the queryable "registrar state"): the
    * offsets table's current snapshot, gated on the commit log — offsets
    * MERGE in step 2, the ack lands in step 3, and a crash in between must
    * not surface a group's offsets before its sinks are acked (the
    * registrar invariant: offsets persist only after the output ACKs,
    * filebeat/beater/acker.go:37-68). */
  def registry(): DataFrame = {
    val df = offsetsTable.read()
    require(df.isDefined, "no committed groups")
    val committed = committedGroups()
    df.get.filter(org.apache.spark.sql.functions.col("group").isin(committed: _*))
  }

  /** Read-committed view of one sink table: snapshot-isolated AND resolved
    * through the commit log, so only acked groups are visible. */
  def readSink(sink: String): Option[DataFrame] = {
    val committed = commitLog.state().txnKeys.keySet
    sinkTable(sink).readCommittedTxns(committed.contains)
      .map(_.withColumn("sink", lit(sink)))
  }

  /** (bytes, files) one sink's snapshot for a group added — the per-write
    * output stats the reference tracks per output worker
    * (libbeat/outputs/metrics.go), straight from the table metadata: no
    * filesystem walk. */
  def sinkGroupStats(sink: String, group: Int): (Long, Long) =
    sinkTable(sink).snapshotForTxn(txnKey(group))
      .map(s => (s.added.map(_.size).sum, s.added.size.toLong))
      .getOrElse((0L, 0L))

  /** per-group (bytes, files) for one sink in ONE metadata read — the
    * metrics roll-up shape; [[sinkGroupStats]]'s per-(sink, group) form
    * would re-read and re-resolve the table state once per pair. */
  def sinkGroupStatsAll(sink: String): Map[Int, (Long, Long)] =
    sinkTable(sink).state().snapshots.flatMap { s =>
      s.txn.filter(_.startsWith("group-")).map(t =>
        t.stripPrefix("group-").toInt ->
          (s.added.map(_.size).sum, s.added.size.toLong))
    }.toMap
}

object Registry {
  /** process-unique fence id. The leading letter is LOAD-BEARING: the id
    * becomes a directory-name component, and a non-numeric first character
    * keeps every downstream parser (and Spark partition inference, should a
    * run id ever appear as a partition value) treating it as a string. */
  def newRunId(): String =
    "r" + java.util.UUID.randomUUID().toString.replace("-", "").take(15)
}
