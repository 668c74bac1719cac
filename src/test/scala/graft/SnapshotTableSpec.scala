package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.checkpoint.SnapshotTable

/** Format-level gates for the from-scratch snapshot table format: CAS
  * commits, txn-key idempotence, copy-on-write MERGE, snapshot-isolated
  * reads. (The pipeline-level protocol over it is gated in
  * PipelineRunnerSpec.) */
class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): SnapshotTable =
    new SnapshotTable(Files.createTempDirectory("graft-snaptbl").toString, spark)

  test("append advances one version per commit; reads are snapshot-isolated") {
    val t = tmpTable()
    assert(t.state().version == 0 && t.read().isEmpty)
    val r1 = t.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), txn = None)
    assert(!r1.alreadyCommitted && t.state().version == 1)
    val r2 = t.append(Seq((3, "c")).toDF("id", "v"), txn = None)
    assert(t.state().version == 2 && r2.snapshotId != r1.snapshotId)
    assert(t.read().get.count() == 3)
    // metadata records real file sizes
    assert(t.state().files.forall(_.size > 0))
    assert(r1.addedBytes > 0 && r2.addedBytes > 0)
  }

  test("txn keys make appends effectively-once") {
    val t = tmpTable()
    val first = t.append(Seq((1, "a")).toDF("id", "v"), txn = Some("batch-1"))
    val retry = t.append(Seq((1, "a")).toDF("id", "v"), txn = Some("batch-1"))
    assert(!first.alreadyCommitted && retry.alreadyCommitted)
    assert(retry.snapshotId == first.snapshotId)
    assert(t.read().get.count() == 1)
    assert(t.state().version == 1, "the rejected retry must not add a version")
  }

  test("MERGE INTO: latest rows win by key, others survive, files replaced") {
    val t = tmpTable()
    t.append(Seq(("c1", 5L), ("c2", 7L)).toDF("partition_key", "hwm"), None)
    t.merge(Seq(("c2", 9L), ("c3", 1L)).toDF("partition_key", "hwm"),
      keys = Seq("partition_key"), txn = None)
    val rows = t.read().get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("c1" -> 5L, "c2" -> 9L, "c3" -> 1L))
    // copy-on-write: current state lists only the merge's own files
    val st = t.state()
    assert(st.snapshots.last.operation == "merge")
    assert(st.files.toSet == st.snapshots.last.added.toSet)
  }

  test("concurrent appenders all land; versions strictly serialize") {
    val t = tmpTable()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 4).map { i =>
      Future(t.append(Seq((i, s"w$i")).toDF("id", "v"), txn = Some(s"w-$i")))
    }
    val results = fs.map(Await.result(_, 2.minutes))
    assert(results.forall(!_.alreadyCommitted))
    assert(t.state().version == 4)
    assert(t.read().get.count() == 4)
    // every committed snapshot id is distinct and recorded in history
    assert(t.state().snapshots.map(_.id).distinct.size == 4)
  }

  test("concurrent same-txn appenders: exactly one wins, no duplicate rows") {
    val t = tmpTable()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val racers = (1 to 3).map { _ =>
      Future(t.append(Seq((42, "x")).toDF("id", "v"), txn = Some("the-batch")))
    }
    val results = racers.map(Await.result(_, 2.minutes))
    assert(results.count(!_.alreadyCommitted) == 1)
    assert(results.map(_.snapshotId).distinct.size == 1)
    assert(t.read().get.count() == 1)
  }

  test("expireSnapshots reclaims files stranded by copy-on-write merges") {
    val t = tmpTable()
    t.append(Seq(("c1", 1L)).toDF("k", "v"), None)
    t.append(Seq(("c2", 2L)).toDF("k", "v"), None)
    t.merge(Seq(("c1", 9L)).toDF("k", "v"), keys = Seq("k"), txn = None)
    assert(t.state().version == 3)
    val deleted = t.expireSnapshots(keepVersions = 1)
    assert(deleted > 0, "the merge stranded the append files — expiry must reclaim them")
    // only the current version's metadata and files remain
    val metaDir = new java.io.File(s"${t.root}/metadata")
    assert(metaDir.listFiles().count(_.getName.matches("v\\d+\\.json")) == 1)
    val dataDir = new java.io.File(s"${t.root}/data")
    // ignore Hadoop LocalFileSystem .crc sidecars (hidden files)
    assert(dataDir.listFiles().filterNot(_.getName.startsWith("."))
      .map(f => s"data/${f.getName}").toSet ==
      t.state().files.map(_.path).toSet)
    // the table still reads the merged truth
    val rows = t.read().get.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("c1" -> 9L, "c2" -> 2L))
    // nothing more to expire
    assert(t.expireSnapshots(keepVersions = 1) == 0)
  }

  test("a reader's resolved snapshot is immune to commits that land after it") {
    val t = tmpTable()
    t.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), None)
    val view = t.read().get // resolves version 1's file list NOW
    t.merge(Seq((1, "a2")).toDF("id", "v"), keys = Seq("id"), txn = None)
    // the merge rewrote the table, but the in-flight reader still sees its
    // snapshot (the old files remain on disk until expiry)
    assert(view.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "a"), (2, "b")))
    assert(t.read().get.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "a2"), (2, "b")))
  }

  test("concurrent merge and append serialize without losing either commit") {
    val t = tmpTable()
    t.append(Seq(("k1", 1L)).toDF("k", "v"), None)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fm = Future(t.merge(Seq(("k1", 100L)).toDF("k", "v"), Seq("k"), None))
    val fa = Future(t.append(Seq(("k2", 2L)).toDF("k", "v"), None))
    Await.result(fm, 2.minutes); Await.result(fa, 2.minutes)
    assert(t.state().version == 3)
    val rows = t.read().get.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // both effects present regardless of commit order: merge-first → append
    // adds k2 after the rewrite; append-first → the merge CAS-retries
    // against the appended state and carries k2 through its rewrite
    assert(rows == Map("k1" -> 100L, "k2" -> 2L))
  }

  test("historical snapshots stay readable (metadata retained per version)") {
    val t = tmpTable()
    t.append(Seq((1, "a")).toDF("id", "v"), None)
    t.append(Seq((2, "b")).toDF("id", "v"), None)
    // the v1 metadata file still resolves the v1 file list
    val metaDir = new java.io.File(s"${t.root}/metadata")
    assert(metaDir.listFiles().count(_.getName.matches("v\\d+\\.json")) == 2)
  }

  test("time travel: readVersion/readSnapshot see the table as of a commit") {
    val t = tmpTable()
    val r1 = t.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), None)
    t.append(Seq((3, "c")).toDF("id", "v"), None)
    // a COW merge rewrites the live file set; history must not move
    t.merge(Seq((2, "B2")).toDF("id", "v"), keys = Seq("id"), None)
    assert(t.liveVersions() == Seq(1L, 2L, 3L))
    assert(t.readVersion(1).get.count() == 2)
    assert(t.readVersion(2).get.count() == 3)
    assert(t.readVersion(2).get.where(col("id") === 2).select("v")
      .first().getString(0) == "b", "v2 predates the merge")
    assert(t.readVersion(3).get.where(col("id") === 2).select("v")
      .first().getString(0) == "B2")
    assert(t.readSnapshot(r1.snapshotId).get.count() == 2)
    assert(t.readVersion(0).isEmpty && t.readVersion(9).isEmpty &&
      t.readSnapshot("no-such").isEmpty)
  }

  test("manifest splitting: file list spills past the inline limit, appends " +
    "reuse prior manifests, coalesce bounds fan-out, expiry reclaims") {
    val root = Files.createTempDirectory("graft-snaptbl").toString
    val t = new SnapshotTable(root, spark,
      inlineFileLimit = 2, manifestCoalesceAt = 3)
    def one(i: Int) = Seq((i, s"v$i")).toDF("id", "v").coalesce(1)
    (1 to 6).foreach(i => t.append(one(i), txn = Some(s"b-$i")))
    // v1–v2 inline; v3 crosses the 2-file limit → one manifest of all 3
    assert(t.stateAt(2).get.manifestRefs.isEmpty)
    val v3 = t.stateAt(3).get
    assert(v3.manifestRefs.size == 1 && v3.manifestRefs.head.count == 3)
    // v4–v5 append ONE manifest each, reusing v3's untouched (O(added) commits)
    val v4 = t.stateAt(4).get
    assert(v4.manifestRefs.size == 2 &&
      v4.manifestRefs.head == v3.manifestRefs.head)
    assert(t.stateAt(5).get.manifestRefs.size == 3)
    // v6 would be 4 manifests > coalesceAt=3 → merged back to one
    val v6 = t.stateAt(6).get
    assert(v6.manifestRefs.size == 1 && v6.manifestRefs.head.count == 6)
    // resolution is complete at every layout era, and reads agree
    assert(v6.files.size == 6 && t.read().get.count() == 6)
    assert(t.readVersion(2).get.count() == 2)
    assert(t.readVersion(4).get.count() == 4)
    // a reader with DEFAULT thresholds resolves the split layout identically
    val reader = new SnapshotTable(root, spark)
    assert(reader.read().get.count() == 6)
    assert(reader.state().files.toSet == v6.files.toSet)
    // txn idempotence still holds across the layout switch
    assert(t.append(one(3), txn = Some("b-3")).alreadyCommitted)
    // expiry drops old versions' manifests; disk holds exactly the live refs
    t.expireSnapshots(keepVersions = 1, orphanGraceMs = 0)
    val onDisk = new java.io.File(s"$root/metadata").listFiles()
      .map(_.getName).filter(_.startsWith("m-")).map(n => s"metadata/$n").toSet
    assert(onDisk == t.state().manifestRefs.map(_.path).toSet)
    assert(t.read().get.count() == 6)
  }

  test("manifest mode: COW merge replaces manifests; racing writers leave " +
    "no manifest debris") {
    val root = Files.createTempDirectory("graft-snaptbl").toString
    val t = new SnapshotTable(root, spark,
      inlineFileLimit = 1, manifestCoalesceAt = 8)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val racers = (1 to 4).map { i =>
      Future(t.append(Seq((i, i.toLong)).toDF("k", "v").coalesce(1), None))
    }
    racers.foreach(Await.result(_, 2.minutes))
    t.merge(Seq((1, 100L)).toDF("k", "v").coalesce(1), keys = Seq("k"), None)
    val rows = t.read().get.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows == Map(1 -> 100L, 2 -> 2L, 3 -> 3L, 4 -> 4L))
    // merge started a FRESH manifest line (no carried refs from the appends)
    val st = t.state()
    assert(st.snapshots.last.operation == "merge")
    assert(st.manifestRefs.size == 1 || st.manifestRefs.isEmpty)
    // every manifest on disk is referenced by SOME live version — CAS
    // losers deleted theirs
    val live = t.liveVersions()
      .flatMap(v => t.stateAt(v).get.manifestRefs.map(_.path)).toSet
    val onDisk = new java.io.File(s"$root/metadata").listFiles()
      .map(_.getName).filter(_.startsWith("m-")).map(n => s"metadata/$n").toSet
    assert(onDisk == live)
  }

  test("expireSnapshots reclaims crashed writers' temp debris") {
    val root = Files.createTempDirectory("graft-snaptbl").toString
    val t = new SnapshotTable(root, spark)
    t.append(Seq((1, "a")).toDF("id", "v"), None)
    // plant the three crash shapes: a candidate-metadata temp (died before
    // publishAtomic) and append/merge staging dirs (died before cleanup)
    val staleMeta = new java.io.File(s"$root/metadata/.tmp-dead-writer-x")
    java.nio.file.Files.write(staleMeta.toPath, "{}".getBytes)
    val staleAppend = new java.io.File(s"$root/_tmp-append-dead-writer-y")
    val staleMerge = new java.io.File(s"$root/_tmp-merge-dead-writer-z")
    staleAppend.mkdirs(); staleMerge.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(staleAppend, "part-0.parquet").toPath, Array[Byte](1, 2, 3))
    val old = System.currentTimeMillis() - 7200000L
    Seq(staleMeta, staleAppend, staleMerge).foreach(_.setLastModified(old))
    t.expireSnapshots(keepVersions = 1, orphanGraceMs = 3600000L)
    assert(!staleMeta.exists() && !staleAppend.exists() && !staleMerge.exists(),
      "aged temp debris must be reclaimed")
    // a LIVE writer's fresh temp survives the grace window
    val fresh = new java.io.File(s"$root/_tmp-append-live-writer")
    fresh.mkdirs()
    t.expireSnapshots(keepVersions = 1, orphanGraceMs = 3600000L)
    assert(fresh.exists(), "fresh temp state is protected by the grace window")
    assert(t.read().get.count() == 1)
  }

  test("time travel window is bounded by expireSnapshots retention") {
    val t = tmpTable()
    t.append(Seq((1, "a")).toDF("id", "v"), None)
    t.append(Seq((2, "b")).toDF("id", "v"), None)
    t.append(Seq((3, "c")).toDF("id", "v"), None)
    t.expireSnapshots(keepVersions = 2, orphanGraceMs = 0)
    assert(t.liveVersions() == Seq(2L, 3L))
    assert(t.readVersion(1).isEmpty, "expired versions are gone")
    assert(t.readVersion(2).get.count() == 2)
    assert(t.readVersion(3).get.count() == 3)
    assert(t.read().get.count() == 3)
  }
}
