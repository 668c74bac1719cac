package graft.checkpoint

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Spark-free child process for CasRaceSpec: races
  * [[SnapshotTable.publishAtomic]] — the real commit-point primitive —
  * against sibling JVMs over one table's metadata directory. Each child
  * commits `nCommits` versions through the loser-retries loop (read the
  * max version, stage a payload naming this writer, attempt the claim,
  * retry on loss) and prints one `WON <version>` line per claimed
  * version. Cross-process is the point: the link(2)-vs-rename(2)
  * subtlety only shows between separate processes, where in-JVM locks
  * cannot mask a silently-replaced commit. */
object CasRaceChild {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val id = args(1)
    val goFile = java.nio.file.Paths.get(args(2))
    val nCommits = args(3).toInt
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())
    val metaDir = new Path(root, "metadata")
    fs.mkdirs(metaDir)
    def maxVersion(): Long = {
      val vs = fs.listStatus(metaDir).map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
      if (vs.isEmpty) 0L else vs.max
    }
    // barrier: all children spin here until the parent says go, so the
    // claim attempts genuinely collide
    while (!java.nio.file.Files.exists(goFile)) Thread.sleep(1)
    var won = 0
    var attempts = 0
    while (won < nCommits && attempts < 500) {
      attempts += 1
      val next = maxVersion() + 1
      val tmp = new Path(metaDir, s".tmp-$id-$attempts")
      val out = fs.create(tmp, true)
      try out.write(s"""{"writer":"$id","version":$next}""".getBytes("UTF-8"))
      finally out.close()
      val target = new Path(metaDir, f"v$next%06d.json")
      if (SnapshotTable.publishAtomic(fs, tmp, target)) {
        won += 1
        // the claim must be self-consistent: the doc at the version this
        // writer claims to have won names this writer
        println(s"WON $next")
      }
    }
    if (won < nCommits) { println("EXHAUSTED"); sys.exit(2) }
    sys.exit(0)
  }
}
