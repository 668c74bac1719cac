package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Shared LSH/banding plumbing for the sketch family: ONE definition of the
  * hyperplane (table, bucket) index construction, the multiprobe expansion,
  * and the degenerate-bucket guard — [[Ann.lshNeighbors]] (search),
  * [[graft.dedup.Dedup.embeddingPairsLsh]] (near-dup self-join), and the
  * minhash/simhash band guards all compose these, so a change to probe
  * enumeration or guard semantics cannot silently diverge between paths
  * (the exhaustive-probe oracle trick depends on them agreeing).
  */
object Lsh {

  /** (table, bucket) banding of an embedding table: one row per hash table
    * with the vector's hyperplane bucket. */
  private[graft] def hyperplaneBanded(df: DataFrame, idAs: String, vAs: String,
                                      planes: Int, tables: Int): DataFrame =
    df.select(col("vec_id").as(idAs), col("embedding").as(vAs),
      posexplode(array((0 until tables).map(t =>
        hyperplane_bucket(col("embedding"), planes, t)): _*))
        .as(Seq("table", "bucket")))

  /** Multiprobe expansion: each banded row additionally probes every bucket
    * within `probeHamming` sign-bit flips of its own (the standard
    * table-count reducer); `probeHamming = planes` enumerates ALL buckets,
    * degenerating the search to exact brute force — the oracle trick shared
    * with IVF's nprobe = nlist. `keep` lists the non-(table,bucket) columns
    * to carry. */
  private[graft] def multiprobe(banded: DataFrame, keep: Seq[String],
                                planes: Int, probeHamming: Int): DataFrame =
    if (probeHamming <= 0) banded
    else if (probeHamming >= planes)
      // full probe (the exact-oracle degenerate): every bucket — enumerate
      // the bucket space directly (only sensible at small `planes`)
      banded.withColumnRenamed("bucket", "bucket0")
        .select(keep.map(col) ++ Seq(col("table"),
          explode(sequence(lit(0), lit((1 << planes) - 1))).as("bucket")): _*)
    else {
      // enumerate only the C(planes, ≤h) flip masks, driver-side — the
      // former per-row sequence(0, 2^planes − 1) + filter materialized the
      // WHOLE bucket space per banded row (64 MB/row at planes = 24) to
      // keep a handful of neighbors
      val masks = (0 to probeHamming)
        .flatMap(h => (0 until planes).combinations(h))
        .map(_.foldLeft(0)((m, b) => m | (1 << b)))
      banded.withColumnRenamed("bucket", "bucket0")
        .select(keep.map(col) ++ Seq(col("table"),
          explode(array(masks.map(m =>
            col("bucket0").bitwiseXOR(lit(m))): _*)).as("bucket")): _*)
    }

  /** Degenerate-bucket guard (boilerplate keys → mega-buckets → skew):
    * bucket sizes come from a COUNT aggregation (constant-size buffer,
    * map-side combinable) and out-of-bounds buckets are dropped by a
    * semi-join BEFORE any pair-generating self-join — no task ever
    * materializes a bucket's membership list, so a mega-bucket costs one
    * counter, never one buffer. `minSize = 2` additionally drops singleton
    * buckets (they cannot produce a pair in a self-join). */
  private[graft] def guardBuckets(df: DataFrame, keys: Seq[String],
                                  maxBucket: Int, minSize: Long = 1): DataFrame = {
    val ok = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= minSize && col("_n") <= maxBucket)
      .select(keys.map(col): _*)
    df.join(ok, keys)
  }
}
