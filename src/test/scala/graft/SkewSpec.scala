package graft

import org.apache.spark.sql.functions._

import graft.enrich.Enrich
import graft.sources.Transcripts

/** Hot-conversation skew handling: the synthesized corpus gives one conv
  * ~20% of all rows (Transcripts.synthesize hotFraction) — the shape that
  * stalls a naive repartition-by-key at cluster scale because one partition
  * receives the whole hot key.
  */
class SkewSpec extends SparkSpec {

  test("synthesized corpus is actually skewed (hot conv ≈ 20% of rows)") {
    val df = Transcripts.synthesize(spark, 20000L, 400L)
    val hot = df.groupBy("conv_id").count().orderBy(desc("count")).head()
    assert(hot.getLong(1) > 3000L, s"expected a hot conv, got $hot")
  }

  test("repartition by conv_id alone concentrates the hot key in one partition") {
    val df = Transcripts.synthesize(spark, 20000L, 400L)
    val plain = df.repartition(8, col("conv_id"))
      .groupBy(spark_partition_id().as("pid")).count()
      .agg(max("count"), min("count")).head()
    // the hot conv (≈4k rows) lands whole in a single partition
    assert(plain.getLong(0) >= 4000L)
  }

  test("salted repartition spreads the hot conv across partitions") {
    val df = Transcripts.synthesize(spark, 20000L, 400L)
    val salted = Enrich.saltedRepartition(df, "conv_id", saltBuckets = 8, numPartitions = 8)
    val sizes = salted.groupBy(spark_partition_id().as("pid")).count()
      .select("count").collect().map(_.getLong(0))
    val (mx, mn) = (sizes.max, sizes.min)
    // near-even spread: no partition holds more than 2× the smallest
    assert(mx <= 2 * mn, s"still skewed after salting: max=$mx min=$mn sizes=${sizes.toSeq}")
  }
}
