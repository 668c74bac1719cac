package graft

import org.apache.spark.sql.functions._

import graft.enrich.Enrich
import graft.sources.Transcripts

/** enrich-path equivalence + fast-digest parity. */
class EnrichSpec extends SparkSpec {
  import spark.implicits._

  lazy val t = Transcripts.fromEvents(spark, "/root/testdata/sf0.001")

  test("inline (map-literal) enrich ≡ broadcast-join enrich") {
    val cols = Seq("conv_id", "turn_idx", "tool", "role",
      "tool_kind", "tool_team", "role_class", "role_priority").map(col)
    val joined = Enrich.enrich(t).select(cols: _*)
    val inline = Enrich.enrichInline(t).select(cols: _*)
    assert(joined.exceptAll(inline).isEmpty && inline.exceptAll(joined).isEmpty)
  }

  test("inline enrich plan has no join operator") {
    val plan = Enrich.enrichInline(t).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("sha256_hex ≡ sha2(s, 256) including empty and unicode") {
    val df = Seq("", "a", "conv-1#42", "ünïcödé ™", "x" * 1000).toDF("s")
    val bad = df.select(
      graft.functions.sha256_hex(col("s")).as("fast"),
      sha2(col("s"), 256).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(bad.count() == 0)
  }
}
