package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.pipeline.TranscriptPipeline
import graft.sources.Transcripts

/** Driver contract — queries (Spark) + oracleSql (DuckDB twins).
  * Column names are aligned pairwise: the driver sorts columns by name and
  * hashes values, so every computed column is aliased identically on both
  * sides.
  */
object SparkEntry {

  /** Flagship: full parse→enrich→route over sf0.001-derived transcripts. */
  def entry(spark: SparkSession): DataFrame =
    TranscriptPipeline.routed(Transcripts.fromEvents(spark, "/root/testdata/sf0.001"))

  private def t(s: SparkSession, dir: String): DataFrame = Transcripts.fromEvents(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- transcripts derivation (the shared input table) ---
    "q_transcripts" -> ((s, dir) => t(s, dir)),

    // --- parse stage (custom Catalyst expression, serverlog semantics) ---
    "q_parse_serverlog" -> ((s, dir) =>
      TranscriptPipeline.parse(t(s, dir)).drop("extra")),

    // --- enrich stage (broadcast hash join against lookup dims) ---
    "q_enrich_broadcast" -> ((s, dir) =>
      graft.enrich.Enrich.enrich(t(s, dir))
        .select("conv_id", "turn_idx", "tool", "role",
          "tool_kind", "tool_team", "role_class", "role_priority")),

    // --- route stage: sink selection + metrics parity gates ---
    "q_route_sink_counts" -> ((s, dir) =>
      TranscriptPipeline.transform(t(s, dir))
        .groupBy("sink").agg(count(lit(1)).as("events"))),

    "q_routed_rows" -> ((s, dir) =>
      TranscriptPipeline.routed(t(s, dir))
        .select("conv_id", "turn_idx", "sink", "text", "doc_id")),

    "q_bucket_metrics" -> ((s, dir) =>
      TranscriptPipeline.transform(t(s, dir))
        .withColumn("bucket", substring(col("conv_id"), 6, 8).cast("int") % 8)
        .groupBy("bucket", "sink").agg(count(lit(1)).as("events")))
  )

  def oracleSql: Map[String, String] = Map(
    "q_transcripts" ->
      (OracleCte.transcripts + " SELECT * FROM transcripts"),

    "q_parse_serverlog" ->
      (OracleCte.parsed +
        """ SELECT conv_id, turn_idx, role, tool, ts, text, logtime, service,
          | hostname, level, thread, class, method, line, trace_id, span_id,
          | message, status FROM parsed""".stripMargin),

    "q_enrich_broadcast" ->
      (OracleCte.transcripts + "," + OracleCte.lookups +
        """ SELECT conv_id, turn_idx, t.tool AS tool, t.role AS role,
          | tool_kind, tool_team, role_class, role_priority
          | FROM transcripts t
          | LEFT JOIN tool_meta tm ON t.tool = tm.tool
          | LEFT JOIN role_meta rm ON t.role = rm.role""".stripMargin),

    "q_route_sink_counts" ->
      (OracleCte.parsed +
        " SELECT sink, count(*) AS events FROM parsed GROUP BY sink"),

    "q_routed_rows" ->
      (OracleCte.parsed +
        """ SELECT conv_id, turn_idx, sink, text,
          | sha256(conv_id || '#' || CAST(turn_idx AS VARCHAR)) AS doc_id
          | FROM parsed WHERE sink <> 'filtered'""".stripMargin),

    "q_bucket_metrics" ->
      (OracleCte.parsed +
        """ SELECT CAST(substr(conv_id, 6, 8) AS INTEGER) % 8 AS bucket,
          | sink, count(*) AS events FROM parsed GROUP BY 1, 2""".stripMargin)
  )
}
