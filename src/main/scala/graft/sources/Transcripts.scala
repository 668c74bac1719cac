package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** The transcripts table: multi-turn conversation / agent transcripts with
  * schema (conv_id string, turn_idx int, role string, text string,
  * tool string, ts timestamp).
  *
  * Two constructors:
  *   - [[fromEvents]]: deterministic derivation from the driver-provided
  *     `events` parquet. Every expression is integer/string arithmetic that
  *     an external ANSI-SQL engine reproduces bit-for-bit, so correctness
  *     oracles can be expressed as plain SQL over the same parquet file
  *     (see [[graft.OracleCte]]).
  *   - [[synthesize]]: `spark.range`-based generator for arbitrary-scale
  *     benchmarks, with Zipf-ish hot conv_ids to exercise skew handling.
  *
  * The `text` column carries serverlog-shaped lines mirroring the reference
  * parser's input contract (libbeat/processors/parse_serverlog/parser.go:98-151):
  * a 23-char timestamp prefix, then space-separated
  * `service host level [thread] class method [line] [trace] [span] body`,
  * optionally suffixed with a `##JIDU##{json}##JIDU##` envelope, with
  * deterministic malformed/bad-service/benchmark-trace minorities.
  */
object Transcripts {

  /** 23-char log timestamp string built from pure integer math on `event_id`
    * (no timezone/format dependence — reproducible in any SQL engine). */
  def tstr(e: Column): Column = concat(
    lit("2024-01-01 "),
    lpad(((e % 86400L) / 3600L).cast("long").cast("string"), 2, "0"), lit(":"),
    lpad(((e % 3600L) / 60L).cast("long").cast("string"), 2, "0"), lit(":"),
    lpad((e % 60L).cast("string"), 2, "0"), lit("."),
    lpad(((e * 7L) % 1000L).cast("string"), 3, "0")
  )

  /** Full serverlog-style line for one event row. Families:
    *  - e % 13 == 0  → "short" line (< 11 positional items)
    *  - e % 17 == 0  → invalid service name (uppercase prefix) → dead-letter
    *  - e % 37 == 0  → benchmark trace id `^00000000[1-9a-f]` → filtered
    *  - e % 10 == 3  → service has a trailing comma (parser strips one comma)
    *  - e %  5 == 0  → `##JIDU##` embedded-JSON suffix
    */
  private def textCol(e: Column, u: Column, et: Column): Column = {
    val lvlWord = when(et === "error", lit("error"))
      .when(et === "purchase", lit("info"))
      .when(et === "click", lit("debug"))
      .when(et === "view", lit("verbose"))
      .otherwise(lit("warn"))
    val svcBase = concat(lit("svc-"), et)
    val svc = when(e % 17 === 0, concat(lit("Svc-"), et))
      .when(e % 10 === 3, concat(svcBase, lit(",")))
      .otherwise(svcBase)
    val trace = when(e % 37 === 0,
      concat(lit("[000000001a"), lpad((e % 1000L).cast("string"), 3, "0"), lit("]")))
      .otherwise(concat(lit("[t"), lpad(((e * 31L) % 100000L).cast("string"), 8, "0"), lit("]")))
    val jidu = when(e % 5 === 0,
      concat(lit(" ##JIDU##{\"extra_k\": \"v"), (e % 100L).cast("string"), lit("\"}##JIDU##")))
      .otherwise(lit(""))
    val full = concat(
      tstr(e), lit(" "),
      svc, lit(" "),
      lit("host-"), (u % 5L).cast("string"), lit(" "),
      lvlWord, lit(" "),
      lit("[t-"), (e % 8L).cast("string"), lit("] "),
      lit("com.example.Cls"), (e % 20L).cast("string"), lit(" "),
      lit("run"), (e % 7L).cast("string"), lit(" "),
      lit("["), (e % 1000L).cast("string"), lit("] "),
      trace, lit(" "),
      lit("[s"), (e % 9999L).cast("string"), lit("] "),
      lit("evt="), et, lit(" id="), e.cast("string"),
      jidu
    )
    when(e % 13 === 0, concat(tstr(e), lit(" short line only"))).otherwise(full)
  }

  /** Deterministic transcripts table derived from `events.parquet` in `dir`. */
  def fromEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val e = col("event_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
    ev.select(
      concat(lit("conv-"), lpad(col("user_id").cast("string"), 8, "0")).as("conv_id"),
      (row_number().over(w) - 1).cast("int").as("turn_idx"),
      expr("CASE event_type WHEN 'click' THEN 'user' WHEN 'view' THEN 'user' " +
        "WHEN 'signup' THEN 'system' WHEN 'purchase' THEN 'assistant' ELSE 'tool' END").as("role"),
      textCol(e, col("user_id"), col("event_type")).as("text"),
      expr("CASE event_type WHEN 'purchase' THEN 'bash' WHEN 'error' THEN 'search' " +
        "WHEN 'click' THEN 'editor' WHEN 'view' THEN 'browser' ELSE '' END").as("tool"),
      col("ts")
    )
  }

  /** Scale-out generator: `nRows` transcript turns, deterministic in `seed`-free
    * integer math (replay-identical across runs and parallelism levels).
    *
    * Skew: conv ids are Zipf-ish — id 0 absorbs `hotFraction` of all rows
    * (a "hot conversation"), the rest spread uniformly over `nConvs`. This is
    * the shape that forces salting/AQE-skew handling at cluster scale.
    */
  def synthesize(spark: SparkSession, nRows: Long, nConvs: Long,
                 hotFraction: Double = 0.2, partitions: Int = 0): DataFrame = {
    val base = if (partitions > 0) spark.range(0L, nRows, 1L, partitions) else spark.range(nRows)
    val e = col("id")
    // hot key: first hotFraction of the hash space → conv 0. The cold-path
    // conv id comes from an INDEPENDENT hash: reusing `hash` would make the
    // hot-gate residue and the conv residue correlated, leaving entire conv
    // classes empty whenever gcd(nConvs, 1000) > 1 (e.g. nConvs=1000 would
    // never produce convs 1..hotFraction·1000)
    val hash = pmod(e * 2654435761L + 123456789L, lit(1000000007L))
    val hash2 = pmod(e * 1103515245L + 987654321L, lit(998244353L))
    val convNum = when(hash % 1000 < (hotFraction * 1000).toLong, lit(0L))
      .otherwise(pmod(hash2, lit(nConvs)))
    val et = expr("CASE CAST(id % 5 AS INT) WHEN 0 THEN 'click' WHEN 1 THEN 'view' " +
      "WHEN 2 THEN 'signup' WHEN 3 THEN 'purchase' ELSE 'error' END")
    base.select(
      concat(lit("conv-"), lpad(convNum.cast("string"), 8, "0")).as("conv_id"),
      // globally unique below 2^30 rows, hence unique per conversation —
      // the real table contract (a % 1000 index collided ~2000× per
      // (conv, turn) pair inside the hot conversation at 64 M rows)
      (e % (1L << 30)).cast("int").as("turn_idx"),
      expr("CASE CAST(id % 5 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'user' " +
        "WHEN 2 THEN 'system' WHEN 3 THEN 'assistant' ELSE 'tool' END").as("role"),
      textCol(e, convNum, et).as("text"),
      expr("CASE CAST(id % 5 AS INT) WHEN 3 THEN 'bash' WHEN 4 THEN 'search' " +
        "WHEN 0 THEN 'editor' WHEN 1 THEN 'browser' ELSE '' END").as("tool"),
      timestamp_seconds(lit(1704067200L) + e % 86400L).as("ts")
    )
  }
}
