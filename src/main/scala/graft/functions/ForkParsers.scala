package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The two remaining weiwen12 fork parsers (SURVEY §2.4), re-expressed as
  * declarative column compositions — no custom kernel needed: one is a
  * bounded SplitN and the other rides [[GrokStruct]]'s one-pass regex.
  */
object ForkParsers {

  /** parse_filebeat_log (libbeat/processors/parse_filebeat_log/parser.go:64-120):
    * `SplitN(message, "\t", 4)` → exactly 4 terms or malformed (null struct ≈
    * ignore_malformed pass-through); level upper-cased. */
  def filebeat_log_parse(msg: Column): Column = {
    val terms = split(msg, "\t", 4)
    when(size(terms) === 4, struct(
      element_at(terms, 1).as("time"),
      upper(element_at(terms, 2)).as("level"),
      element_at(terms, 3).as("hostname"),
      element_at(terms, 4).as("message")))
  }

  /** the fork's anchored trace pattern (parse_vehicle_trace2trace/parser.go:37).
    * RE2-safe and Java-safe: \w, \s, `.` have identical ASCII semantics. */
  val Trace2TracePattern: String =
    "^(\\d{4}\\-\\d{2}\\-\\d{2}\\s\\d{2}:\\d{2}:\\d{2}\\.\\d{3})\\s+(\\d+)\\s+(\\d+)\\s+" +
      "([a-zA-Z]+)\\s+(.*):\\s*##MSG##\\s*\\[(\\w*)\\]\\s*\\[(\\w*)\\]\\s*\\[(\\w*)\\]\\s*" +
      "\\[([^\\[\\]]*)\\]\\s*\\[([^\\[\\]]*)\\]\\s+"

  /** parse_vehicle_trace2trace (parser.go:75-165): `log.file.path` split on
    * `@` into six `x-header_*` fields (filename between last '/' and last
    * '.'), plus the anchored-regex extraction over `message` — fields emitted
    * only when the pattern matches AND trace_id is non-empty (parser.go:131);
    * `message` is rewritten to the slice between the match end and the last
    * `##MSG##` marker (parser.go:151-155). pid/tid parse errors → 0; level
    * letter translated via the shared LevelMap with raw passthrough
    * (parse_common/parser.go:34-42). */
  def trace2trace_parse(msg: Column, path: Column): Column = {
    val items = split(path, "@")
    val f = element_at(items, 1)
    val base = substring_index(f, "/", -1)
    val fname = base.substr(lit(1),
      length(base) - length(substring_index(base, ".", -1)) - 1)
    val headers = when(size(items) === 6, struct(
      fname.as("filename"),
      element_at(items, 2).as("ecu"),
      element_at(items, 3).as("vid"),
      element_at(items, 4).as("log_type"),
      element_at(items, 5).as("created_at"),
      element_at(items, 6).as("uploaded_at")))

    val g = grok_struct(msg, Trace2TracePattern,
      Seq("time", "pid", "tid", "lvl", "tag", "trace", "span", "parent", "network", "user"))
    val matched = g.isNotNull && g.getField("trace") =!= ""

    // message slice: msg[len(match) ..] trimmed at the LAST ##MSG## when that
    // marker sits beyond the match (parser.go:151-155)
    val matchLen = length(g.getField("_match"))
    val revPos = locate("##GSM##", reverse(msg)) // reverse("##MSG##")
    val lastIdx = when(revPos > 0, length(msg) - revPos - 6).otherwise(-1)
    val sliced = when(lastIdx > matchLen,
      msg.substr(matchLen + 1, lastIdx - matchLen))
      .otherwise(msg.substr(matchLen + 1, length(msg)))

    struct(
      headers.getField("filename").as("x-header_filename"),
      headers.getField("ecu").as("x-header_ecu"),
      headers.getField("vid").as("x-header_vid"),
      headers.getField("log_type").as("x-header_log_type"),
      headers.getField("created_at").as("x-header_created_at"),
      headers.getField("uploaded_at").as("x-header_uploaded_at"),
      when(matched, g.getField("time")).as("time"),
      when(matched, coalesce(g.getField("pid").try_cast("long"), lit(0L))).as("pid"),
      when(matched, coalesce(g.getField("tid").try_cast("long"), lit(0L))).as("tid"),
      when(matched, level_translate(g.getField("lvl"))).as("level"),
      when(matched, g.getField("tag")).as("tag"),
      when(matched, g.getField("trace")).as("trace_id"),
      when(matched, g.getField("span")).as("span_id"),
      when(matched, g.getField("parent")).as("parent_span_id"),
      when(matched, g.getField("network")).as("network"),
      when(matched, g.getField("user")).as("user_id"),
      when(matched, sliced).otherwise(msg).as("message"))
  }
}
