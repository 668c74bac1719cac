package graft

import org.apache.spark.sql.functions._

import graft.functions.ForkParsers

class ForkParsersSpec extends SparkSpec {
  import spark.implicits._

  test("filebeat_log_parse: 4 tab-terms extracted, level uppercased") {
    val df = Seq("2024-01-02T03:04:05\tinfo\thost-1\tstarted crawler\twith tabs")
      .toDF("msg").select(ForkParsers.filebeat_log_parse(col("msg")).as("p"))
    val r = df.select("p.*").collect()(0)
    assert(r.getString(0) == "2024-01-02T03:04:05")
    assert(r.getString(1) == "INFO")
    assert(r.getString(2) == "host-1")
    // SplitN limit 4: the rest (including further tabs) stays in message
    assert(r.getString(3) == "started crawler\twith tabs")
  }

  test("filebeat_log_parse: fewer than 4 terms → null struct (malformed)") {
    val df = Seq("no tabs here", "one\ttab\tonly").toDF("msg")
      .select(ForkParsers.filebeat_log_parse(col("msg")).as("p"))
    assert(df.filter(col("p").isNotNull).count() == 0)
  }

  test("trace2trace: full extraction on a well-formed line") {
    val msg = "2024-01-02 03:04:05.678 123 456 E mytag: ##MSG## [tr1] [sp2] [pa3] [wifi] [user9] payload body ##MSG##"
    val path = "/logs/dir/file_7.bin@ecu1@vid42@typeA@2024-01-01@2024-01-02"
    val r = Seq((msg, path)).toDF("msg", "path")
      .select(ForkParsers.trace2trace_parse(col("msg"), col("path")).as("p"))
      .select("p.*").collect()(0)
    assert(r.getAs[String]("x-header_filename") == "file_7")
    assert(r.getAs[String]("x-header_ecu") == "ecu1")
    assert(r.getAs[String]("x-header_vid") == "vid42")
    assert(r.getAs[String]("x-header_uploaded_at") == "2024-01-02")
    assert(r.getAs[String]("time") == "2024-01-02 03:04:05.678")
    assert(r.getAs[Long]("pid") == 123L)
    assert(r.getAs[Long]("tid") == 456L)
    assert(r.getAs[String]("level") == "ERROR") // E → LevelMap
    assert(r.getAs[String]("tag") == "mytag")
    assert(r.getAs[String]("trace_id") == "tr1")
    assert(r.getAs[String]("span_id") == "sp2")
    assert(r.getAs[String]("parent_span_id") == "pa3")
    assert(r.getAs[String]("network") == "wifi")
    assert(r.getAs[String]("user_id") == "user9")
    // message = between match end and the LAST ##MSG##
    assert(r.getAs[String]("message") == "payload body ")
  }

  test("trace2trace: no trailing marker → message runs to end of line") {
    val msg = "2024-01-02 03:04:05.678 1 2 W t: ##MSG## [a] [b] [c] [d] [e] tail text"
    val r = Seq((msg, "x@1@2@3@4@5")).toDF("msg", "path")
      .select(ForkParsers.trace2trace_parse(col("msg"), col("path")).as("p"))
      .select("p.*").collect()(0)
    assert(r.getAs[String]("message") == "tail text")
    assert(r.getAs[String]("level") == "WARN")
  }

  test("trace2trace: empty trace id withholds fields, keeps message (parser.go:131)") {
    val msg = "2024-01-02 03:04:05.678 1 2 I t: ##MSG## [] [b] [c] [d] [e] tail"
    val r = Seq((msg, "x@1@2@3@4@5")).toDF("msg", "path")
      .select(ForkParsers.trace2trace_parse(col("msg"), col("path")).as("p"))
      .select("p.*").collect()(0)
    assert(r.getAs[String]("trace_id") == null)
    assert(r.getAs[String]("level") == null)
    assert(r.getAs[String]("message") == msg) // original preserved
  }

  test("trace2trace: unknown level letter passes through raw") {
    val msg = "2024-01-02 03:04:05.678 1 2 Q t: ##MSG## [a] [b] [c] [d] [e] x"
    val r = Seq((msg, "p@1@2@3@4@5")).toDF("msg", "path")
      .select(ForkParsers.trace2trace_parse(col("msg"), col("path")).as("p"))
      .select("p.*").collect()(0)
    assert(r.getAs[String]("level") == "Q")
  }

  test("trace2trace: malformed path (≠6 @-parts) → null headers, parse continues") {
    val msg = "2024-01-02 03:04:05.678 1 2 D t: ##MSG## [a] [b] [c] [d] [e] x"
    val r = Seq((msg, "no-at-signs")).toDF("msg", "path")
      .select(ForkParsers.trace2trace_parse(col("msg"), col("path")).as("p"))
      .select("p.*").collect()(0)
    assert(r.getAs[String]("x-header_ecu") == null)
    assert(r.getAs[String]("level") == "DEBUG")
  }

  test("trace2trace: non-numeric pid would be 0 (ParseInt error path)") {
    // \d+ makes non-numeric unreachable via regex; the coalesce(cast) guard
    // mirrors parser.go:128-136 for defense in depth — overflow → 0
    val msg = "2024-01-02 03:04:05.678 99999999999999999999999 2 V t: ##MSG## [a] [b] [c] [d] [e] x"
    val r = Seq((msg, "p@1@2@3@4@5")).toDF("msg", "path")
      .select(ForkParsers.trace2trace_parse(col("msg"), col("path")).as("p"))
      .select("p.*").collect()(0)
    assert(r.getAs[Long]("pid") == 0L)
    assert(r.getAs[String]("level") == "VERBOSE")
  }
}
