package graft

import org.apache.spark.sql.functions._

/** The reused-UnsafeRow parse expressions (dissect/grok/serverlog) return a
  * per-thread buffer that is REWRITTEN on the next row — the projection-
  * output contract. These tests pin that Spark's buffering consumers
  * (max/min/first/last/collect_list over the struct, in BOTH codegen and
  * interpreted modes) copy the value before retaining it, so the contract
  * is safe for aggregate use — the empirical refutation of the "retained
  * reference corrupts aggregates" concern. */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  test("max over dissect struct, interpreted fallback") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val df = Seq("a 1", "z 9", "m 5").toDF("t")
        .select(graft.functions.dissect(col("t"), "%{w} %{n}").as("d"))
      val viaMax = df.agg(max("d"), min("d")).collect()(0).toString
      assert(viaMax.contains("z") && viaMax.contains("a"), s"corrupted: $viaMax")
      val df2 = Seq(("k", "evt=aa id=1"), ("k", "evt=zz id=9")).toDF("k", "t")
        .select(col("k"), graft.functions.grok_struct(col("t"),
          "evt=(\\w+) id=(\\d+)", Seq("evt", "id")).as("g"))
      val r = df2.groupBy("k").agg(first("g"), last("g")).collect()(0)
      assert(r.toString.contains("aa") && r.toString.contains("zz"), r.toString)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("max over dissect struct") {
    val df = Seq("a 1", "z 9", "m 5").toDF("t")
      .select(graft.functions.dissect(col("t"), "%{w} %{n}").as("d"))
    val viaMax = df.agg(max("d")).collect()(0).toString
    assert(viaMax.contains("z"), s"max corrupted: $viaMax")
  }

  test("first over grok struct with groupBy") {
    val df = Seq(("k", "evt=aa id=1"), ("k", "evt=zz id=9")).toDF("k", "t")
      .select(col("k"), graft.functions.grok_struct(col("t"),
        "evt=(\\w+) id=(\\d+)", Seq("evt", "id")).as("g"))
    val r = df.groupBy("k").agg(first("g"), last("g")).collect()(0)
    assert(r.toString.contains("aa") && r.toString.contains("zz"), r.toString)
  }

  test("collect_list over serverlog struct") {
    val lines = Seq(
      "2024-01-01 00:00:00.000 svc-a host-1 info [t-1] C m [1] [t00000001] [s1] evt=a id=1",
      "2024-01-01 00:00:00.000 svc-b host-2 warn [t-2] D n [2] [t00000002] [s2] evt=b id=2")
    val df = lines.toDF("t").select(graft.functions.serverlog_parse(col("t")).as("p"))
    val got = df.agg(collect_list("p.service")).collect()(0).toString
    assert(got.contains("svc-a") && got.contains("svc-b"), got)
    val whole = df.agg(collect_list("p")).collect()(0).toString
    assert(whole.contains("svc-a") && whole.contains("svc-b"), s"whole-struct: $whole")
  }
}
