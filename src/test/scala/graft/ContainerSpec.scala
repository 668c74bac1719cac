package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{ContainerKernel, ContainerLine}
import graft.operators.Container

/** Container-log decode + partial-join vs the reference
  * (libbeat/reader/readjson/docker_json.go and its reader tests): every
  * docker_json_test.go shape replayed — docker full/partial, CRI with and
  * without flags, joins, stream filtering, drop cases.
  */
class ContainerSpec extends SparkSpec {
  import spark.implicits._

  private def parse(line: String, format: String = "auto",
                    criFlags: Boolean = true): InternalRow =
    ContainerLine(Literal(line), format, criFlags)
      .evalInput(UTF8String.fromString(line))

  private val I = ContainerKernel.schema.fieldNames.zipWithIndex.toMap
  private def str(r: InternalRow, n: String): String =
    if (r.isNullAt(I(n))) null else r.getUTF8String(I(n)).toString
  private def valid(r: InternalRow): Boolean = r.getBoolean(I("valid"))

  private val dockerLine =
    """{"log":"1:M 09 Nov 13:27:36.276 # User requested shutdown...\n","stream":"stdout","time":"2017-11-09T13:27:36.277747246Z"}"""
  private val criLine =
    "2017-09-12T22:32:21.212861448Z stdout F 2017-09-12 22:32:21.212 [INFO][88] table.go 710: Invalidating dataplane cache"

  test("docker JSON line: content keeps its trailing newline, ts is RFC3339") {
    val r = parse(dockerLine)
    assert(valid(r) && str(r, "format") == "docker")
    assert(str(r, "content") == "1:M 09 Nov 13:27:36.276 # User requested shutdown...\n")
    assert(str(r, "stream") == "stdout")
    assert(!r.getBoolean(I("partial"))) // ends with \n → full
    val expect = java.time.OffsetDateTime.parse("2017-11-09T13:27:36.277747246Z")
    assert(r.getLong(I("ts")) ==
      expect.toInstant.getEpochSecond * 1000000L + expect.getNano / 1000L)
  }

  test("docker drop cases: missing time, bad JSON, Go type mismatches") {
    assert(!valid(parse("""{"log":"x\n","stream":"stdout"}"""))) // missing time
    assert(!valid(parse("{this is not JSON nor CRI")))
    assert(!valid(parse("""{"log":123,"stream":"stdout","time":"2017-11-09T13:27:36Z"}""")))
    assert(!valid(parse("""{"log":"x","stream":"stdout","time":"2017-11-09T13:27:36Z","attrs":{"k":1}}""")))
  }

  test("docker attrs decode into the attrs map") {
    val r = parse("""{"log":"x\n","stream":"stdout","time":"2017-11-09T13:27:36Z","attrs":{"a":"1","b":"2"}}""")
    assert(valid(r))
    val m = r.getMap(I("attrs"))
    val got = (0 until m.numElements()).map(i =>
      m.keyArray().getUTF8String(i).toString -> m.valueArray().getUTF8String(i).toString).toMap
    assert(got == Map("a" -> "1", "b" -> "2"))
  }

  test("CRI line with and without flags; wrong CRI dropped") {
    val r = parse(criLine)
    assert(valid(r) && str(r, "format") == "cri")
    assert(str(r, "content") ==
      "2017-09-12 22:32:21.212 [INFO][88] table.go 710: Invalidating dataplane cache")
    assert(str(r, "stream") == "stdout" && !r.getBoolean(I("partial")))
    // no-flags mode: the third field is already content
    val noTags = "2017-09-12T22:32:21.212861448Z stdout 2017-09-12 22:32:21.212 x"
    val r2 = parse(noTags, criFlags = false)
    assert(valid(r2) && str(r2, "content") == "2017-09-12 22:32:21.212 x")
    // with flags ON the third field is READ AS a tag list whatever it is —
    // "2017-09-12" carries no P, so the line parses as a full message whose
    // content starts at the fourth field (same as the reference's machine)
    val r3 = parse(noTags)
    assert(valid(r3) && str(r3, "content") == "22:32:21.212 x" && !r3.getBoolean(I("partial")))
    assert(!valid(parse("2017-09-12T22:32:21.212861448Z stdout"))) // too few fields
  }

  test("CRI partial flag strips the single trailing newline") {
    val p = parse("2017-10-12T13:32:21.232861448Z stdout P partial piece\n")
    assert(valid(p) && p.getBoolean(I("partial")))
    assert(str(p, "content") == "partial piece")
    val pb = parse("2017-10-12T13:32:21.232861448Z stdout P:B piece") // tag list
    assert(pb.getBoolean(I("partial")))
  }

  test("assemble joins partial runs: CRI P+F and docker no-newline+newline") {
    val lines = Seq(
      // file A: CRI partial + full (the reference's "Split lines and remove \n")
      ("a", 0, "2017-10-12T13:32:21.232861448Z stdout P 2017-10-12 13:32:21.212 [INFO][88] table.go 710: Invalidating dataplane cache\n"),
      ("a", 1, "2017-11-12T23:32:21.212771448Z stdout F  error"),
      // file B: docker split log ("Split lines" case)
      ("b", 0, """{"log":"1:M 09 Nov 13:27:36.276 # User requested ","stream":"stdout","time":"2017-11-09T13:27:36.277747246Z"}"""),
      ("b", 1, """{"log":"shutdown...\n","stream":"stdout","time":"2017-11-09T13:27:37.000000000Z"}""")
    ).toDF("f", "n", "line")
    val out = Container.assemble(lines, "f", "n", "line")
      .collect().map(r => r.getAs[String]("f") -> r).toMap
    val a = out("a")
    assert(a.getAs[String]("message") ==
      "2017-10-12 13:32:21.212 [INFO][88] table.go 710: Invalidating dataplane cache error")
    assert(a.getAs[Long]("n_pieces") == 2L)
    // emitted ts/stream = FIRST piece's
    assert(a.getAs[java.sql.Timestamp]("ts").toInstant ==
      java.time.OffsetDateTime.parse("2017-10-12T13:32:21.232861448Z").toInstant
        .truncatedTo(java.time.temporal.ChronoUnit.MICROS))
    val b = out("b")
    assert(b.getAs[String]("message") ==
      "1:M 09 Nov 13:27:36.276 # User requested shutdown...\n")
    assert(b.getAs[java.sql.Timestamp]("ts").toInstant.toString
      .startsWith("2017-11-09T13:27:36"))
  }

  test("assemble: skips bad lines inside a run, drops unterminated tails, filters stream") {
    val lines = Seq(
      ("a", 0, """{"log":"one ","stream":"stdout","time":"2017-11-09T13:27:36Z"}"""),
      ("a", 1, "not parseable at all"), // skipped, join continues
      ("a", 2, """{"log":"two\n","stream":"stdout","time":"2017-11-09T13:27:37Z"}"""),
      ("a", 3, """{"log":"tail without newline","stream":"stdout","time":"2017-11-09T13:27:38Z"}"""),
      ("b", 0, """{"log":"err\n","stream":"stderr","time":"2017-11-09T13:27:36Z"}""")
    ).toDF("f", "n", "line")
    val all = Container.assemble(lines, "f", "n", "line").collect()
    assert(all.length == 2) // a's joined message + b's; a's tail dropped
    val msgs = all.map(r => r.getAs[String]("f") -> r.getAs[String]("message")).toMap
    assert(msgs("a") == "one two\n")
    assert(msgs("b") == "err\n")
    // stream filter tests the LAST piece's stream (reference logLine reuse)
    val stdoutOnly = Container.assemble(lines, "f", "n", "line", stream = "stdout").collect()
    assert(stdoutOnly.map(_.getAs[String]("f")).toSeq == Seq("a"))
  }

  test("assemble with joinPartial=false emits every line alone") {
    val lines = Seq(
      ("a", 0, """{"log":"1:M 09 Nov 13:27:36.276 # User requested ","stream":"stdout","time":"2017-11-09T13:27:36.277747246Z"}"""),
      ("a", 1, """{"log":"shutdown...\n","stream":"stdout","time":"2017-11-09T13:27:36.277747246Z"}""")
    ).toDF("f", "n", "line")
    val out = Container.assemble(lines, "f", "n", "line", joinPartial = false)
      .collect().sortBy(_.getAs[Int]("first_n"))
    // with partial disabled a partial line stands alone ("Split lines with
    // partial disabled" reference case) — and full-line filtering by the
    // partial flag does not apply (every line is its own message)
    assert(out.length == 2)
    assert(out(0).getAs[String]("message") == "1:M 09 Nov 13:27:36.276 # User requested ")
    assert(out(1).getAs[String]("message") == "shutdown...\n")
  }
}
