package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import graft.functions._

/** Golden corpus for the dissect tokenizer — same case SHAPE as the
  * reference's dissect_tests.json (name/tok/msg/expected/fail), cases
  * authored fresh for our pattern subset. */
class DissectSpec extends SparkSpec {
  import spark.implicits._

  private def run(pattern: String, msg: String): Row = {
    val df = Seq(msg).toDF("t").select(dissect(col("t"), pattern).as("d"))
    df.collect()(0)
  }
  private def fields(pattern: String, msg: String): Row =
    run(pattern, msg).getStruct(0)

  test("simple space-delimited capture") {
    val r = fields("%{a} %{b} %{c}", "one two three")
    assert(r.getAs[String]("a") == "one")
    assert(r.getAs[String]("b") == "two")
    assert(r.getAs[String]("c") == "three")
  }

  test("literal prefix and mixed delimiters") {
    val r = fields("lvl=%{level} [%{thread}] msg=%{msg}", "lvl=INFO [t-1] msg=hello world")
    assert(r.getAs[String]("level") == "INFO")
    assert(r.getAs[String]("thread") == "t-1")
    assert(r.getAs[String]("msg") == "hello world") // last field takes rest
  }

  test("skip fields %{} and %{?name} are not emitted") {
    val r = fields("%{} %{?skipme} %{keep}", "a b c")
    assert(r.schema.fieldNames.toSeq == Seq("keep"))
    assert(r.getAs[String]("keep") == "c")
  }

  test("append %{+key} joins with the intervening delimiter") {
    val r = fields("%{+date} %{+date} %{rest}", "2024-01-01 00:00:00 x")
    assert(r.getAs[String]("date") == "2024-01-01 00:00:00")
    assert(r.getAs[String]("rest") == "x")
  }

  test("append with explicit order %{+key/n} (join = appended part's previous delim, default ' ')") {
    val r = fields("%{+name/2}-%{+name/1}", "world-hello")
    // part ordered 1 applies first ("hello"); part ordered 2 ("world") has no
    // preceding delimiter in the pattern → default " " join (field.go:230-235)
    assert(r.getAs[String]("name") == "hello world")
  }

  test("greedy %{key->} consumes repeated delimiters") {
    val r = fields("%{a->} %{b}", "one     two")
    assert(r.getAs[String]("a") == "one")
    assert(r.getAs[String]("b") == "two")
  }

  test("type conversion %{key|int} / long / double / boolean") {
    val r = fields("%{n|integer} %{l|long} %{d|double} %{b|boolean}", "7 99 2.5 true")
    assert(r.getAs[Int]("n") == 7)
    assert(r.getAs[Long]("l") == 99L)
    assert(r.getAs[Double]("d") == 2.5)
    assert(r.getAs[Boolean]("b"))
  }

  test("unparseable typed value → null field, row survives") {
    val r = fields("%{n|integer} %{rest}", "abc def")
    assert(r.isNullAt(r.fieldIndex("n")))
    assert(r.getAs[String]("rest") == "def")
  }

  test("delimiter miss → null struct (dissect_parsing_error analogue)") {
    assert(run("%{a}:%{b}", "no colon here").isNullAt(0))
  }

  test("prefix miss → null struct") {
    assert(run("LOG %{a}", "NOT a log").isNullAt(0))
  }

  test("malformed pattern fails at plan time") {
    intercept[IllegalArgumentException] { Dissect.compile("%{a}%{b}") }
    intercept[IllegalArgumentException] { Dissect.compile("%{a") }
  }
}
