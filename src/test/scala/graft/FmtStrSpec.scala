package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.route.{Cond, FieldEquals, FmtStr}

/** fmtstr format strings + the outil selector tree
  * (common/fmtstr/formatevents.go, outputs/outil/select.go). */
class FmtStrSpec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2024-03-05 10:20:30")
  private lazy val df = Seq(
    ("svc-a", "ok", ts),
    (null.asInstanceOf[String], "short", ts),
    ("", "bad_service", ts)
  ).toDF("service", "status", "ts")

  test("tokenizer: literals, fields, nested paths, defaults, timestamps") {
    import FmtStr._
    assert(tokenize("plain") == Seq(Lit("plain")))
    assert(tokenize("%{[a]}") == Seq(Field("a", None)))
    assert(tokenize("%{[a][b]}") == Seq(Field("a.b", None)))
    assert(tokenize("x-%{[a]:dflt}-y") ==
      Seq(Lit("x-"), Field("a", Some("dflt")), Lit("-y")))
    assert(tokenize("%{+yyyy.MM.dd}") == Seq(Ts("yyyy.MM.dd")))
    intercept[IllegalArgumentException] { tokenize("%{[a]") }       // unbalanced
    intercept[IllegalArgumentException] { tokenize("%{}") }         // empty expr
    intercept[IllegalArgumentException] { tokenize("%{unsupported}") }
    intercept[IllegalArgumentException] { tokenize("%{+QQQQ!bad}") }
  }

  test("format: field + date math; missing required field → null (error)") {
    val out = df.select(FmtStr.compile("%{[service]}-%{+yyyy.MM.dd}").as("s"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(out == Seq("svc-a-2024.03.05", null, "-2024.03.05"))
  }

  test("format: default fills missing AND empty values (formatevents.go:370-377)") {
    val out = df.select(FmtStr.compile("%{[service]:none}").as("s"))
      .as[String].collect().toSeq
    assert(out == Seq("svc-a", "none", "none"))
  }

  test("selector: first non-empty rule wins; when-gating; fallback") {
    val sel = FmtStr.EventSelector(
      rules = Seq(
        FmtStr.Rule("%{[service]}", when = Some(FieldEquals("status", "ok"))),
        FmtStr.Rule("st-%{[status]}")),
      fallback = "never")
    val out = df.select(sel.column().as("s")).as[String].collect().toSeq
    assert(out == Seq("svc-a", "st-short", "st-bad_service"))
  }

  test("selector: mapping table with default fallback (LookupSelectorExpr)") {
    val sel = FmtStr.EventSelector(
      rules = Seq(FmtStr.Rule("%{[status]}", default = "other",
        mappings = Map("ok" -> "index-live", "short" -> "index-dead"))),
      fallback = "")
    val out = df.select(sel.column().as("s")).as[String].collect().toSeq
    assert(out == Seq("index-live", "index-dead", "other"))
  }

  test("codecs: json round-trips through from_json; format renders fmtstr lines") {
    import graft.route.Codecs
    val src = df.na.fill("?", Seq("service"))
    val js = Codecs.json(src, cols = Seq("service", "status")).as[String].collect()
    assert(js.forall(_.startsWith("{")))
    assert(js(0).contains("\"service\":\"svc-a\"") && js(0).contains("\"status\":\"ok\""))
    val lines = Codecs.format(df, "%{[status]}@%{+yyyy.MM.dd}").as[String].collect()
    assert(lines.toSeq == Seq("ok@2024.03.05", "short@2024.03.05", "bad_service@2024.03.05"))
    // a null-rendering event is DROPPED (reference encode-error path), so a
    // newline-framed sink never emits a phantom empty record
    val nulled = Codecs.format(
      df.withColumn("service", lit(null).cast("string")),
      "%{[service]}@%{[status]}").as[String].collect()
    assert(nulled.isEmpty, s"null renders must drop the event: ${nulled.toSeq}")
  }

  test("selector: lowercase + empty-selector returns empty string (Select contract)") {
    val sel = FmtStr.EventSelector(rules = Nil, fallback = "", lowercase = true)
    val out = df.select(sel.column().as("s")).as[String].collect().toSeq
    assert(out == Seq("", "", ""))
    val selLc = FmtStr.EventSelector(
      rules = Seq(FmtStr.Rule("UP-%{[status]}")), lowercase = true)
    val lc = df.select(selLc.column().as("s")).as[String].head()
    assert(lc == "up-ok")
  }
}
