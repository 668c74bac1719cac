package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CefKernel, DecodeCef}

/** decode_cef vs the reference's CEF codec
  * (x-pack/filebeat/processors/decode_cef/cef): every message of the
  * reference's test corpus (cef_test.go testMessages) replayed with the
  * processor's semantics (full extension names + type validation drops).
  */
class CefSpec extends SparkSpec {

  private def parse(line: String): InternalRow =
    DecodeCef(Literal(line)).evalInput(UTF8String.fromString(line))

  private val I = CefKernel.schema.fieldNames.zipWithIndex.toMap

  private def str(r: InternalRow, name: String): String = {
    val i = I(name)
    if (r.isNullAt(i)) null else r.getUTF8String(i).toString
  }
  private def ext(r: InternalRow): Map[String, String] = {
    if (r.isNullAt(I("extensions"))) return Map.empty
    val m = r.getMap(I("extensions"))
    (0 until m.numElements()).map { i =>
      m.keyArray().getUTF8String(i).toString ->
        m.valueArray().getUTF8String(i).toString
    }.toMap
  }
  private def errs(r: InternalRow): Seq[String] = {
    if (r.isNullAt(I("errors"))) return Nil
    val a = r.getArray(I("errors"))
    (0 until a.numElements()).map(a.getUTF8String(_).toString)
  }
  private def header(r: InternalRow): (Int, String, String, String, String, String, String) =
    (r.getInt(0), str(r, "device_vendor"), str(r, "device_product"),
      str(r, "device_version"), str(r, "device_event_class_id"),
      str(r, "name"), str(r, "severity"))

  private val stdHeader =
    (26, "security", "threatmanager", "1.0", "100", "trojan successfully stopped", "10")

  test("standardMessage: full extension names + types") {
    val r = parse("""CEF:26|security|threatmanager|1.0|100|trojan successfully stopped|10|src=10.0.0.192 dst=12.121.122.82 spt=1232 eventId=1""")
    assert(header(r) == stdHeader)
    assert(ext(r) == Map("sourceAddress" -> "10.0.0.192",
      "destinationAddress" -> "12.121.122.82", "sourcePort" -> "1232",
      "eventId" -> "1"))
    assert(errs(r).isEmpty)
  }

  test("headerOnly: no extensions, no error") {
    val r = parse("""CEF:26|security|threatmanager|1.0|100|trojan successfully stopped|10|""")
    assert(header(r) == stdHeader)
    assert(ext(r).isEmpty && errs(r).isEmpty)
  }

  test("header followed ONLY by spaces: grammar is inside `extensions` — error") {
    // `cef = header extensions?` but `extensions` needs ≥1 pair once a space
    // is consumed: the ragel machine ends non-final → error recorded
    val r = parse("CEF:26|security|threatmanager|1.0|100|trojan successfully stopped|10| ")
    assert(header(r) == stdHeader)
    assert(ext(r).isEmpty)
    assert(errs(r).exists(_.contains("unexpected end of CEF event")), errs(r))
  }

  test("emptyDeviceFields: empty header fields → null") {
    val r = parse("""CEF:0|||1.0|100|trojan successfully stopped|10|src=10.0.0.192 dst=12.121.122.82 spt=1232""")
    assert(r.getInt(0) == 0)
    assert(str(r, "device_vendor") == null && str(r, "device_product") == null)
    assert(str(r, "device_version") == "1.0")
    assert(ext(r) == Map("sourceAddress" -> "10.0.0.192",
      "destinationAddress" -> "12.121.122.82", "sourcePort" -> "1232"))
  }

  test("escaped pipe and equals sign in header") {
    val r = parse("""CEF:26|security|threat\|->manager|1.0|100|trojan successfully stopped|10|src=10.0.0.192""")
    assert(str(r, "device_product") == "threat|->manager")
    val r2 = parse("""CEF:26|security|threat=manager|1.0|100|trojan successfully stopped|10|src=10.0.0.192""")
    assert(str(r2, "device_product") == "threat=manager")
  }

  test("emptyExtensionValue: dst= fails IP validation and is dropped") {
    val r = parse("""CEF:26|security|threatmanager|1.0|100|trojan successfully stopped|10|src=10.0.0.192 dst= spt=1232""")
    assert(ext(r) == Map("sourceAddress" -> "10.0.0.192", "sourcePort" -> "1232"))
    assert(errs(r).exists(_.contains("dst")))
  }

  test("leadingWhitespace before first extension") {
    val r = parse("""CEF:0|security|threatmanager|1.0|100|trojan successfully stopped|10| src=10.0.0.192 dst=12.121.122.82 spt=1232""")
    assert(ext(r) == Map("sourceAddress" -> "10.0.0.192",
      "destinationAddress" -> "12.121.122.82", "sourcePort" -> "1232"))
    assert(errs(r).isEmpty)
  }

  test("escapedPipeInExtension: \\| is not a valid value escape → malformed") {
    val r = parse("""CEF:0|security|threatmanager|1.0|100|trojan successfully stopped|10|moo=this\|has an escaped pipe""")
    assert(ext(r).isEmpty)
    assert(errs(r).exists(e => e.contains("malformed value for moo")))
  }

  test("pipeInMessage: unescaped pipe is a plain value char") {
    val r = parse("""CEF:0|security|threatmanager|1.0|100|trojan successfully stopped|10|moo=this|has an pipe""")
    assert(ext(r) == Map("moo" -> "this|has an pipe"))
    assert(errs(r).isEmpty)
  }

  test("equalsInMessage: unescaped equals kills the extension") {
    val r = parse("""CEF:0|security|threatmanager|1.0|100|trojan successfully stopped|10|moo=this =has = equals\=""")
    assert(ext(r).isEmpty)
    assert(errs(r).nonEmpty)
  }

  test("escapesInExtension: \\= and \\\\ unescaped") {
    val r = parse("""CEF:0|security|threatmanager|1.0|100|trojan successfully stopped|10|msg=a+b\=c x=c\\d\=z""")
    assert(ext(r) == Map("message" -> "a+b=c", "x" -> """c\d=z"""))
    assert(errs(r).isEmpty)
  }

  test("malformedExtensionEscape: recovery resumes at the next ` key=`") {
    val r = parse("""CEF:0|FooBar|Web Gateway|1.2.3.45.67|200|Success|2|rt=Sep 07 2018 14:50:39 cat=Access Log dst=1.1.1.1 dhost=foo.example.com suser=redacted src=2.2.2.2 requestMethod=POST request='https://foo.example.com/bar/bingo/1' requestClientApplication='Foo-Bar/2018.1.7; =Email:user@example.com; Guid:test=' cs1= cs1Label=Foo Bar""")
    assert(header(r) == (0, "FooBar", "Web Gateway", "1.2.3.45.67", "200", "Success", "2"))
    assert(ext(r) == Map(
      "deviceReceiptTime" -> "Sep 07 2018 14:50:39",
      "deviceEventCategory" -> "Access Log",
      "destinationAddress" -> "1.1.1.1",
      "destinationHostName" -> "foo.example.com",
      "sourceUserName" -> "redacted",
      "sourceAddress" -> "2.2.2.2",
      "requestMethod" -> "POST",
      "requestUrl" -> "'https://foo.example.com/bar/bingo/1'",
      "deviceCustomString1" -> "",
      "deviceCustomString1Label" -> "Foo Bar"))
    assert(errs(r).exists(_.contains("requestClientApplication")))
  }

  test("multipleMalformedExtensionValues: each malformed key dropped") {
    val r = parse("""CEF:0|vendor|product|version|event_id|name|Very-High| msg=Hello World error=Failed because id==old_id user=root angle=106.7<=180""")
    assert(str(r, "severity") == "Very-High")
    assert(ext(r) == Map("message" -> "Hello World",
      "error" -> "Failed because", "user" -> "root"))
    assert(errs(r).exists(_.contains("id")) && errs(r).exists(_.contains("angle")))
  }

  test("empty extension value on an unmapped key survives") {
    val r = parse("CEF:0|||||||a=")
    assert(ext(r) == Map("a" -> ""))
    assert(errs(r).isEmpty)
    assert(str(r, "severity") == null)
  }

  test("padded: non-final values keep extra trailing spaces (minus one)") {
    val r = parse("CEF:0|security|threatmanager|1.0|100|message is padded|10|spt=1232 msg=Trailing space in non-final extensions is  preserved    src=10.0.0.192 ")
    assert(ext(r) == Map("sourcePort" -> "1232",
      "message" -> "Trailing space in non-final extensions is  preserved   ",
      "sourceAddress" -> "10.0.0.192"))
  }

  test("crlf: final value trailing whitespace (tab/cr/lf) trimmed") {
    val r = parse("CEF:0|security|threatmanager|1.0|100|message is padded|10|spt=1232 msg=Trailing space in final extensions is not preserved\t \r\n")
    assert(ext(r) == Map("sourcePort" -> "1232",
      "message" -> "Trailing space in final extensions is not preserved"))
  }

  test("tabs/control chars inside values are preserved") {
    val r = parse("CEF:0|security|threatmanager|1.0|100|message is padded|10|spt=1232 msg=Tabs\tand\rcontrol\ncharacters are preserved\t src=127.0.0.1")
    assert(ext(r) == Map("sourcePort" -> "1232",
      "message" -> "Tabs\tand\rcontrol\ncharacters are preserved\t",
      "sourceAddress" -> "127.0.0.1"))
  }

  test("tab is not a separator") {
    val r = parse("CEF:0|security|threatmanager|1.0|100|message has tabs|10|spt=1232 msg=Tab is not a separator\tsrc=127.0.0.1")
    assert(ext(r) == Map("sourcePort" -> "1232"))
    assert(errs(r).exists(_.contains("malformed value for msg")))
  }

  test("escapes are replaced (header and value)") {
    val r = parse("""CEF:0|security\\compliance|threat\|->manager|1.0|100|message contains escapes|10|spt=1232 msg=Newlines in messages\nare allowed.\r\nAnd so are carriage feeds\\newlines\\\=.""")
    assert(str(r, "device_vendor") == """security\compliance""")
    assert(str(r, "device_product") == "threat|->manager")
    assert(ext(r) == Map("sourcePort" -> "1232",
      "message" -> "Newlines in messages\nare allowed.\r\nAnd so are carriage feeds\\newlines\\=."))
  }

  test("error recovery with escape (beats issue 30010 shape)") {
    val r = parse("""CEF:0|||||||key1=\\hi= key2=a""")
    assert(ext(r) == Map("key2" -> "a"))
    assert(errs(r).nonEmpty)
  }

  test("no CEF header → null; leading junk before CEF: ignored") {
    assert(parse("not a cef line") == null)
    assert(parse("CEF:x|a|b") == null)
    val r = parse("2024-01-01 junk CEF:0|v|p|1|id|n|5|src=1.2.3.4")
    assert(r != null && str(r, "device_vendor") == "v")
    assert(ext(r) == Map("sourceAddress" -> "1.2.3.4"))
  }

  test("truncated header keeps completed fields + records the error") {
    val r = parse("CEF:26|security|threatmanager|1.0")
    assert(r.getInt(0) == 26)
    assert(str(r, "device_vendor") == "security")
    assert(str(r, "device_product") == "threatmanager")
    assert(str(r, "device_version") == null) // not completed by a pipe
    assert(errs(r).exists(_.contains("unexpected end")))
    // invalid escape inside a header field
    val r2 = parse("""CEF:26|security|bad\escape|1.0|100|n|5|""")
    assert(str(r2, "device_vendor") == "security")
    assert(str(r2, "device_product") == null)
    assert(errs(r2).exists(_.contains("error in CEF event at pos")))
  }

  test("type validation: int/long/float/bool/mac/timestamp") {
    import graft.functions.CefKernel._
    assert(validGoInt("1232", 32) && validGoInt("-5", 32) && validGoInt("0x1A", 32))
    assert(!validGoInt("2147483648", 32) && validGoInt("2147483648", 64))
    assert(!validGoInt("08", 64) && !validGoInt("", 64) && !validGoInt("1.5", 64))
    assert(validGoFloat("106.7") && validGoFloat("-1e3") && !validGoFloat("106.7<"))
    assert(validGoBool("true") && validGoBool("0") && !validGoBool("yes"))
    assert(validMac("00:0D:60:AF:1B:61") && validMac("000D60AF1B61") &&
      validMac("0050.5600.1234") && !validMac("00:0D:60"))
    assert(validTimestamp("Sep 07 2018 14:50:39"))
    assert(validTimestamp("Jan  2 15:04:05.000 MST"))
    assert(validTimestamp("Jun 12 2021 14:50:39 +0200"))
    assert(validTimestamp("1622562624000"))
    assert(!validTimestamp("tomorrow"))
    assert(!validTimestamp("Sep 77 2018 14:50:39"))
  }

  test("DataFrame round-trip (codegen path)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      "CEF:26|security|threatmanager|1.0|100|trojan successfully stopped|10|src=10.0.0.192 spt=1232",
      "no cef here"
    ).toDF("line").withColumn("c", graft.functions.decode_cef(col("line")))
    val rows = df.select($"c.version", $"c.name",
      element_at($"c.extensions", "sourceAddress").as("src")).collect()
    assert(rows(0).getInt(0) == 26 && rows(0).getString(2) == "10.0.0.192")
    assert(rows(1).isNullAt(0))
  }
}
