package graft

import org.apache.spark.sql.functions.{col, posexplode}

import graft.functions.FramingKernel

/** RFC6587 / custom-delimiter TCP frame splitting vs the reference
  * (filebeat/inputsource/common/streaming/scan.go): both SplitFunc test
  * tables in scan_test.go are parsed from the reference tree at test time
  * and replayed through [[FramingKernel]], plus the scanner edge semantics
  * (Atoi abort, incomplete-octet drop, 1-byte tail, zero-count frame).
  */
class FramingSpec extends SparkSpec {
  import spark.implicits._

  private def frames(s: String, delim: String = "\n",
                     rfc6587: Boolean = true): Seq[String] =
    FramingKernel.frames(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      delim.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      rfc6587).map(_.toString).toSeq

  // ---- the reference scan_test.go tables ---------------------------------

  private val goPath =
    "/root/reference/filebeat/inputsource/common/streaming/scan_test.go"

  private def goUnescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n'  => sb += '\n'; i += 2
          case 't'  => sb += '\t'; i += 2
          case 'r'  => sb += '\r'; i += 2
          case o    => sb += o; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private case class GoCase(name: String, input: String,
                            expected: Seq[String], delimiter: String)

  private def loadCases(src: String): Seq[GoCase] = {
    val entry = ("""(?s)\{\s*name:\s*"((?:\\.|[^"\\])*)",\s*""" +
      """(?:text|input):\s*"((?:\\.|[^"\\])*)",\s*""" +
      """expected:\s*\[\]string(?:\(nil\)|\{(.*?)\})\s*,\s*""" +
      """delimiter:\s*\[\]byte\("((?:\\.|[^"\\])*)"\)""").r
    val lit = """"((?:\\.|[^"\\])*)"""".r
    entry.findAllMatchIn(src).map { m =>
      val exp = Option(m.group(3)).toSeq.flatMap(body =>
        lit.findAllMatchIn(body).map(x => goUnescape(x.group(1))).toSeq)
      GoCase(goUnescape(m.group(1)), goUnescape(m.group(2)), exp,
        goUnescape(m.group(4)))
    }.toSeq
  }

  private lazy val (delimCases, octetCases) = {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(goPath)), java.nio.charset.StandardCharsets.UTF_8)
    val split = src.indexOf("func TestOctetCounting")
    assert(split > 0, "scan_test.go shape changed")
    (loadCases(src.substring(0, split)), loadCases(src.substring(split)))
  }

  test("reference TestCustomDelimiter table replays (delimiter mode)") {
    assert(delimCases.size >= 6)
    for (c <- delimCases)
      assert(frames(c.input, c.delimiter, rfc6587 = false) == c.expected,
        s"case '${c.name}'")
  }

  test("reference TestOctetCounting table replays (rfc6587 mode)") {
    assert(octetCases.size >= 5)
    for (c <- octetCases)
      assert(frames(c.input, c.delimiter) == c.expected, s"case '${c.name}'")
  }

  // ---- scanner edge semantics (scan.go:51-90 + bufio.Scanner contract) ---

  test("octet count token that is not a valid int aborts, keeping prior frames") {
    // "1a" is digit-leading but Atoi fails → the reference Scanner errors out
    assert(frames("5 hello1a b rest") == Seq("hello"))
    // 19 digits overflow Go's int64 Atoi the same way
    assert(frames("9999999999999999999 x") == Seq.empty)
  }

  test("incomplete octet frame at end of stream is dropped") {
    assert(frames("5 hell") == Seq.empty)
    assert(frames("5 hello7 incomp") == Seq("hello"))
    assert(frames("12") == Seq.empty) // digits, no space before EOF
  }

  test("one-byte tail drops in rfc6587 mode but frames in delimiter mode") {
    assert(frames("5 helloX") == Seq("hello"))
    assert(frames("hello\nX", rfc6587 = false) == Seq("hello", "X"))
  }

  test("zero-count octet frame emits an empty string") {
    assert(frames("0 5 hello") == Seq("", "hello"))
  }

  test("octet frames may contain the delimiter; modes alternate per frame") {
    assert(frames("14 <9> message \n0<6> msg 1\n14 <3> message \n2") ==
      Seq("<9> message \n0", "<6> msg 1", "<3> message \n2"))
  }

  test("frame_split composes with parse_syslog over a reassembled stream") {
    val octetMsg = "<34>1 2026-01-02T03:04:05Z h a - - - hi"
    val stream = s"${octetMsg.length} $octetMsg" +
      "<13>Feb  5 17:32:18 host up\n"
    // octet-counted 5424 frame then a non-transparent classic line
    val out = Seq(stream).toDF("s")
      .select(posexplode(graft.functions.frame_split(col("s"))))
      .select(graft.functions.parse_syslog(col("col")).as("p"))
      .select(col("p.priority"), col("p.hostname"), col("p.valid"))
      .collect()
    assert(out.length == 2)
    assert(out(0).getInt(0) == 34 && out(0).getString(1) == "h" &&
      out(0).getBoolean(2))
    assert(out(1).getInt(0) == 13 && out(1).getString(1) == "host" &&
      out(1).getBoolean(2))
  }
}
