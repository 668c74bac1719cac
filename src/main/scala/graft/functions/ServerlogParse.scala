package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row kernel for the serverlog parse stage. Static (forwarder) methods so
  * whole-stage-codegen can call it directly from generated Java.
  *
  * Reproduces the semantics of the reference fork's `parse_serverlog`
  * processor (libbeat/processors/parse_serverlog/parser.go:71-160), applied
  * to the raw content line (the JSON envelope unwrap is a separate operator):
  *
  *  - `logtime` = first 23 chars (parser.go:98)
  *  - positional `SplitN(content, " ", 12)`; < 11 items → pass-through
  *    ("short", parser.go:100-103)
  *  - service name: one comma removed, must match `^[a-z]+[a-z0-9-_.]+$`
  *    else the event is dropped ("bad_service", parser.go:105-109)
  *  - benchmark traffic: trimmed trace id matching `^00000000[1-9a-f]` stops
  *    field extraction ("benchmark", parser.go:111-114)
  *  - fields hostname/level(upper)/thread/class/method/line(int)/trace/span,
  *    `[...]`-trimming via first+last char strip (parser.go:116-136,155-160)
  *  - embedded JSON between first and last `##JIDU##` markers merged into an
  *    `extra` map (parser.go:138-151); `message` = suffix from first marker
  */
object ServerlogKernel {
  import graft.model.ParseStatus._

  private val fieldNames = Array("logtime", "service", "hostname", "level",
    "thread", "class", "method", "line", "trace_id", "span_id", "message",
    "extra", "script_error", "status")

  val schema: StructType = StructType(Seq(
    StructField("logtime", StringType),
    StructField("service", StringType),
    StructField("hostname", StringType),
    StructField("level", StringType),
    StructField("thread", StringType),
    StructField("class", StringType),
    StructField("method", StringType),
    StructField("line", LongType),
    StructField("trace_id", StringType),
    StructField("span_id", StringType),
    StructField("message", StringType),
    StructField("extra", MapType(StringType, StringType)),
    StructField("script_error", StringType),
    StructField("status", StringType)
  ))

  // pre-encoded status constants — one allocation for the process, not per row
  private val StShort = UTF8String.fromString(Short)
  private val StBadService = UTF8String.fromString(BadService)
  private val StBenchmark = UTF8String.fromString(Benchmark)
  private val StOk = UTF8String.fromString(Ok)
  /** `script_error` marker for an unparseable `[line]` item — the reference
    * keeps the event with a script_error field and skips field extraction
    * (parser.go:117-136); the dead-letter taxonomy must not lose the
    * "line unparseable" case. */
  private val ErrLineParse = UTF8String.fromString("line_parse_error")

  /** `^[a-z]+[a-z0-9-_.]+$` without regex (parser.go:39), over bytes. */
  private def validService(b: Array[Byte], from: Int, until: Int): Boolean = {
    if (until - from < 2) return false
    val c0 = b(from)
    if (c0 < 'a' || c0 > 'z') return false
    var i = from + 1
    while (i < until) {
      val c = b(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        c == '-' || c == '_' || c == '.'
      if (!ok) return false
      i += 1
    }
    true
  }

  /** `^00000000[1-9a-f]` without regex (parser.go:40), over bytes. */
  private def isBenchmarkTrace(b: Array[Byte], from: Int, until: Int): Boolean = {
    if (until - from < 9) return false
    var i = from
    while (i < from + 8) { if (b(i) != '0') return false; i += 1 }
    val c = b(from + 8)
    (c >= '1' && c <= '9') || (c >= 'a' && c <= 'f')
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Allocation-lean parse: ONE defensive byte copy of the row, then every
    * output string is a zero-copy `UTF8String.fromBytes` slice of it. The
    * original String-based kernel allocated ~1 KB of garbage per row
    * (decode → 12 substrings → re-encode), which inverted thread-scaling at
    * 32 cores — allocation rate, not CPU, was the bottleneck. Byte slicing
    * is also the faithful port: Go strings are bytes, so SplitN/trim in
    * parser.go:100-160 are byte operations. */
  def parse(input: UTF8String): InternalRow = {
    val n = input.numBytes
    // defensive copy: the input may alias a reused scan buffer, and our
    // output slices must stay valid after this call returns
    val b = new Array[Byte](n)
    org.apache.spark.unsafe.Platform.copyMemory(
      input.getBaseObject, input.getBaseOffset, b,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, n.toLong)
    @inline def slice(from: Int, until: Int): UTF8String =
      UTF8String.fromBytes(b, from, until - from)

    val logtime = if (n >= 23) slice(0, 23) else slice(0, n)

    // Go strings.SplitN(s, " ", 12): record the start/end of each item;
    // the 12th item (if any) runs to end-of-line
    val starts = new Array[Int](12)
    val ends = new Array[Int](12)
    var cnt = 0
    var start = 0
    var i = 0
    while (i < n && cnt < 11) {
      if (b(i) == ' ') {
        starts(cnt) = start; ends(cnt) = i; cnt += 1; start = i + 1
      }
      i += 1
    }
    starts(cnt) = start; ends(cnt) = n; cnt += 1

    def statusOnly(status: UTF8String): InternalRow = {
      val r = new Array[Any](14)
      r(0) = logtime
      r(13) = status
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(r)
    }

    if (cnt < 11) return statusOnly(StShort)

    // service: one comma removed (parser.go:105), usually absent → zero-copy
    var svc: UTF8String = null
    var svcBytes = b
    var svcFrom = starts(2)
    var svcUntil = ends(2)
    var ci = -1
    var j = svcFrom
    while (ci < 0 && j < svcUntil) { if (b(j) == ',') ci = j; j += 1 }
    if (ci >= 0) {
      val sb = new Array[Byte](svcUntil - svcFrom - 1)
      System.arraycopy(b, svcFrom, sb, 0, ci - svcFrom)
      System.arraycopy(b, ci + 1, sb, ci - svcFrom, svcUntil - ci - 1)
      svcBytes = sb; svcFrom = 0; svcUntil = sb.length
    }
    if (!validService(svcBytes, svcFrom, svcUntil)) return statusOnly(StBadService)
    svc = UTF8String.fromBytes(svcBytes, svcFrom, svcUntil - svcFrom)

    // trace: first+last byte strip (reference trim, parser.go:155-160)
    val trFrom = if (ends(9) - starts(9) < 2) starts(9) else starts(9) + 1
    val trUntil = if (ends(9) - starts(9) < 2) ends(9) else ends(9) - 1
    if (ends(9) > starts(9) && isBenchmarkTrace(b, trFrom, trUntil)) {
      val r = new Array[Any](14)
      r(0) = logtime; r(1) = svc; r(13) = StBenchmark
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(r)
    }

    @inline def trimmed(k: Int): UTF8String =
      if (ends(k) - starts(k) < 2) slice(starts(k), ends(k))
      else slice(starts(k) + 1, ends(k) - 1)

    // line number parse from bytes ([%{line}] → long)
    val lnFrom = if (ends(8) - starts(8) < 2) starts(8) else starts(8) + 1
    val lnUntil = if (ends(8) - starts(8) < 2) ends(8) else ends(8) - 1
    var lineOk = lnUntil > lnFrom && lnUntil - lnFrom <= 19 // no silent overflow
    var lineNo = 0L
    var neg = false
    var k = lnFrom
    if (lineOk && (b(k) == '-' || b(k) == '+')) { neg = b(k) == '-'; k += 1; lineOk = k < lnUntil }
    while (lineOk && k < lnUntil) {
      val c = b(k)
      if (c < '0' || c > '9') lineOk = false
      else { lineNo = lineNo * 10 + (c - '0'); k += 1 }
    }
    if (neg) lineNo = -lineNo

    // ##JIDU## marker scan (byte indexOf)
    var idx = -1
    var idx2 = -1
    i = 0
    while (i <= n - 8) {
      if (b(i) == '#' && b(i + 1) == '#' && b(i + 2) == 'J' && b(i + 3) == 'I' &&
        b(i + 4) == 'D' && b(i + 5) == 'U' && b(i + 6) == '#' && b(i + 7) == '#') {
        if (idx < 0) idx = i
        idx2 = i
      }
      i += 1
    }

    val vals = new Array[Any](14)
    vals(0) = logtime
    vals(1) = svc
    if (!lineOk) vals(12) = ErrLineParse
    if (lineOk) {
      vals(2) = slice(starts(3), ends(3))
      vals(3) = asciiUpper(b, starts(4), ends(4))
      vals(4) = trimmed(5)
      vals(5) = slice(starts(6), ends(6))
      vals(6) = slice(starts(7), ends(7))
      vals(7) = lineNo
      vals(8) = slice(trFrom, trUntil)
      vals(9) = trimmed(10)
      if (idx >= 0) vals(10) = slice(idx, n)
    }
    // embedded ##JIDU##{json}##JIDU## envelope → extra map (parser.go:138-151).
    // Fast path: a hand-rolled scanner for flat escape-free string→string
    // objects (the shape the reference emits). Anything else falls back to
    // jackson — whose readTree throughput collapses under 32-thread
    // contention (shared-factory buffer pool), so the hot path must avoid it.
    if (idx >= 0 && idx != idx2) {
      val flat = parseFlatStringObject(b, idx + 8, idx2)
      if (flat != null) {
        vals(11) = flat
      } else {
        val data = UTF8String.fromBytes(b, idx + 8, idx2 - idx - 8).toString
        try {
          val node = mapper.readTree(data)
          if (node != null && node.isObject) {
            val ks = scala.collection.mutable.ArrayBuffer.empty[Any]
            val vs = scala.collection.mutable.ArrayBuffer.empty[Any]
            val it = node.fields()
            while (it.hasNext) {
              val kv = it.next()
              ks += UTF8String.fromString(kv.getKey)
              vs += UTF8String.fromString(
                if (kv.getValue.isTextual) kv.getValue.asText() else kv.getValue.toString)
            }
            vals(11) = new ArrayBasedMapData(
              new GenericArrayData(ks.toArray), new GenericArrayData(vs.toArray))
          }
        } catch { case _: Exception => /* json_error — leave extra null */ }
      }
    }
    vals(13) = StOk
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
  }

  /** Scanner for `{"k": "v", ...}` — flat JSON objects whose keys and values
    * are escape-free strings (the envelope shape the reference emits,
    * parse_serverlog/parser.go:138-151). Returns the map data (zero-copy
    * slices of `b`) or null when the input is anything fancier (escapes,
    * non-string values, nesting, duplicate keys) → caller falls back to a
    * full JSON parse with identical semantics. */
  private def parseFlatStringObject(b: Array[Byte], from: Int, until: Int): ArrayBasedMapData = {
    var i = from
    @inline def ws(): Unit = {
      while (i < until && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r')) i += 1
    }
    ws()
    if (i >= until || b(i) != '{') return null
    i += 1
    ws()
    val ks = scala.collection.mutable.ArrayBuffer.empty[Any]
    val vs = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (i < until && b(i) == '}') {
      i += 1; ws()
      if (i != until) return null
      return new ArrayBasedMapData(
        new GenericArrayData(ks.toArray), new GenericArrayData(vs.toArray))
    }
    // parse one escape-free, non-multibyte-safe-agnostic string literal;
    // returns the slice or null (escape / control / unterminated)
    @inline def str(): UTF8String = {
      if (i >= until || b(i) != '"') return null
      i += 1
      val s0 = i
      while (i < until && b(i) != '"' && b(i) != '\\') i += 1
      if (i >= until || b(i) != '"') return null
      val out = UTF8String.fromBytes(b, s0, i - s0)
      i += 1
      out
    }
    var more = true
    while (more) {
      ws()
      val k = str()
      if (k == null) return null
      var j = 0
      while (j < ks.length) { if (ks(j) == k) return null; j += 1 } // dup key → fallback
      ws()
      if (i >= until || b(i) != ':') return null
      i += 1
      ws()
      val v = str()
      if (v == null) return null
      ks += k
      vs += v
      ws()
      if (i < until && b(i) == ',') { i += 1 }
      else if (i < until && b(i) == '}') { i += 1; more = false }
      else return null
    }
    ws()
    if (i != until) return null
    new ArrayBasedMapData(new GenericArrayData(ks.toArray), new GenericArrayData(vs.toArray))
  }

  /** Status-only evaluation: exactly [[parse]]'s short/bad_service/benchmark/ok
    * decision with ZERO allocations (reads the UTF8String in place, returns a
    * cached constant). The router needs only this + `tool`, so count/metrics
    * plans skip the 13-field extraction entirely — at 10^12 rows the
    * difference between "route every row" and "fully parse every row". */
  def status(input: UTF8String): UTF8String = {
    val base = input.getBaseObject
    val off = input.getBaseOffset
    val n = input.numBytes
    @inline def at(i: Int): Byte = org.apache.spark.unsafe.Platform.getByte(base, off + i)

    // SplitN boundary scan (same walk as parse): record item 2 (service) and
    // item 9 (trace); `spaces` counts split points, capped at 11
    var spaces = 0
    var start = 0
    var svcFrom = -1; var svcUntil = -1
    var trFrom = -1; var trUntil = -1
    var i = 0
    while (i < n && spaces < 11) {
      if (at(i) == ' ') {
        if (spaces == 2) { svcFrom = start; svcUntil = i }
        if (spaces == 9) { trFrom = start; trUntil = i }
        spaces += 1; start = i + 1
      }
      i += 1
    }
    if (spaces < 10) return StShort // total items = spaces + 1 < 11

    // service: strip ONE comma, then ^[a-z]+[a-z0-9-_.]+$ (parser.go:105-109)
    var ci = -1
    var j = svcFrom
    while (ci < 0 && j < svcUntil) { if (at(j) == ',') ci = j; j += 1 }
    val effLen = (svcUntil - svcFrom) - (if (ci >= 0) 1 else 0)
    if (effLen < 2) return StBadService
    val firstPos = if (ci == svcFrom) svcFrom + 1 else svcFrom
    val c0 = at(firstPos)
    if (c0 < 'a' || c0 > 'z') return StBadService
    j = svcFrom
    while (j < svcUntil) {
      if (j != ci && j != firstPos) {
        val c = at(j)
        val ok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
          c == '-' || c == '_' || c == '.'
        if (!ok) return StBadService
      }
      j += 1
    }

    // benchmark trace: raw item non-empty, first+last strip, ^00000000[1-9a-f]
    if (trUntil > trFrom) {
      val tf = if (trUntil - trFrom < 2) trFrom else trFrom + 1
      val tu = if (trUntil - trFrom < 2) trUntil else trUntil - 1
      if (tu - tf >= 9) {
        var k = tf
        var zeros = true
        while (zeros && k < tf + 8) { if (at(k) != '0') zeros = false; k += 1 }
        if (zeros) {
          val c = at(tf + 8)
          if ((c >= '1' && c <= '9') || (c >= 'a' && c <= 'f')) return StBenchmark
        }
      }
    }
    StOk
  }

  /** upper-case: byte-wise for pure-ASCII values (the fast path); Unicode
    * fallback matches the original `toUpperCase(Locale.ROOT)` semantics. */
  private def asciiUpper(b: Array[Byte], from: Int, until: Int): UTF8String = {
    var ascii = true
    var anyLower = false
    var i = from
    while (i < until) {
      val c = b(i)
      if (c < 0) ascii = false
      else if (c >= 'a' && c <= 'z') anyLower = true
      i += 1
    }
    if (!ascii)
      return UTF8String.fromString(
        UTF8String.fromBytes(b, from, until - from).toString
          .toUpperCase(java.util.Locale.ROOT))
    if (!anyLower) return UTF8String.fromBytes(b, from, until - from)
    val out = new Array[Byte](until - from)
    i = from
    while (i < until) {
      val c = b(i)
      out(i - from) = if (c >= 'a' && c <= 'z') (c - 32).toByte else c
      i += 1
    }
    UTF8String.fromBytes(out, 0, out.length)
  }
}

/** Catalyst expression: `serverlog_parse(text)` → struct (see
  * [[ServerlogKernel.schema]]). Native expression with codegen (a single
  * static call inside whole-stage codegen) — not a UDF, per the engine's
  * north-star parse-stage requirement. */
/** Catalyst expression: `serverlog_status(text)` → string — the router's
  * allocation-free fast path (see [[ServerlogKernel.status]]); agrees with
  * `serverlog_parse(text).status` by construction (pinned by spec). */
case class ServerlogStatus(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "serverlog_status"

  override protected def nullSafeEval(input: Any): Any =
    ServerlogKernel.status(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ServerlogKernel.status($c);")

  override protected def withNewChildInternal(newChild: Expression): ServerlogStatus =
    copy(child = newChild)
}

case class ServerlogParse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ServerlogKernel.schema
  override def nullable: Boolean = true
  override def prettyName: String = "serverlog_parse"

  override protected def nullSafeEval(input: Any): Any =
    ServerlogKernel.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ServerlogKernel.parse($c);")

  override protected def withNewChildInternal(newChild: Expression): ServerlogParse =
    copy(child = newChild)
}
