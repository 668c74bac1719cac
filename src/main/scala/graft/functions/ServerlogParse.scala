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
    "extra", "status")

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
    StructField("status", StringType)
  ))

  /** `^[a-z]+[a-z0-9-_.]+$` without regex (parser.go:39). */
  private def validService(s: String): Boolean = {
    if (s.length < 2) return false
    val c0 = s.charAt(0)
    if (c0 < 'a' || c0 > 'z') return false
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        c == '-' || c == '_' || c == '.'
      if (!ok) return false
      i += 1
    }
    true
  }

  /** `^00000000[1-9a-f]` without regex (parser.go:40). */
  private def isBenchmarkTrace(s: String): Boolean = {
    if (s.length < 9) return false
    var i = 0
    while (i < 8) { if (s.charAt(i) != '0') return false; i += 1 }
    val c = s.charAt(8)
    (c >= '1' && c <= '9') || (c >= 'a' && c <= 'f')
  }

  /** first+last char strip — reference `trim` (parser.go:155-160). */
  private def trimBrackets(s: String): String =
    if (s.length < 2) s else s.substring(1, s.length - 1)

  /** Go strings.SplitN(s, " ", n) — last element holds the rest. */
  private def splitN(s: String, n: Int): Array[String] = {
    val out = new Array[String](n)
    var cnt = 0
    var start = 0
    while (cnt < n - 1) {
      val i = s.indexOf(' ', start)
      if (i < 0) {
        out(cnt) = s.substring(start); cnt += 1
        val r = new Array[String](cnt); System.arraycopy(out, 0, r, 0, cnt); return r
      }
      out(cnt) = s.substring(start, i); cnt += 1; start = i + 1
    }
    out(cnt) = s.substring(start); cnt += 1
    out
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def statusOnly(logtime: String, status: String): InternalRow = {
    val r = new Array[Any](13)
    r(0) = UTF8String.fromString(logtime)
    r(12) = UTF8String.fromString(status)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(r)
  }

  def parse(input: UTF8String): InternalRow = {
    val s = input.toString
    val logtime = if (s.length >= 23) s.substring(0, 23) else s
    val items = splitN(s, 12)
    if (items.length < 11) return statusOnly(logtime, Short)

    val service = {
      val raw = items(2)
      val ci = raw.indexOf(',')
      if (ci >= 0) raw.substring(0, ci) + raw.substring(ci + 1) else raw
    }
    if (!validService(service)) return statusOnly(logtime, BadService)

    val traceTrimmed = trimBrackets(items(9))
    if (items(9).nonEmpty && isBenchmarkTrace(traceTrimmed)) {
      val r = statusOnly(logtime, Benchmark)
      r.asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
        .update(1, UTF8String.fromString(service))
      return r
    }

    val vals = new Array[Any](13)
    vals(0) = UTF8String.fromString(logtime)
    vals(1) = UTF8String.fromString(service)
    val lineStr = trimBrackets(items(8))
    var lineOk = true
    var lineNo = 0L
    try lineNo = java.lang.Long.parseLong(lineStr)
    catch { case _: NumberFormatException => lineOk = false }
    val idx = s.indexOf("##JIDU##")
    if (lineOk) {
      vals(2) = UTF8String.fromString(items(3))
      vals(3) = UTF8String.fromString(items(4).toUpperCase(java.util.Locale.ROOT))
      vals(4) = UTF8String.fromString(trimBrackets(items(5)))
      vals(5) = UTF8String.fromString(items(6))
      vals(6) = UTF8String.fromString(items(7))
      vals(7) = lineNo
      vals(8) = UTF8String.fromString(traceTrimmed)
      vals(9) = UTF8String.fromString(trimBrackets(items(10)))
      if (idx >= 0) vals(10) = UTF8String.fromString(s.substring(idx))
    }
    // embedded ##JIDU##{json}##JIDU## envelope → extra map (parser.go:138-151)
    val idx2 = s.lastIndexOf("##JIDU##")
    if (idx >= 0 && idx != idx2) {
      val data = s.substring(idx + 8, idx2)
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
    vals(12) = UTF8String.fromString(Ok)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
  }
}

/** Catalyst expression: `serverlog_parse(text)` → struct (see
  * [[ServerlogKernel.schema]]). Native expression with codegen (a single
  * static call inside whole-stage codegen) — not a UDF, per the engine's
  * north-star parse-stage requirement. */
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
