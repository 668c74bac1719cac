package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `grok_struct(text)`: one compiled `java.util.regex.Pattern` evaluated ONCE
  * per row, emitting ALL capture groups as a struct — unlike chaining N
  * `regexp_extract` calls, which re-runs the regex N times per row.
  *
  * This is the Spark-native "grok" stage: the reference ships grok only as
  * ES-ingest YAML (e.g. filebeat/module/nginx/access/ingest/pipeline.yml:10-25)
  * and hand-compiles regexes in its fork parsers
  * (libbeat/processors/parse_vehicle_trace2trace/parser.go:37,125).
  *
  * Output: struct(field1 string, ..., fieldN string, _match string).
  * `_match` carries the full group-0 match (needed for suffix-slicing
  * semantics, parser.go:151-155). Returns a null struct when the pattern
  * does not match (≈ `dissect_parsing_error` tagging → dead-letter routing).
  */
case class GrokStruct(child: Expression, pattern: String, fields: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(
    fields.map(f => StructField(f, StringType)) :+ StructField("_match", StringType))
  override def nullable: Boolean = true
  override def prettyName: String = "grok_struct"

  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)

  private def doParse(input: UTF8String): InternalRow = {
    val m = compiled.matcher(input.toString)
    // first-match-anywhere, like Go's FindStringSubmatch (parser.go:125)
    if (!m.find()) return null
    val n = fields.length
    val vals = new Array[Any](n + 1)
    var i = 0
    while (i < n) {
      val g = if (i + 1 <= m.groupCount()) m.group(i + 1) else null
      vals(i) = if (g == null) null else UTF8String.fromString(g)
      i += 1
    }
    vals(n) = UTF8String.fromString(m.group(0))
    new GenericInternalRow(vals)
  }

  override protected def nullSafeEval(input: Any): Any =
    doParse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // register `this` once per codegen'd operator; per-row cost is one
    // virtual call + the (pre-compiled) matcher run
    val ref = ctx.addReferenceObj("grokExpr", this, classOf[GrokStruct].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.evalInput($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  /** public entry for generated code */
  def evalInput(input: UTF8String): InternalRow = doParse(input)

  override protected def withNewChildInternal(newChild: Expression): GrokStruct =
    copy(child = newChild)
}
