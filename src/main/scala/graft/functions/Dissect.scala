package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Dissect: positional tokenization by literal delimiters — the fast
  * non-regex parse path. Pattern language (a fresh implementation of the
  * semantics in libbeat/processors/dissect/{parser,dissect,field}.go):
  *
  *   `%{key}`        capture until the next literal delimiter
  *   `%{}` `%{?key}` skip (matched but not emitted)
  *   `%{+key}`       append to `key`, joined by the delimiter preceding the
  *                   appended part; `%{+key/2}` orders parts explicitly
  *   `%{key->}`      greedy: consume repeated trailing delimiters (padding)
  *   `%{key|type}`   convert: integer|long|float|double|boolean|string|ip
  *
  * The compiled form is a delimiter-scan (indexOf/substring loop — no regex
  * at match time). A non-matching row yields a NULL struct, the columnar
  * analogue of the reference's `dissect_parsing_error` flag
  * (dissect/processor.go:93-117) — callers route those rows to dead-letter.
  */
object Dissect {

  sealed trait Kind
  case object Normal extends Kind
  case object Skip extends Kind
  case object Append extends Kind

  final case class Part(key: String, kind: Kind, order: Int, greedy: Boolean,
                        typ: String, delimAfter: String, delimBefore: String)

  final case class Compiled(prefix: String, parts: Array[Part], schema: StructType,
                            outKeys: Array[String]) {
    private val keyIndex: Map[String, Int] = outKeys.zipWithIndex.toMap

    def sqlType(t: String): DataType = t match {
      case "integer"          => IntegerType
      case "long"             => LongType
      case "float"            => FloatType
      case "double"           => DoubleType
      case "boolean"          => BooleanType
      case _                  => StringType // string, ip
    }

    private def convert(v: String, t: String): Any = try {
      t match {
        case "integer" => java.lang.Integer.parseInt(v.trim)
        case "long"    => java.lang.Long.parseLong(v.trim)
        case "float"   => java.lang.Float.parseFloat(v.trim)
        case "double"  => java.lang.Double.parseDouble(v.trim)
        case "boolean" => v.trim.toLowerCase match {
          case "true" | "1" => true
          case "false" | "0" => false
          case _ => null
        }
        case _ => UTF8String.fromString(v)
      }
    } catch { case _: NumberFormatException => null }

    def run(s: String): InternalRow = {
      if (!s.startsWith(prefix)) return null
      var pos = prefix.length
      val raw = new Array[String](parts.length)
      var i = 0
      while (i < parts.length) {
        val p = parts(i)
        if (p.delimAfter.isEmpty) { // last part takes the rest
          raw(i) = s.substring(pos); pos = s.length
        } else {
          val idx = s.indexOf(p.delimAfter, pos)
          if (idx < 0) return null
          raw(i) = s.substring(pos, idx)
          pos = idx + p.delimAfter.length
          if (p.greedy) {
            while (s.startsWith(p.delimAfter, pos)) pos += p.delimAfter.length
          }
        }
        i += 1
      }
      // resolve appends in (order, appearance) sequence
      val joined = new Array[StringBuilder](outKeys.length)
      val sorted = parts.zipWithIndex.filter(_._1.kind != Skip)
        .sortBy { case (p, ai) => (keyIndex(p.key), p.order, ai) }
      for ((p, ai) <- sorted) {
        val ki = keyIndex(p.key)
        if (joined(ki) == null) joined(ki) = new StringBuilder(raw(ai))
        else {
          // join with the appended part's preceding delimiter; default " "
          // (reference dissect field.go:221-235, const.go:54)
          val sep = if (p.delimBefore.isEmpty) " " else p.delimBefore
          joined(ki).append(sep).append(raw(ai))
        }
      }
      val vals = new Array[Any](outKeys.length)
      var k = 0
      while (k < outKeys.length) {
        vals(k) = if (joined(k) == null) null else convert(joined(k).toString, typeOf(k))
        k += 1
      }
      new GenericInternalRow(vals)
    }

    private val typeNames: Array[String] = outKeys.map { k =>
      parts.find(p => p.kind != Skip && p.key == k).map(_.typ).getOrElse("string")
    }
    private def typeOf(i: Int): String = typeNames(i)
  }

  /** Compile a dissect pattern; throws IllegalArgumentException on malformed
    * patterns (empty delimiter between two fields, unbalanced braces). */
  def compile(pattern: String): Compiled = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[Part]
    var prefix = ""
    var pos = 0
    var prevDelim = ""
    var first = true
    var pendingField: Option[(String, Kind, Int, Boolean, String)] = None

    def flush(field: (String, Kind, Int, Boolean, String), delimAfter: String): Unit = {
      val (key, kind, order, greedy, typ) = field
      parts += Part(key, kind, order, greedy, typ, delimAfter, prevDelim)
    }

    while (pos < pattern.length) {
      val open = pattern.indexOf("%{", pos)
      if (open < 0) {
        val tail = pattern.substring(pos)
        pendingField match {
          case Some(f) => flush(f, tail); pendingField = None
          case None    => if (first) prefix = tail
        }
        pos = pattern.length
      } else {
        val lit = pattern.substring(pos, open)
        pendingField match {
          case Some(f) =>
            if (lit.isEmpty)
              throw new IllegalArgumentException(
                s"dissect: empty delimiter between fields in '$pattern'")
            flush(f, lit); prevDelim = lit; pendingField = None
          case None =>
            if (first) prefix = lit
            prevDelim = lit
        }
        first = false
        val close = pattern.indexOf('}', open)
        if (close < 0) throw new IllegalArgumentException(
          s"dissect: unbalanced braces in '$pattern'")
        var body = pattern.substring(open + 2, close)
        var greedy = false
        if (body.endsWith("->")) { greedy = true; body = body.dropRight(2) }
        var typ = "string"
        val pipe = body.indexOf('|')
        if (pipe >= 0) { typ = body.substring(pipe + 1).trim; body = body.substring(0, pipe) }
        var kind: Kind = Normal
        var order = 0
        if (body.isEmpty) { kind = Skip; body = s"_skip${parts.length}" }
        else if (body.startsWith("?")) { kind = Skip; body = body.substring(1) }
        else if (body.startsWith("+")) {
          kind = Append; body = body.substring(1)
          val slash = body.indexOf('/')
          if (slash >= 0) {
            order = java.lang.Integer.parseInt(body.substring(slash + 1))
            body = body.substring(0, slash)
          }
        }
        pendingField = Some((body, kind, order, greedy, typ))
        pos = close + 1
      }
    }
    pendingField.foreach(f => flush(f, ""))

    val ps = parts.toArray
    val emitted = ps.filter(_.kind != Skip)
    val outKeys = emitted.map(_.key).distinct
    val schema = StructType(outKeys.map { k =>
      val typ = emitted.find(_.key == k).get.typ
      StructField(k, typ match {
        case "integer" => IntegerType
        case "long"    => LongType
        case "float"   => FloatType
        case "double"  => DoubleType
        case "boolean" => BooleanType
        case _         => StringType
      })
    })
    Compiled(prefix, ps, schema, outKeys)
  }
}

/** `dissect(text, pattern)` Catalyst expression; NULL struct on mismatch. */
case class DissectExpr(child: Expression, pattern: String) extends UnaryExpression {
  @transient private lazy val compiled = Dissect.compile(pattern)
  // compile eagerly on the driver too, so bad patterns fail at plan time
  private val planTimeSchema: StructType = Dissect.compile(pattern).schema

  override def dataType: DataType = planTimeSchema
  override def nullable: Boolean = true
  override def prettyName: String = "dissect"

  override protected def nullSafeEval(input: Any): Any =
    compiled.run(input.asInstanceOf[UTF8String].toString)

  def evalInput(input: UTF8String): InternalRow = compiled.run(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dissectExpr", this, classOf[DissectExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.evalInput($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): DissectExpr =
    copy(child = newChild)
}
