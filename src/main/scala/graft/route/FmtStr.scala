package graft.route

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Event format strings + the full outil selector expression tree
  * (libbeat/common/fmtstr/formatevents.go:113-246,
  * libbeat/outputs/outil/select.go:31-430), compiled to Catalyst Columns.
  *
  * Format-string language:
  *   `%{[field]}`          field accessor; `[a][b]` → nested path a.b.
  *                         A missing (null) field fails the WHOLE format
  *                         (fmtstr collectFields error → selector falls to
  *                         its default) — modeled by `concat` null
  *                         propagation.
  *   `%{[field]:default}`  default when the field is missing or empty
  *                         (defaultEventFieldEvaler, formatevents.go:370-377)
  *   `%{+yyyy.MM.dd}`      event-timestamp date math (dtfmt Joda-style
  *                         pattern; the common subset maps 1:1 onto Spark's
  *                         datetime patterns and is validated at compile)
  *
  * Selector semantics (select.go:358-430): rules run in order, the first
  * NON-EMPTY result wins; a rule contributes nothing when its `when`
  * condition fails, its format hits a missing field (without default), or
  * its mapping has no entry — all modeled as NULL so the rule list is one
  * `coalesce`. `lowercase` mirrors SelectorCase (select.go:204-209).
  *
  * Everything compiles to built-in codegen'd expressions (concat / coalesce /
  * nullif / element_at / date_format) — per-row cost is a handful of string
  * ops, no UDF, no regex at eval time.
  */
object FmtStr {

  sealed trait Token
  final case class Lit(s: String) extends Token
  final case class Field(path: String, default: Option[String]) extends Token
  final case class Ts(pattern: String) extends Token

  /** chars we pass through to Spark's datetime formatter — the dtfmt subset
    * used by Beats index names (yyyy.MM.dd, HH.mm, xxxx.ww ISO-week-year). */
  private val TsPatternOk = "yMdHhmsSwWDEaGkKQqxXzZVuO'.:-/_ |[]".toSet

  def tokenize(in: String): Seq[Token] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Token]
    var pos = 0
    while (pos < in.length) {
      val open = in.indexOf("%{", pos)
      if (open < 0) { out += Lit(in.substring(pos)); pos = in.length }
      else {
        if (open > pos) out += Lit(in.substring(pos, open))
        val close = in.indexOf('}', open)
        require(close > 0, s"fmtstr: unbalanced %{ in '$in'")
        val body = in.substring(open + 2, close)
        require(body.nonEmpty, s"fmtstr: empty expression in '$in'")
        if (body.charAt(0) == '+') {
          val pat = body.substring(1)
          val bad = pat.filterNot(TsPatternOk.contains)
          require(bad.isEmpty, s"fmtstr: unsupported date pattern chars '$bad' in '$in'")
          out += Ts(pat)
        } else if (body.charAt(0) == '[') {
          // [a][b]...[:default]  (default op outside the brackets)
          val colonAt = {
            // find ':' that is not inside brackets
            var depth = 0; var at = -1; var i = 0
            while (i < body.length && at < 0) {
              body.charAt(i) match {
                case '[' => depth += 1
                case ']' => depth -= 1
                case ':' if depth == 0 => at = i
                case _ =>
              }
              i += 1
            }
            at
          }
          val (pathPart, default) =
            if (colonAt < 0) (body, None)
            else (body.substring(0, colonAt), Some(body.substring(colonAt + 1)))
          val segs = scala.collection.mutable.ArrayBuffer.empty[String]
          var rest = pathPart.trim
          while (rest.nonEmpty) {
            require(rest.charAt(0) == '[', s"fmtstr: field path must use [..] in '$in'")
            val end = rest.indexOf(']')
            require(end > 1, s"fmtstr: empty/unclosed field selector in '$in'")
            segs += rest.substring(1, end)
            rest = rest.substring(end + 1)
          }
          out += Field(segs.mkString("."), default)
        } else
          throw new IllegalArgumentException(
            s"fmtstr: unsupported format expression '%{$body}' in '$in'")
        pos = close + 1
      }
    }
    out.toSeq
  }

  /** compile a format string to a Column; NULL result = "format failed"
    * (missing required field), matching EventFormatString.Run's error. */
  def compile(pattern: String,
              resolve: String => Column = col,
              tsCol: Column = col("ts")): Column = {
    val toks = tokenize(pattern)
    if (toks.isEmpty) lit("")
    else concat(toks.map {
      case Lit(s) => lit(s)
      case Ts(p) => date_format(tsCol, p)
      case Field(path, None) => resolve(path).cast("string")
      case Field(path, Some(d)) =>
        val f = resolve(path).cast("string")
        when(f.isNull || f === "", lit(d)).otherwise(f)
    }: _*)
  }

  /** one selector rule (outil buildSingle, select.go:279-352). */
  final case class Rule(format: String,
                        default: String = "",
                        when: Option[Cond] = None,
                        mappings: Map[String, String] = Map.empty)

  /** full conditional selector (select.go:358-430): ordered rules, first
    * non-empty wins, optional final constant fallback, optional lowercase. */
  final case class EventSelector(rules: Seq[Rule], fallback: String = "",
                                 lowercase: Boolean = false) {
    def column(resolve: String => Column = col, tsCol: Column = col("ts")): Column = {
      val ruleCols = rules.map { r =>
        val base = FmtStr.compile(r.format, resolve, tsCol)
        // fmtSelector: error/empty → otherwise; then "" means "no result"
        val withDefault =
          when(base.isNull || base === "", lit(r.default)).otherwise(base)
        val valued =
          if (r.mappings.isEmpty) withDefault
          else {
            // mapSelector (select.go:395-416): lookup the *un-defaulted*
            // format result; miss/empty → otherwise
            val entries = r.mappings.toSeq.sortBy(_._1)
              .flatMap { case (k, v) => Seq(lit(k), lit(v)) }
            val looked = element_at(map(entries: _*), base)
            when(base.isNull || base === "", lit(r.default))
              .otherwise(coalesce(nullif(looked, lit("")), lit(r.default)))
          }
        val nonEmpty = nullif(valued, lit("")) // empty → next rule
        r.when match {
          case Some(c) => when(c.toColumn, nonEmpty)
          case None    => nonEmpty
        }
      }
      val sel = coalesce((ruleCols :+ nullif(lit(fallback), lit(""))): _*)
      val res = coalesce(sel, lit("")) // no match → empty string (Select)
      if (lowercase) lower(res) else res
    }
  }
}
