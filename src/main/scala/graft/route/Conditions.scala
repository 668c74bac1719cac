package graft.route

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Condition algebra — a fresh, typed AST with the same surface as the
  * reference's condition config (libbeat/conditions/conditions.go:30-100:
  * equals, contains, regexp, range(gt/gte/lt/lte), has_fields, or, and, not),
  * compiled to Catalyst `Column` predicates so Spark's optimizer (predicate
  * pushdown, LikeSimplification) applies for free — the reference instead
  * hand-optimizes regex→substring (libbeat/common/match/compile.go:36-122).
  */
sealed trait Cond {
  def toColumn: Column
  def &&(other: Cond): Cond = And(Seq(this, other))
  def ||(other: Cond): Cond = Or(Seq(this, other))
  def unary_! : Cond = Not(this)
}

final case class FieldEquals(field: String, value: Any) extends Cond {
  def toColumn: Column = col(field) === lit(value)
}
final case class Contains(field: String, needle: String) extends Cond {
  def toColumn: Column = col(field).contains(needle)
}
final case class Regexp(field: String, pattern: String) extends Cond {
  def toColumn: Column = col(field).rlike(pattern)
}
/** gt/gte/lt/lte bounds; absent bound = unbounded. */
final case class Range(field: String, gt: Option[Double] = None, gte: Option[Double] = None,
                       lt: Option[Double] = None, lte: Option[Double] = None) extends Cond {
  def toColumn: Column = {
    val c = col(field)
    val cs = Seq(
      gt.map(c > _), gte.map(c >= _), lt.map(c < _), lte.map(c <= _)
    ).flatten
    require(cs.nonEmpty, s"range condition on $field needs at least one bound")
    cs.reduce(_ && _)
  }
}
final case class HasFields(fields: Seq[String]) extends Cond {
  def toColumn: Column = {
    require(fields.nonEmpty, "has_fields condition needs at least one field")
    fields.map(f => col(f).isNotNull).reduce(_ && _)
  }
}
/** network condition: every (field → networks) entry must match — an IP
  * string field contained in ANY of its named networks / CIDRs
  * (conditions/network.go:158-178; missing/invalid IP → false). */
final case class Network(fields: Map[String, Seq[String]]) extends Cond {
  def toColumn: Column = fields.map { case (f, nets) =>
    coalesce(graft.functions.ip_in_networks(col(f), nets), lit(false))
  }.reduce(_ && _)
}
final case class And(conds: Seq[Cond]) extends Cond {
  def toColumn: Column = {
    require(conds.nonEmpty, "and condition needs at least one operand")
    conds.map(_.toColumn).reduce(_ && _)
  }
}
final case class Or(conds: Seq[Cond]) extends Cond {
  def toColumn: Column = {
    require(conds.nonEmpty, "or condition needs at least one operand")
    conds.map(_.toColumn).reduce(_ || _)
  }
}
final case class Not(cond: Cond) extends Cond {
  def toColumn: Column = !cond.toColumn
}

/** Output selector: ordered first-match-wins rules → one `sink` column,
  * mirroring libbeat's outil conditional selector
  * (libbeat/outputs/outil/select.go:356-430, condSelector.sel: first
  * condition match wins) compiled to a single `when().when()...otherwise()`
  * chain evaluated once per row.
  */
final case class SelectorRule(when: Cond, sink: String)

final case class Selector(rules: Seq[SelectorRule], default: String) {
  def sinkColumn: Column = {
    val chain = rules.foldLeft(Option.empty[Column]) { (acc, r) =>
      Some(acc match {
        case None    => when(r.when.toColumn, lit(r.sink))
        case Some(c) => c.when(r.when.toColumn, lit(r.sink))
      })
    }
    chain.map(_.otherwise(lit(default))).getOrElse(lit(default))
  }
}
