package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** registered_domain processor (libbeat/processors/registered_domain/
  * registered_domain.go — the reference resolves eTLD+1 through
  * golang.org/x/net/publicsuffix): the Public Suffix List algorithm over a
  * compiled rule set.
  *
  * Rule grammar per publicsuffix.org/list (the PSL data is public-domain):
  *   - exact rules ("com", "co.uk"),
  *   - wildcard rules ("*.ck" — the `*` matches exactly one label),
  *   - exception rules ("!www.ck" — wins over any wildcard/exact match; the
  *     public suffix is the rule minus its leftmost label),
  *   - the implicit default rule "*" when nothing matches.
  * Prevailing rule = the exception rule if any matches, else the matching
  * rule with the most labels. Registered domain = public suffix plus one
  * preceding label; a domain that IS a public suffix has no registered
  * domain (the reference's EffectiveTLDPlusOne error → event untouched →
  * NULL here).
  *
  * [[PslKernel.DefaultRules]] is a representative embedded subset —
  * deployments supply the full downloaded list via the `rules` parameter.
  * Rules are compiled ONCE at plan time into reversed label arrays; the
  * per-row cost is one label split plus ~|rules| suffix compares.
  */
object PslKernel {

  /** Representative subset of the Public Suffix List (publicsuffix.org). */
  val DefaultRules: Seq[String] = Seq(
    "com", "net", "org", "io", "co", "edu", "gov", "mil", "info", "biz",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "au", "com.au", "net.au", "org.au",
    "jp", "co.jp", "ne.jp", "or.jp",
    "de", "fr", "it", "nl", "cn", "com.cn",
    "github.io", "gitlab.io", "s3.amazonaws.com", "blogspot.com",
    "*.ck", "!www.ck")

  final class Compiled(ruleSpecs: Seq[String]) extends Serializable {
    // rules as label arrays in domain order; wildcard keeps its "*" label
    private val exceptions: Array[Array[String]] = ruleSpecs
      .filter(_.startsWith("!")).map(_.substring(1).split('.')).toArray
    private val rules: Array[Array[String]] = ruleSpecs
      .filterNot(_.startsWith("!")).map(_.split('.')).toArray

    /** rule labels match the TAIL of the domain labels; "*" matches any ONE
      * label (wildcards are leftmost-only in the PSL). */
    private def tailMatches(labels: Array[String], rule: Array[String]): Boolean = {
      if (rule.length > labels.length) return false
      var i = 0
      while (i < rule.length) {
        val rl = rule(rule.length - 1 - i)
        if (rl != "*" && rl != labels(labels.length - 1 - i)) return false
        i += 1
      }
      true
    }

    /** number of labels in the public suffix of `labels`, per the PSL
      * algorithm (≥1 — the default rule "*" always matches). */
    def suffixLabels(labels: Array[String]): Int = {
      var i = 0
      while (i < exceptions.length) {
        if (tailMatches(labels, exceptions(i))) return exceptions(i).length - 1
        i += 1
      }
      var best = 1 // default rule "*"
      i = 0
      while (i < rules.length) {
        val r = rules(i)
        if (r.length > best && tailMatches(labels, r)) best = r.length
        i += 1
      }
      best
    }

    /** eTLD+1, or null when the domain is malformed or is itself a public
      * suffix. Input is lowercased; one trailing dot is tolerated (FQDN
      * form), like the reference's normalization. */
    def registeredDomain(domainRaw: String): String = {
      if (domainRaw == null || domainRaw.isEmpty) return null
      // Locale.ROOT: Go strings.ToLower is locale-independent; the default
      // JVM locale would fold 'I' to dotless 'ı' under Turkish locales
      var domain = domainRaw.toLowerCase(java.util.Locale.ROOT)
      if (domain.charAt(domain.length - 1) == '.')
        domain = domain.substring(0, domain.length - 1)
      if (domain.isEmpty || domain.charAt(0) == '.' || domain.contains(".."))
        return null
      val labels = domain.split('.')
      val k = suffixLabels(labels)
      if (labels.length <= k) return null // the domain IS a public suffix
      labels.slice(labels.length - k - 1, labels.length).mkString(".")
    }
  }
}

/** `registered_domain(domain)` → eTLD+1 string; NULL when the domain is
  * malformed or is itself a public suffix. */
case class RegisteredDomain(child: Expression,
                            rules: Seq[String] = PslKernel.DefaultRules)
    extends UnaryExpression {
  @transient private lazy val compiled = new PslKernel.Compiled(rules)

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "registered_domain"

  def evalInput(input: UTF8String): UTF8String = {
    val rd = compiled.registeredDomain(input.toString)
    if (rd == null) null else UTF8String.fromString(rd)
  }

  override protected def nullSafeEval(input: Any): Any =
    evalInput(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pslExpr", this, classOf[RegisteredDomain].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.evalInput($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): RegisteredDomain =
    copy(child = newChild)
}
