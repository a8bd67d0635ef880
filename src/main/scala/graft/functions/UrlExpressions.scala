package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Public Suffix List rule set (publicsuffix.org/list — the file format
  * Mozilla publishes) with full wildcard/exception semantics:
  *
  *   - plain rules (`com`, `co.uk`, `kobe.jp`) match their own labels;
  *   - wildcard rules (`*.ck`) match ONE arbitrary label in the starred
  *     position;
  *   - exception rules (`!www.ck`) override a wildcard — the public
  *     suffix is the rule minus its leftmost label, so the rule itself IS
  *     a registrable domain;
  *   - no rule matches → the default rule `*` (the last label alone is
  *     the public suffix), per the spec's algorithm;
  *   - among matching rules the one with the MOST labels wins (exceptions
  *     beat everything).
  *
  * This library has no egress, so the real list must be VENDORED by the
  * caller: [[PslRules.fromFile]] / [[PslRules.fromLines]] parse the
  * published format verbatim (comments, blank lines, the ICANN/PRIVATE
  * section markers). [[PslRules.Builtin]] is a documented SAMPLE covering
  * the common registries — enough for tests and small corpora, not a
  * substitute for the full list.
  *
  * Scale shape: the rule set is a driver-built pair of hash sets carried
  * to executors once per task binary (a reference object in codegen, the
  * same pattern as the centroid matrices) — per-row work is O(#labels)
  * hash probes inside whole-stage codegen, nothing joins or shuffles.
  */
final class PslRules private (
    val exact: java.util.HashSet[String],
    val wildcardParents: java.util.HashSet[String],
    val exceptions: java.util.HashSet[String]) extends Serializable {

  def nRules: Int = exact.size + wildcardParents.size + exceptions.size

  /** The registered (registrable / pay-level) domain of an already
    * lowercased hostname, or the host unchanged when none applies:
    * IP literals (IPv4 dotted quads, bracketed IPv6), hosts that ARE a
    * public suffix, and label-less hosts all pass through — the engine's
    * scrubbing convention (filter rather than throw on crawl junk). */
  def registeredDomain(host: String): String = {
    if (host.isEmpty || host.charAt(0) == '[' || PslRules.isIpv4(host)) return host
    // canonicalize a single trailing dot (FQDN form, valid and present in
    // crawl URLs): rules are stored without it, so "example.com." would
    // otherwise match nothing and fall to the default rule, merging every
    // trailing-dot host of a TLD into one bogus "com." domain bucket
    val canon =
      if (host.length > 1 && host.charAt(host.length - 1) == '.')
        host.substring(0, host.length - 1)
      else host
    val labels = canon.split("\\.", -1)
    val k = labels.length
    if (k < 2) return canon
    // exceptions first, longest suffix first: an exception rule is itself
    // the registrable domain
    var i = 0
    val suffixFrom = new Array[String](k)
    var acc: String = null
    var j = k - 1
    while (j >= 0) { // suffixFrom(j) = labels[j..k) joined
      acc = if (acc == null) labels(j) else labels(j) + "." + acc
      suffixFrom(j) = acc
      j -= 1
    }
    i = 0
    while (i < k) {
      if (exceptions.contains(suffixFrom(i))) return suffixFrom(i)
      i += 1
    }
    // longest matching plain/wildcard rule; default rule `*` = 1 label
    var best = 1
    i = 0
    while (i < k) {
      val len = k - i
      if (len > best && exact.contains(suffixFrom(i))) best = len
      // `*.parent` matches len (parent labels + 1) when a label exists at i
      if (i + 1 < k && (k - i - 1) + 1 > best && wildcardParents.contains(suffixFrom(i + 1)))
        best = (k - i - 1) + 1
      i += 1
    }
    if (k > best) suffixFrom(k - best - 1) else canon
  }
}

object PslRules {

  /** Dotted-quad IPv4 literal (all-numeric labels): never a DNS name —
    * reducing it to "the last two labels" would merge unrelated hosts
    * into one bogus domain bucket on IP-heavy crawl data. */
  private[graft] def isIpv4(host: String): Boolean = {
    var i = 0; var digits = 0; var dots = 0
    while (i < host.length) {
      val c = host.charAt(i)
      if (c == '.') { if (digits == 0) return false; dots += 1; digits = 0 }
      else if (c >= '0' && c <= '9') { digits += 1; if (digits > 3) return false }
      else return false
      i += 1
    }
    dots == 3 && digits > 0
  }

  /** Parse PSL rules from the published file format: one rule per line,
    * `//` comments and blank lines ignored, everything after the first
    * whitespace dropped (the spec's "up to the first whitespace"). Rules
    * are lowercased; leading dots stripped (some vendored copies carry
    * them). Both the ICANN and PRIVATE sections are loaded — pass a
    * pre-sliced iterator to restrict. */
  def fromLines(lines: IterableOnce[String]): PslRules = {
    val exact = new java.util.HashSet[String]()
    val wild = new java.util.HashSet[String]()
    val exc = new java.util.HashSet[String]()
    lines.iterator.foreach { raw =>
      val line = raw.trim.takeWhile(!_.isWhitespace)
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule = line.stripPrefix(".").toLowerCase(java.util.Locale.ROOT)
        if (rule.startsWith("!")) exc.add(rule.substring(1))
        else if (rule.startsWith("*.")) wild.add(rule.substring(2))
        else if (rule == "*") () // the implicit default rule; nothing to store
        else exact.add(rule)
      }
    }
    new PslRules(exact, wild, exc)
  }

  /** Load a vendored copy of the published list (e.g.
    * `public_suffix_list.dat`) from the local filesystem of the DRIVER —
    * the rule set is then shipped to executors inside the expression. */
  def fromFile(path: String): PslRules = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try fromLines(src.getLines()) finally src.close()
  }

  /** Documented SAMPLE of the real list — common two/three-level
    * registries, one wildcard family and its exceptions (the `.ck` rules
    * as published), and a private-section example (`github.io`). Tests
    * and small corpora only; vendor the full list for production crawls. */
  val Builtin: PslRules = fromLines(Seq(
    // ICANN section (excerpt)
    "com", "org", "net", "edu", "gov", "io",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "jp", "co.jp", "ne.jp", "or.jp", "kobe.jp",
    "au", "com.au", "net.au", "org.au",
    "sg", "com.sg", "edu.sg", "gov.sg",
    "br", "com.br", "cn", "com.cn", "mx", "com.mx",
    "in", "co.in", "kr", "co.kr", "za", "co.za",
    "*.ck", "!www.ck", // the published .ck family: wildcard + its exception
    // PRIVATE section (excerpt)
    "github.io", "blogspot.com"))
}

/** `psl_registered_domain(host)` — the PSL reduction as a native
  * codegen'd expression: per-row hash probes against a broadcast-by-
  * reference rule set, no join, no shuffle, NULL-safe. */
case class PslRegisteredDomain(child: Expression, rules: PslRules)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"psl_registered_domain requires string, got $other")
  }

  override protected def nullSafeEval(h: Any): Any =
    UTF8String.fromString(rules.registeredDomain(h.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pslRules", rules, classOf[PslRules].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString($ref.registeredDomain($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UrlFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** PSL-backed registered domain as a Column. */
  def pslRegisteredDomain(host: Column, rules: PslRules): Column =
    ColumnBridge.column(PslRegisteredDomain(ColumnBridge.expression(host), rules))
}
