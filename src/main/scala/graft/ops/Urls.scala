package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL decomposition for crawl curation — the per-domain stage every
  * C4/Dolma-style pipeline runs between WARC ingest and text cleaning:
  * split the record URL into scheme/host/path, reduce the host to its
  * REGISTERED domain, then cap or mix per domain (compose with
  * [[Selection.topKPerGroup]] / [[Sampling]]).
  *
  * Pure `regexp_extract`/`split` Column algebra (codegen'd, zero shuffle,
  * RE2-safe patterns transcribed verbatim into the DuckDB oracle).
  * Contract: inputs are ABSOLUTE URLs; a non-URL string yields empty
  * fields rather than erroring (scrubbing semantics — filter on
  * `host =!= ""` to drop them).
  *
  * [[registeredDomain]] uses an explicit two-level-suffix SUBSET, not the
  * full Public Suffix List (this library has no egress and vendoring the
  * PSL is a policy decision, not an engine one) — callers with broader
  * corpora pass their own `twoLevelSuffixes`. */
object Urls {

  /** Two-level public suffixes recognized by default — the common
    * country-code second-level registries. Extend per corpus. */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za")

  private val AuthorityRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"

  /** URI scheme, lowercased (`https` for `HTTPS://…`); '' if absent. */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))

  /** Hostname, lowercased, userinfo and port stripped. */
  def host(url: Column): Column =
    lower(regexp_replace(
      regexp_replace(regexp_extract(url, AuthorityRe, 1), "^[^@]*@", ""),
      ":[0-9]*$", ""))

  /** Path component ('' when the URL has none — no '/' normalization, the
    * raw bytes are what dedup keys want). */
  def path(url: Column): Column =
    regexp_extract(url, AuthorityRe + "([^?#]*)", 2)

  /** The registered (pay-level) domain of a hostname: the last two labels,
    * or the last three when the last two are a known two-level suffix
    * (`sub.site.co.uk` → `site.co.uk`); a label-less host passes through,
    * as do IP literals (IPv4 dotted quads, bracketed IPv6) — an address is
    * not a domain, and reducing `192.0.2.1` to `2.1` would merge unrelated
    * IP hosts into one bogus cap bucket on IP-heavy crawl data.
    *
    * For real crawls use [[registeredDomainPsl]], which applies the full
    * Public Suffix List algorithm (wildcards, exceptions, arbitrary-depth
    * suffixes) from a vendored rule file. */
  def registeredDomain(
      hostCol: Column,
      twoLevelSuffixes: Seq[String] = TwoLevelSuffixes): Column = {
    val ls = split(hostCol, "\\.")
    val n = size(ls)
    val last2 = concat_ws(".", element_at(ls, -2), element_at(ls, -1))
    val last3 = concat_ws(".", element_at(ls, -3), element_at(ls, -2), element_at(ls, -1))
    when(hostCol.rlike("^(\\[|([0-9]{1,3}\\.){3}[0-9]{1,3}$)"), hostCol)
      .when(n >= 3 && last2.isin(twoLevelSuffixes: _*), last3)
      .when(n >= 2, last2)
      .otherwise(hostCol)
  }

  /** Query parameters dropped by [[normalizeUrl]] — the cross-site
    * tracking params every crawl-dedup normalizer strips (they vary per
    * click, not per document): `utm_*` campaign tags and the common
    * click-id params. Anchored prefix-of-param match (`name=` or bare
    * `name`). */
  val TrackingParamRe: String = "^(utm_[^=&]*|fbclid|gclid|msclkid|ref)(=|$)"

  /** Canonical form of an absolute URL for URL-keyed crawl dedup — the
    * RFC 3986 §6 normalizations that preserve the resource identity, plus
    * the tracking-param strip every production crawl pipeline applies:
    *
    *   - scheme and host lowercased; userinfo dropped; ONE trailing host
    *     dot stripped (`example.com.` ≡ `example.com`, the FQDN form);
    *   - default ports dropped (`:80` for http, `:443` for https); other
    *     ports kept;
    *   - trailing path slashes stripped (`/a/` ≡ `/a`, `/` ≡ '');
    *   - fragment dropped (client-side only — never reaches the server);
    *   - query params split on `&`, empties and [[TrackingParamRe]]
    *     matches dropped, the rest SORTED lexicographically and rejoined
    *     (param order is transport noise);
    *   - a string with no scheme or no host yields NULL (not a URL — the
    *     [[graft.ops.Dedup.dropByUrl]] contract passes such rows through).
    *
    * Pure codegen'd Column algebra (RE2-safe patterns + array HOFs),
    * transcribed verbatim into the DuckDB oracle. Zero shuffle — a 100 TB
    * crawl normalizes inside its scan projection. */
  def normalizeUrl(url: Column): Column = {
    val sch = scheme(url)
    val noUser = regexp_replace(regexp_extract(url, AuthorityRe, 1), "^[^@]*@", "")
    val h = regexp_replace(lower(regexp_replace(noUser, ":[0-9]*$", "")), "\\.$", "")
    val port = regexp_extract(noUser, ":([0-9]+)$", 1)
    val portPart = when(port === "" ||
        (sch === "http" && port === "80") ||
        (sch === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val p = regexp_replace(path(url), "/+$", "")
    // fragment strips FIRST so a '?' inside the fragment is never a query
    val preFrag = regexp_extract(url, "^([^#]*)", 1)
    val q = regexp_extract(preFrag, "\\?(.*)$", 1)
    val params = filter(split(q, "&"),
      x => length(x) > 0 && !x.rlike(TrackingParamRe))
    val qs = array_join(array_sort(params), "&")
    when(sch === "" || h === "", lit(null).cast("string"))
      .otherwise(concat(sch, lit("://"), h, portPart, p,
        when(qs =!= "", concat(lit("?"), qs)).otherwise(lit(""))))
  }

  /** The registered domain under a full Public Suffix List rule set —
    * wildcard (`*.ck`) and exception (`!www.ck`) semantics included, per
    * the publicsuffix.org algorithm. A host that IS a public suffix, an
    * IP literal, or label-less passes through unchanged (same scrubbing
    * convention as [[registeredDomain]]). Load a vendored list with
    * [[graft.functions.PslRules.fromFile]]; `PslRules.Builtin` is a
    * documented sample for tests. Native codegen'd expression — per-row
    * hash probes, no join, no shuffle. */
  def registeredDomainPsl(
      hostCol: Column,
      rules: graft.functions.PslRules = graft.functions.PslRules.Builtin): Column =
    graft.functions.UrlFunctions.pslRegisteredDomain(hostCol, rules)
}
