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
    * (`sub.site.co.uk` → `site.co.uk`); a label-less host passes through. */
  def registeredDomain(
      hostCol: Column,
      twoLevelSuffixes: Seq[String] = TwoLevelSuffixes): Column = {
    val ls = split(hostCol, "\\.")
    val n = size(ls)
    val last2 = concat_ws(".", element_at(ls, -2), element_at(ls, -1))
    val last3 = concat_ws(".", element_at(ls, -3), element_at(ls, -2), element_at(ls, -1))
    when(n >= 3 && last2.isin(twoLevelSuffixes: _*), last3)
      .when(n >= 2, last2)
      .otherwise(hostCol)
  }
}
