package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the standard first
  * step of URL-level dedup in CommonCrawl-style pipelines (dedup by
  * canonical URL before any content hashing; cf. the reference's
  * normalize-then-join discipline for text keys, `code/recipes.py`
  * normalization steps around :1742).
  *
  * Everything here is pure `Column` arithmetic (regexp + array ops —
  * native Catalyst expressions throughout, no UDF; the param-sort
  * lambdas are higher-order functions, which stay native but outside
  * whole-stage codegen): row-local, shuffle-free, and replayable in an
  * external SQL engine — q69 hash-checks the normalizer against an
  * INDEPENDENT closed-form spelling of its expected output, not a
  * re-run of the same code.
  *
  * Canonical form (each choice is the common pipeline convention):
  *   - scheme and host lowercased; path/query case PRESERVED
  *     (paths are case-sensitive by spec)
  *   - userinfo (`user:password@`) dropped
  *   - every leading `www.` stripped from the host (all of them, not
  *     one — canonical output must be its own fixed point, see
  *     the idempotence property test)
  *   - default ports dropped (`:80` http, `:443` https); explicit
  *     non-default ports kept
  *   - fragment dropped
  *   - tracking params dropped (`utm_*`, `gclid`, `fbclid`,
  *     `msclkid`, `igshid`, `mc_eid`), remaining params sorted
  *     lexicographically (order never carries meaning in practice,
  *     and sorting makes equal-content URLs string-equal)
  *   - empty path → `/`
  * Non-URLs (no `scheme://`) normalize to NULL — bad rows are data,
  * not errors, same contract as the media codecs. */
object UrlTools {

  private val trackingRe =
    "^(utm_[^=]*|gclid|fbclid|msclkid|igshid|mc_eid)="

  /** Multi-part public suffixes recognized by [[registeredDomain]].
    * A short built-in list of the common ccTLD second levels — the
    * full public-suffix list is a deployment-provided table; this
    * covers the pipeline-test surface and documents the extension
    * point. */
  private val multiPartTlds = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "co.jp", "co.in", "co.kr", "co.za",
    "com.au", "com.br", "com.cn", "com.mx", "com.tr", "com.sg")

  private def afterScheme(c: Column): Column =
    regexp_replace(c, "^[A-Za-z][A-Za-z0-9+.-]*://", "")

  private def hostPort(c: Column): Column =
    regexp_extract(afterScheme(c), "^([^/?#]*)", 1)

  /** Host cleanup shared by [[host]] and [[normalizeUrl]]: drop
    * userinfo (`user:pass@` — canonical URLs carry no credentials),
    * lowercase, strip the port and EVERY leading `www.` (`(www\.)+`,
    * not one: canonicalization must be idempotent — its output must be
    * its own fixed point, or url-dedup of already-canonical data would
    * disagree with url-dedup of raw data). */
  private def cleanHost(hp: Column): Column =
    regexp_replace(regexp_replace(
      lower(regexp_replace(hp, "^[^@/]*@", "")), ":\\d+$", ""),
      "^(www\\.)+", "")

  /** Lowercased host without userinfo, port, or leading `www.`s. */
  def host(url: Column): Column = {
    val t = trim(url)
    when(regexp_extract(t, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1) === "",
      lit(null).cast("string"))
      .otherwise(cleanHost(hostPort(t)))
  }

  /** Canonical URL (see object doc) or NULL for non-URLs. */
  def normalizeUrl(url: Column): Column = {
    val t = trim(url)
    val scheme = lower(regexp_extract(t, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    // (?s): Java-regex '.' excludes newlines by default, so a fragment
    // containing one (messy web data) would leak '#…' into the
    // canonical form and break the no-fragment invariant
    val noFrag = regexp_replace(afterScheme(t), "(?s)#.*$", "")
    val hp = regexp_extract(noFrag, "^([^/?]*)", 1)
    val pathQuery = substr(noFrag, length(hp) + 1)
    val path0 = regexp_extract(pathQuery, "^([^?]*)", 1)
    val query = when(contains(pathQuery, lit("?")),
      regexp_replace(pathQuery, "^[^?]*\\?", "")).otherwise(lit(""))
    val port = regexp_extract(lower(hp), ":(\\d+)$", 1)
    val h = cleanHost(hp)
    val defPort = when(scheme === "http", "80")
      .when(scheme === "https", "443").otherwise(lit(""))
    val portPart = when(port === "" || port === defPort, "")
      .otherwise(concat(lit(":"), port))
    val params = sort_array(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackingRe)))
    val queryPart = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    val pathPart = when(path0 === "", "/").otherwise(path0)
    when(scheme === "" || h === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), h, portPart, pathPart, queryPart))
  }

  /** Registered (pay-level) domain of a URL: last two host labels, or
    * last three when the last two are a known multi-part public suffix
    * ([[multiPartTlds]]). NULL for non-URLs. */
  def registeredDomain(url: Column): Column = {
    val h = host(url)
    val labels = split(h, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val tlds = array(multiPartTlds.map(lit): _*)
    when(h.isNull, lit(null).cast("string"))
      .when(n >= 3 && array_contains(tlds, lastTwo),
        concat_ws(".", element_at(labels, -3), lastTwo))
      .when(n >= 2, lastTwo)
      .otherwise(h)
  }

  /** Canonical-URL exact dedup groups: one row per canonical URL with
    * the minimum id as keeper and the copy count — URL-level dedup
    * before any content processing. One groupBy on the canonical
    * string; NULL canonicals (non-URLs) group together under NULL so
    * nothing is silently dropped. */
  def urlDedupGroups(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), normalizeUrl(col(urlCol)).as("url_norm"))
      .groupBy("url_norm")
      .agg(min(idCol).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Drop rows whose canonical URL repeats, keeping the minimum id per
    * canonical form (deterministic). Rows whose URL does not normalize
    * (NULL canonical) are ALL kept — a malformed URL is not a duplicate
    * of every other malformed URL; the shared exact-key keeper contract
    * (Dedup.keepMinPerKey). */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    graft.dedup.Dedup.keepMinPerKey(df, idCol, normalizeUrl(col(urlCol)))
}
