package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain operators for web-corpus curation: extract URL mentions
  * from document text, parse hosts and naive registrable domains, and
  * filter the corpus against a domain blocklist — the RefinedWeb/C4-style
  * "URL filtering" stage (engine-native LLM-pipeline addition; the
  * reference's scope is validation-only).
  *
  * Everything is built from codegen'd built-ins (`regexp_extract_all`,
  * `regexp_extract`, `split`) in the Java∩RE2 regex dialect subset (no
  * lookaround, no backrefs) so the same patterns run identically in the
  * DuckDB oracle.
  *
  * Scale shape (the 100 TB plan):
  *  - extraction is row-local (one regex pass per doc, no shuffle);
  *  - [[urlMentions]] explodes to (doc, url) rows — output is bounded by
  *    mention count, and downstream aggregation by domain gets map-side
  *    combine before its one exchange;
  *  - [[filterBlockedDomains]] broadcasts the blocklist (blocklists are
  *    thousands-to-millions of rows — far under the broadcast threshold
  *    relative to a 10^12-doc corpus), derives blocked doc ids with a
  *    map-side broadcast semi-join, and anti-joins the corpus on doc_id;
  *    the only exchange is the doc_id anti-join, and AQE converts it to a
  *    broadcast anti-join whenever the blocked set is small.
  */
object UrlOps {

  /** URL pattern, Java∩RE2 dialect: scheme + non-space run, with trailing
    * sentence punctuation excluded so prose like "see https://x.com/p."
    * yields the URL without the final period.
    */
  val UrlRx = "https?://[^\\s]*[^\\s.,;:!?)\\]]"

  /** All URL mentions in a text column, in order. Row-local. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(UrlRx), lit(0))

  /** Host (authority minus port/userinfo is not modelled — crawl URLs in
    * practice carry neither; ports are excluded by the `:` stop class).
    * LOWERCASED and trailing-dot-stripped: DNS names are case-insensitive
    * and `host.` ≡ `host`, so a blocklist/cap keyed on the raw spelling
    * would be trivially bypassed by `Spam.BAD-ADS.net.`.
    */
  def hostOf(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "(?i)https?://([^/\\s:?#]+)", 1)),
      "\\.$", "")

  /** Canonical URL form for mention-level dedup and frontier keys:
    * scheme + host lowercased (path/query case-significant, preserved),
    * `#fragment` dropped, default ports (`:80` http, `:443` https)
    * dropped (non-default ports preserved), a bare root path `/`
    * dropped. Row-local chain of codegen'd regexes in the Java∩RE2
    * subset — mirrored verbatim by the q_url_canon oracle.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "(?i)^(https?)://", 1))
    // trailing-dot strip matches hostOf: `example.com.` ≡ `example.com` in
    // DNS, and a canonical key that distinguishes them would give the same
    // page two dedup/frontier identities
    val host = regexp_replace(
      lower(regexp_extract(url, "(?i)^https?://([^/:?#]+)", 1)), "\\.$", "")
    val port = regexp_extract(url, "(?i)^https?://[^/:?#]+:([0-9]+)", 1)
    val defaultPort = when(scheme === "https", "443").otherwise("80")
    val portPart = when(port =!= "" && port =!= defaultPort,
      concat(lit(":"), port)).otherwise(lit(""))
    // path+query: from the first / or ? after the authority, fragment cut
    val pq = regexp_extract(url, "(?i)^https?://[^/?#]*([^#]*)", 1)
    val pqNorm = when(pq === "/", lit("")).otherwise(pq)
    concat(scheme, lit("://"), host, portPart, pqNorm)
  }

  /** Naive registrable domain: the last two dot-labels of the host
    * (`a.b.example.com` → `example.com`). A production suffix list (PSL)
    * plugs in here as a broadcast lookup; the two-label rule is the
    * deterministic zero-external-data stand-in and is exact for the
    * `*.TLD` majority of crawl hosts.
    */
  def registrableDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    when(size(parts) <= 2, host)
      .otherwise(concat_ws(".", element_at(parts, -2), element_at(parts, -1)))
  }

  /** (id, url, host, domain) — one row per URL mention, document order
    * preserved by `url_idx`. One row-local regex pass, then posexplode.
    */
  def urlMentions(docs: DataFrame, id: String = "doc_id",
                  text: String = "text"): DataFrame =
    docs.select(col(id), posexplode(extractUrls(col(text))).as(Seq("url_idx", "url")))
      .withColumn("host", hostOf(col("url")))
      .withColumn("domain", registrableDomain(col("host")))

  /** (domain, n_mentions, n_docs) — corpus-level domain profile: how much
    * of the corpus links where. One exchange (groupBy domain) with
    * map-side combine; `n_docs` is exact-distinct (a second agg over the
    * same exchange, not a second shuffle).
    */
  def domainProfile(docs: DataFrame, id: String = "doc_id",
                    text: String = "text"): DataFrame =
    urlMentions(docs, id, text)
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_mentions"),
        countDistinct(col(id)).as("n_docs"))

  /** Domain-diversity cap (the RefinedWeb-style guard against one domain
    * flooding the corpus): keep at most `k` docs per registrable domain —
    * deterministically the lowest doc ids — where a doc's domain is that
    * of its FIRST URL mention. Docs with no URL mentions pass untouched.
    *
    * Scale shape: the rank is a window partitioned by domain; heavy-hitter
    * domains make single fat partitions, but each window state is one
    * counter and rows stream through it — and the window input is the
    * (doc, domain) projection, not the doc payloads. The payload-carrying
    * join is keyed on doc_id.
    */
  def capPerDomain(docs: DataFrame, k: Int, id: String = "doc_id",
                   text: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dom = urlMentions(docs, id, text)
      .filter(col("url_idx") === 0).select(col(id), col("domain"))
    val ranked = dom.withColumn("rk",
      row_number().over(Window.partitionBy(col("domain")).orderBy(col(id))))
    docs.join(ranked.select(col(id), col("rk")), Seq(id), "left")
      .filter(col("rk").isNull || col("rk") <= k)
      .drop("rk")
  }

  /** Documents whose text mentions NO blocklisted domain. `blocklist` is a
    * one-column (`domain`) frame, broadcast; docs with at least one
    * blocked mention are derived by a map-only broadcast semi-join and
    * removed with a doc_id anti-join.
    */
  def filterBlockedDomains(docs: DataFrame, blocklist: DataFrame,
                           id: String = "doc_id",
                           text: String = "text"): DataFrame = {
    val blockedDocs = urlMentions(docs, id, text)
      .join(broadcast(blocklist), Seq("domain"), "left_semi")
      .select(col(id)).distinct()
    docs.join(blockedDocs, Seq(id), "left_anti")
  }
}
