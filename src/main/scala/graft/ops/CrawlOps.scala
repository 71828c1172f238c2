package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-policy operators: robots.txt parsing and the allowed/blocked
  * gate — the "may we even use this URL" filter that runs before any
  * text ever enters a training corpus. Scope: the original
  * robots-exclusion convention (User-agent groups + Disallow prefix
  * rules), which is what compliance filtering needs; wildcard-pattern
  * and Allow-precedence extensions are documented out of scope.
  *
  * Parsing is RELATIONAL (lines → window attribution), not a per-host
  * UDF loop: at crawl scale there are millions of robots files, and the
  * parse is two narrow window passes over (host, line) rows.
  *
  * Group semantics implemented (the subset that is uniform across
  * public implementations): consecutive `User-agent:` lines form one
  * group header; the group's rules are the `Disallow:` lines that
  * follow until the next group starts; a rule binds the wildcard agent
  * iff its group's header names `*`. Empty `Disallow:` (allow-all) and
  * comment/blank lines are dropped.
  */
object CrawlOps {

  /** Wildcard-agent Disallow prefixes per host:
    * (host, prefix) — one row per `Disallow:` rule in a `User-agent: *`
    * group. Relational parse: posexplode lines, mark group headers
    * (a UA line whose predecessor is not a UA line starts a group),
    * running-sum group ids, then attribute each Disallow to its group
    * and keep groups whose header set contains `*`. */
  def robotsWildcardDisallows(robots: DataFrame, hostCol: String = "host",
      txtCol: String = "robots_txt"): DataFrame = {
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\n")).as(Seq("pos", "raw")))
      // strip comments, then whitespace — per the convention, `#` opens
      // a comment anywhere on the line
      .select(col("host"), col("pos"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(col("line") =!= "")
    val w = Window.partitionBy("host").orderBy("pos")
    val tagged = lines
      .withColumn("is_ua", col("line").rlike("(?i)^user-agent\\s*:"))
      .withColumn("ua_val",
        when(col("is_ua"),
          trim(regexp_extract(col("line"), "(?i)^user-agent\\s*:\\s*(\\S+)", 1))))
      .withColumn("dis_val",
        when(col("line").rlike("(?i)^disallow\\s*:"),
          trim(regexp_extract(col("line"), "(?i)^disallow\\s*:\\s*(\\S*)", 1))))
      // a UA line opens a NEW group only when the previous non-blank
      // line was not itself a UA line (consecutive UA lines share one
      // group header, per the convention)
      .withColumn("starts_group",
        col("is_ua") && !coalesce(lag(col("is_ua"), 1).over(w), lit(false)))
      .withColumn("group_id",
        sum(col("starts_group").cast("long")).over(w))
    val starGroups = tagged.filter(col("is_ua"))
      .groupBy("host", "group_id")
      .agg(max((col("ua_val") === "*").cast("int")).as("has_star"))
      .filter(col("has_star") === 1)
      .select("host", "group_id")
    tagged
      .filter(col("dis_val").isNotNull && col("dis_val") =!= "" &&
        col("group_id") > 0)
      .join(starGroups, Seq("host", "group_id"))
      .select(col("host"), col("dis_val").as("prefix"))
      .distinct()
  }

  /** Canonical URL form — the crawl-frontier/dedup key. Two URLs that
    * differ only in scheme/host case, an explicit default port, a
    * fragment, tracking parameters (utm_*, gclid, fbclid), or query
    * parameter ORDER are the same resource; canonicalizing before the
    * frontier's exact-dedup collapses them so the crawler neither
    * refetches nor double-counts. Normalizations applied:
    *   - scheme and host lowercased (path case is PRESERVED — paths
    *     are case-sensitive per the URI spec);
    *   - `:80` on http / `:443` on https dropped, other ports kept;
    *   - fragment dropped;
    *   - empty path becomes `/`;
    *   - tracking params removed, survivors sorted bytewise, `?`
    *     dropped when nothing survives.
    * Non-http(s) or unparseable input → NULL (filter upstream).
    * Dot-segment resolution (`/a/../b`) is documented out of scope —
    * servers disagree on it, so rewriting is not identity-safe.
    * Pure builtin expressions; the one lambda (`filter` over split
    * query params) runs per-URL on frontier-sized relations, never on
    * payload bytes. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "(?i)^([a-z][a-z0-9+.-]*)://", 1))
    val host = lower(regexp_extract(url, "(?i)^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1))
    val port = regexp_extract(url, "(?i)^[a-z][a-z0-9+.-]*://[^/:?#]+:(\\d+)", 1)
    val rest = regexp_extract(url, "(?i)^[a-z][a-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val keepPort = !(port === "" ||
      (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443"))
    val portPart = when(keepPort, concat(lit(":"), port)).otherwise(lit(""))
    val pathPart = when(path === "", lit("/")).otherwise(path)
    val kept = filter(split(query, "&"),
      p => !(p === "" || p.rlike("(?i)^(utm_[^=]*|gclid|fbclid)(=|$)")))
    val sortedQ = array_join(array_sort(kept), "&")
    val queryPart = when(query === "" || sortedQ === "", lit(""))
      .otherwise(concat(lit("?"), sortedQ))
    when(!scheme.isin("http", "https") || host === "",
      lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, pathPart, queryPart))
  }

  /** Gate pages against wildcard Disallow rules: `allowed` = no rule of
    * the page's host is a prefix of its path. Rules are host-keyed and
    * tiny relative to the crawl (a few per host) — the join fans each
    * page out only to its own host's rules, and AQE broadcasts the rule
    * side at real sizes; pages make exactly one pass. */
  def robotsGate(pages: DataFrame, rules: DataFrame,
      hostCol: String = "host", pathCol: String = "path"): DataFrame = {
    val pageCols = pages.columns.map(col).toSeq
    pages
      .join(rules.withColumnRenamed("host", hostCol), Seq(hostCol), "left")
      .withColumn("__hit",
        when(col("prefix").isNotNull &&
          col(pathCol).startsWith(col("prefix")), lit(1)).otherwise(lit(0)))
      .groupBy(pageCols: _*)
      .agg((max(col("__hit")) === 0).as("allowed"))
  }
}
