"""robots.txt parsing and URL admission — the crawl-compliance stage.

A pretraining crawl that ignores robots.txt is a liability; a compliant one
needs two distributed operations, both expressible as DataFrame ops over
the same WARC fetches the engine already ingests (robots bodies arrive as
ordinary ``response`` records for ``/robots.txt``):

- ``parse_robots``: robots payload text → one row per (host, agent,
  rule_type, path_prefix). The format is line-oriented with GROUP
  semantics — one or more ``User-agent`` lines followed by their rules —
  so parsing needs an ordered scan per file: ``posexplode`` the lines,
  then a per-host window carries the current agent set forward
  (``last(ignorenulls)``) — one narrow window per robots doc (docs are
  KB-sized; the window partitions by host, so 10M hosts parallelize).
- ``match_rules``: URLs × rules → ``allowed`` verdict per URL for a given
  agent, with modern (Google REP / RFC 9309) semantics: the most specific
  (longest-prefix) matching rule wins, Allow wins length ties, a
  specific-agent group SHADOWS the ``*`` group entirely, and a host with
  no rules is allowed. One equi-join on host (rules side is the tiny one —
  a few rules per host) and one ``max_by`` per URL. ``$`` end-anchors and
  ``*`` wildcards inside prefixes are supported via a regex translation
  done ONCE on the rules side.

Both stay JVM-side (regexp/window/join/max_by — no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIVE_RE = r"(?i)^\s*(user-agent|allow|disallow|crawl-delay)\s*:\s*([^#]*)"


def parse_robots(
    df: DataFrame, host_col: str = "host", payload_col: str = "robots_txt"
) -> DataFrame:
    """(host, agent, rule_type ∈ {allow, disallow}, path_prefix) rows from
    robots.txt bodies. Comments and unknown directives drop; an empty
    ``Disallow:`` (spec for "allow everything") yields no row — absence of
    rules IS permission in ``match_rules``. Consecutive ``User-agent``
    lines form one group sharing the rules that follow (REP group
    semantics); a rule line before any ``User-agent`` is ignored, per spec.

    Expects ONE robots payload per host — dedupe re-fetches upstream
    (latest by fetch time, e.g. ``streaming.cdc.cdc_snapshot`` keyed on
    host) or two fetches' lines would interleave in the group window.
    """
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(payload_col), r"\r?\n")).alias(
            "pos", "line"
        ),
    ).select(
        "host",
        "pos",
        F.lower(F.regexp_extract("line", _DIRECTIVE_RE, 1)).alias("directive"),
        F.trim(F.regexp_extract("line", _DIRECTIVE_RE, 2)).alias("arg"),
    ).filter(F.col("directive") != "")

    w = Window.partitionBy("host").orderBy("pos")
    # group id: a User-agent line that FOLLOWS a rule line starts a new
    # group; consecutive User-agent lines extend the current one
    is_ua = F.col("directive") == "user-agent"
    prev_ua = F.lag(is_ua, 1, False).over(w)
    group_start = is_ua & ~prev_ua
    grouped = lines.withColumn(
        "group_id", F.sum(group_start.cast("int")).over(w)
    )
    agents = (
        grouped.filter(is_ua)
        .select("host", "group_id", F.lower(F.col("arg")).alias("agent"))
        .distinct()
    )
    rules = grouped.filter(~is_ua & (F.col("arg") != "")).select(
        "host",
        "group_id",
        F.col("directive").alias("rule_type"),
        F.col("arg").alias("path_prefix"),
    )
    # rules join their group's agent set: a group with N agent lines emits
    # each rule once per agent — the flat shape match_rules consumes
    return agents.join(rules, ["host", "group_id"]).select(
        "host", "agent", "rule_type", "path_prefix"
    )


def match_rules(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """``urls`` + parsed ``rules`` → urls with an ``allowed`` boolean.

    RFC 9309 semantics: the group for ``agent`` (exact, lowercased) shadows
    the ``*`` group when it exists for that host; among matching rules the
    LONGEST path pattern wins, Allow beats Disallow on equal length; no
    matching rule (or no rules at all for the host) → allowed. ``*`` and
    trailing ``$`` in patterns are honored. All other url columns pass
    through, duplicate input rows included (the verdict aggregation keys on
    a synthetic row id, not the url columns, so it never collapses rows).

    Documented edge: shadowing keys on the specific group's
    allow/disallow rows — a specific group holding ONLY a (non-standard)
    Crawl-delay line falls back to the ``*`` group's path rules here,
    where a strict RFC 9309 reading would apply the specific group's
    empty rule set (allow all). The strict reading rewards crawlers for
    being named, which is rarely what an operator intended; fetchers that
    need it can pre-filter ``rules`` themselves."""
    from kafka_connector_s3_sink_spark.operators.urls import url_host

    agent = agent.lower()
    # rules-side working columns carry the reserved "_r_" prefix (same
    # convention as the urls-side _host/_path) so an input urls frame that
    # already has an is_allow/plen/pattern/host column never collides
    r = rules.filter(
        F.lower(F.col("agent")).isin(agent, "*")
        & F.col("rule_type").isin("allow", "disallow")
    ).select(
        F.col("host").alias("_r_host"),
        (F.lower(F.col("agent")) == agent).alias("_r_specific"),
        (F.col("rule_type") == "allow").alias("_r_is_allow"),
        F.length("path_prefix").alias("_r_plen"),
        F.concat(
            F.lit("^"),
            F.when(
                F.col("path_prefix").endswith("$"),
                F.concat(
                    _escape_then_wildcard(
                        F.expr(
                            "substring(path_prefix, 1, length(path_prefix) - 1)"
                        )
                    ),
                    F.lit("$"),
                ),
            ).otherwise(_escape_then_wildcard(F.col("path_prefix"))),
        ).alias("_r_pattern"),
    )
    # specific-agent shadowing: keep only the most specific agent tier that
    # exists per host
    tier = r.groupBy("_r_host").agg(F.max("_r_specific").alias("_has_specific"))
    r = r.join(tier, "_r_host").filter(
        F.col("_r_specific") == F.col("_has_specific")
    ).drop("_has_specific", "_r_specific")

    # a synthetic per-row id keys the verdict aggregation: grouping by the
    # url columns alone would silently collapse duplicate input rows (and
    # is what the id exists to prevent — duplicates pass through 1:1)
    u = (
        urls.withColumn("_row_id", F.monotonically_increasing_id())
        .withColumn("_host", url_host(F.col(url_col)))
        .withColumn(
            "_path",
            F.coalesce(
                F.nullif(
                    F.regexp_extract(
                        F.col(url_col),
                        r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)",
                        1,
                    ),
                    F.lit(""),
                ),
                F.lit("/"),
            ),
        )
    )
    joined = u.join(r, u["_host"] == r["_r_host"], "left").withColumn(
        # regexp_like (vs Column.rlike) accepts a per-row pattern COLUMN
        "_matches", F.regexp_like(F.col("_path"), F.col("_r_pattern"))
    )
    verdict = (
        joined.groupBy(F.col("_row_id"), *[u[c] for c in urls.columns])
        .agg(
            F.max_by(
                F.col("_r_is_allow"),
                F.when(
                    F.col("_matches"),
                    F.struct(
                        F.col("_r_plen").alias("l"),
                        F.col("_r_is_allow").cast("int").alias("a"),
                    ),
                ),
            ).alias("_best_allow")
        )
        .withColumn("allowed", F.coalesce(F.col("_best_allow"), F.lit(True)))
        .drop("_best_allow", "_row_id")
    )
    return verdict


def _escape_then_wildcard(col):
    """Escape regex metacharacters in a robots path, then translate the
    robots ``*`` wildcard to ``.*`` — order matters (``*`` must survive
    escaping as a marker, so it is excluded from the escape class)."""
    escaped = F.regexp_replace(col, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    return F.regexp_replace(escaped, r"\*", ".*")


def parse_sitemaps(
    df: DataFrame, host_col: str = "host", payload_col: str = "sitemap_xml"
) -> DataFrame:
    """(host, url, lastmod) rows from sitemap XML payloads (urlset or
    sitemapindex — both use ``<loc>``; index rows point at child sitemaps
    and re-enter this parser after fetch). Regex-grade extraction — the
    crawl-stage first pass, same trade as ``html_to_text``: one
    ``regexp_extract_all`` per document for locs, one anchored lookup per
    loc for its entry's lastmod; no XML parser in the hot path. CDATA and
    entity-encoded locs are decoded for the four entities sitemaps emit."""
    entry = F.regexp_extract_all(
        F.col(payload_col),
        # one <url>/<sitemap> entry: capture through its closing tag so the
        # per-entry lastmod stays associated with ITS loc
        F.lit(r"(?s)<(?:url|sitemap)\b[^>]*>(.*?)</(?:url|sitemap)>"),
        1,
    )
    exploded = df.select(
        F.col(host_col).alias("host"), F.explode(entry).alias("_entry")
    )
    loc = F.regexp_extract(
        "_entry", r"(?s)<loc\s*>\s*(?:<!\[CDATA\[)?\s*(.*?)\s*(?:\]\]>)?\s*</loc>", 1
    )
    lastmod = F.nullif(
        F.regexp_extract("_entry", r"(?s)<lastmod\s*>\s*(.*?)\s*</lastmod>", 1),
        F.lit(""),
    )
    unescaped = loc
    for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"')):
        unescaped = F.replace(unescaped, F.lit(ent), F.lit(ch))
    return exploded.select(
        "host",
        unescaped.alias("url"),
        lastmod.alias("lastmod"),
    ).filter(F.col("url") != "")


def crawl_delays(rules: DataFrame, agent: str = "*") -> DataFrame:
    """(host, delay_ms) from parsed ``Crawl-delay`` directives, with the
    same specific-agent-shadows-``*`` resolution as ``match_rules``
    (``max_by`` on the specificity flag; multiple delay lines in one tier
    keep the largest — the conservative read). Non-numeric args drop."""
    agent = agent.lower()
    d = rules.filter(
        (F.col("rule_type") == "crawl-delay")
        & F.lower(F.col("agent")).isin(agent, "*")
    ).select(
        "host",
        (F.lower(F.col("agent")) == agent).cast("int").alias("specific"),
        (F.col("path_prefix").try_cast("double") * 1000).alias("delay_ms"),
    ).filter(F.col("delay_ms").isNotNull())
    return (
        d.groupBy("host")
        .agg(
            F.max_by(
                F.col("delay_ms"),
                F.struct(F.col("specific"), F.col("delay_ms")),
            ).cast("long").alias("delay_ms")
        )
    )


def crawl_schedule(
    urls: DataFrame,
    url_col: str = "url",
    per_domain_slot_ms: int = 1000,
    delays: DataFrame | None = None,
) -> DataFrame:
    """Politeness schedule: per registrable domain, URLs get consecutive
    fetch slots ``slot_no`` and ``not_before_ms`` offsets (slot ×
    crawl-delay), so a fetcher fleet can partition by domain and replay the
    schedule without hammering any host. One window per domain (row_number
    over a deterministic hash order — no global sort).

    ``delays`` (optional, from ``crawl_delays``: (host, delay_ms)) overrides
    the default slot width per domain with the LARGEST delay any of the
    domain's hosts advertises — robots speak per host, politeness budgets
    per registrable domain, so the conservative max is the safe fold."""
    from kafka_connector_s3_sink_spark.operators.urls import (
        registrable_domain,
    )

    w = Window.partitionBy("domain").orderBy(F.md5(F.col(url_col)))
    out = (
        urls.withColumn("domain", registrable_domain(F.col(url_col)))
        .withColumn("slot_no", F.row_number().over(w) - 1)
    )
    if delays is None:
        return out.withColumn(
            "not_before_ms", F.col("slot_no") * F.lit(per_domain_slot_ms)
        )
    dom_delay = (
        delays.withColumn(
            "domain",
            registrable_domain(F.concat(F.lit("http://"), F.col("host"))),
        )
        .groupBy("domain")
        .agg(F.max("delay_ms").alias("_delay_ms"))
    )
    # no broadcast hint: the delay table scales with crawled-domain count
    # (forced broadcast = OOM at crawl scale); AQE broadcasts when small
    return (
        out.join(dom_delay, "domain", "left")
        .withColumn(
            "not_before_ms",
            F.col("slot_no")
            * F.coalesce(F.col("_delay_ms"), F.lit(per_domain_slot_ms)),
        )
        .drop("_delay_ms")
    )
