"""robots.txt compliance (`operators/robots.py`): REP group parsing,
longest-match admission with Allow-wins-ties and specific-agent shadowing,
wildcard/anchor patterns, and the per-domain politeness schedule."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark.operators.robots import (
    crawl_schedule,
    match_rules,
    parse_robots,
)

ROBOTS_A = "\n".join([
    "# comment only",
    "User-agent: *",
    "Disallow: /private/",
    "Allow: /private/ok/",
    "Disallow: /tmp",
    "",
    "User-agent: niceBot",
    "User-agent: otherbot",
    "Disallow: /nice-only/",
])

ROBOTS_B = "\r\n".join([
    "User-agent: *",
    "Disallow: /*.pdf$",
    "Disallow: /cgi/*/run",
    "Disallow:",          # empty = allow everything (no rule emitted)
    "Sitemap: https://b.example/sitemap.xml",  # unknown directive ignored
])


@pytest.fixture(scope="module")
def rules(spark):
    df = spark.createDataFrame(
        [Row(host="a.example", robots_txt=ROBOTS_A),
         Row(host="b.example", robots_txt=ROBOTS_B)]
    )
    return parse_robots(df).cache()


def test_parse_groups_and_directives(rules):
    got = {(r["host"], r["agent"], r["rule_type"], r["path_prefix"])
           for r in rules.collect()}
    assert ("a.example", "*", "disallow", "/private/") in got
    assert ("a.example", "*", "allow", "/private/ok/") in got
    # both consecutive User-agent lines share the group's rule
    assert ("a.example", "nicebot", "disallow", "/nice-only/") in got
    assert ("a.example", "otherbot", "disallow", "/nice-only/") in got
    # nicebot group does NOT inherit the * group's rules at parse level
    assert ("a.example", "nicebot", "disallow", "/private/") not in got
    # empty Disallow and unknown directives emit nothing
    assert not any(h == "b.example" and p == "" for h, _, _, p in got)
    assert not any("sitemap" in (p or "") for *_, p in got)


def test_match_longest_wins_allow_breaks_ties(spark, rules):
    urls = spark.createDataFrame([
        Row(url="https://a.example/private/x"),        # disallow /private/
        Row(url="https://a.example/private/ok/x"),     # allow (longer)
        Row(url="https://a.example/tmpfile"),          # /tmp prefix matches
        Row(url="https://a.example/public/x"),         # no rule -> allowed
        Row(url="https://unknown.example/anything"),   # no robots -> allowed
        Row(url="https://a.example/"),                 # root -> allowed
    ])
    got = {r["url"]: r["allowed"]
           for r in match_rules(urls, rules, agent="someBot").collect()}
    assert got == {
        "https://a.example/private/x": False,
        "https://a.example/private/ok/x": True,
        "https://a.example/tmpfile": False,
        "https://a.example/public/x": True,
        "https://unknown.example/anything": True,
        "https://a.example/": True,
    }


def test_specific_agent_shadows_star(spark, rules):
    urls = spark.createDataFrame([
        Row(url="https://a.example/private/x"),   # * disallows; nicebot group silent
        Row(url="https://a.example/nice-only/x"), # nicebot disallows
    ])
    got = {r["url"]: r["allowed"]
           for r in match_rules(urls, rules, agent="NiceBot").collect()}
    # the nicebot group exists for the host, so the * group is shadowed
    assert got["https://a.example/private/x"] is True
    assert got["https://a.example/nice-only/x"] is False


def test_wildcard_and_anchor_patterns(spark, rules):
    urls = spark.createDataFrame([
        Row(url="https://b.example/docs/report.pdf"),      # *.pdf$ -> blocked
        Row(url="https://b.example/docs/report.pdf.html"), # $ anchor -> ok
        Row(url="https://b.example/cgi/v2/run"),           # /cgi/*/run -> blocked
        Row(url="https://b.example/cgi/run"),              # wildcard spans 1+ seg? '*' spans '' too
    ])
    got = {r["url"]: r["allowed"] for r in match_rules(urls, rules).collect()}
    assert got["https://b.example/docs/report.pdf"] is False
    assert got["https://b.example/docs/report.pdf.html"] is True
    assert got["https://b.example/cgi/v2/run"] is False
    # '*' matches the empty string per REP: /cgi//run would match, /cgi/run
    # does NOT (the literal '/' on both sides of '*' must both appear)
    assert got["https://b.example/cgi/run"] is True


def test_crawl_schedule_politeness(spark):
    # subdomains of one registrable domain share its budget (that IS the
    # politeness unit), so use two distinct registrable domains
    urls = spark.createDataFrame(
        [Row(url=f"https://sub.site{i % 2}.com/p/{i}") for i in range(10)]
    )
    sched = crawl_schedule(urls, per_domain_slot_ms=500).collect()
    by_domain: dict = {}
    for r in sched:
        by_domain.setdefault(r["domain"], []).append(
            (r["slot_no"], r["not_before_ms"])
        )
    assert set(by_domain) == {"site0.com", "site1.com"}
    for slots in by_domain.values():
        nos = sorted(n for n, _ in slots)
        assert nos == list(range(5))  # consecutive slots per domain
        assert all(ms == n * 500 for n, ms in slots)
    # deterministic: a second run yields the identical schedule
    again = crawl_schedule(urls, per_domain_slot_ms=500).collect()
    assert {(r["url"], r["slot_no"]) for r in again} == {
        (r["url"], r["slot_no"]) for r in sched
    }


def test_crawl_delay_directive_flows_into_schedule(spark):
    """Crawl-delay parses per REP tier (specific agent shadows '*'),
    folds conservatively to the registrable domain, and widens the
    schedule's slot spacing; hosts without a delay keep the default."""
    from pyspark.sql import Row

    from kafka_connector_s3_sink_spark.operators.robots import crawl_delays

    robots = "\n".join([
        "User-agent: *",
        "Crawl-delay: 2",
        "Disallow: /x/",
        "User-agent: fastbot",
        "Crawl-delay: 0.5",
    ])
    rules = parse_robots(
        spark.createDataFrame([Row(host="www.site0.com", robots_txt=robots)])
    )
    # crawl-delay rows never leak into admission decisions
    admitted = match_rules(
        spark.createDataFrame([Row(url="https://www.site0.com/ok")]), rules
    ).collect()
    assert admitted[0]["allowed"] is True

    star = {r["host"]: r["delay_ms"] for r in crawl_delays(rules).collect()}
    fast = {r["host"]: r["delay_ms"]
            for r in crawl_delays(rules, agent="FastBot").collect()}
    assert star == {"www.site0.com": 2000}
    assert fast == {"www.site0.com": 500}

    urls = spark.createDataFrame(
        [Row(url=f"https://www.site0.com/p/{i}") for i in range(3)]
        + [Row(url=f"https://other.org/p/{i}") for i in range(3)]
    )
    sched = crawl_schedule(urls, per_domain_slot_ms=100,
                           delays=crawl_delays(rules)).collect()
    by = {}
    for r in sched:
        by.setdefault(r["domain"], []).append(r["not_before_ms"])
    assert sorted(by["site0.com"]) == [0, 2000, 4000]   # robots delay
    assert sorted(by["other.org"]) == [0, 100, 200]     # default spacing


def test_parse_sitemaps(spark):
    """urlset + sitemapindex payloads: per-entry loc/lastmod association,
    CDATA and entity unescaping, whitespace tolerance."""
    from kafka_connector_s3_sink_spark.operators.robots import parse_sitemaps

    urlset = """<?xml version="1.0" encoding="UTF-8"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>https://a.example/p?x=1&amp;y=2</loc>
           <lastmod>2024-03-01</lastmod><priority>0.8</priority></url>
      <url><loc>
            https://a.example/q
          </loc></url>
      <url><loc><![CDATA[https://a.example/cdata?a=1&b=2]]></loc>
           <lastmod>2024-04-02T10:00:00Z</lastmod></url>
    </urlset>"""
    index = """<sitemapindex>
      <sitemap><loc>https://b.example/sitemap-1.xml</loc>
               <lastmod>2024-01-01</lastmod></sitemap>
      <sitemap><loc>https://b.example/sitemap-2.xml</loc></sitemap>
    </sitemapindex>"""
    df = spark.createDataFrame(
        [Row(host="a.example", sitemap_xml=urlset),
         Row(host="b.example", sitemap_xml=index)]
    )
    got = {(r["host"], r["url"]): r["lastmod"]
           for r in parse_sitemaps(df).collect()}
    assert got == {
        ("a.example", "https://a.example/p?x=1&y=2"): "2024-03-01",
        ("a.example", "https://a.example/q"): None,
        ("a.example", "https://a.example/cdata?a=1&b=2"): "2024-04-02T10:00:00Z",
        ("b.example", "https://b.example/sitemap-1.xml"): "2024-01-01",
        ("b.example", "https://b.example/sitemap-2.xml"): None,
    }


def test_match_rules_preserves_duplicates_and_colliding_columns(spark, rules):
    """r7 advice fix: duplicate url rows pass through 1:1 (the verdict
    aggregation keys on a synthetic row id, not the url columns), and a
    urls frame that already carries columns named like the rules-side
    working columns (host/is_allow/plen/pattern) resolves unambiguously."""
    urls = spark.createDataFrame(
        [
            # exact duplicate rows — must both survive
            Row(url="https://a.example/private/x", host="payload-host",
                is_allow="user-data", plen=7, pattern="user-pat"),
            Row(url="https://a.example/private/x", host="payload-host",
                is_allow="user-data", plen=7, pattern="user-pat"),
            Row(url="https://a.example/public/x", host="other",
                is_allow="z", plen=1, pattern="p"),
        ]
    )
    got = match_rules(urls, rules, agent="someBot").collect()
    assert len(got) == 3  # duplicates preserved
    by_url = {}
    for r in got:
        by_url.setdefault(r["url"], []).append(r)
    assert len(by_url["https://a.example/private/x"]) == 2
    for r in by_url["https://a.example/private/x"]:
        assert r["allowed"] is False
        # user columns pass through untouched
        assert r["host"] == "payload-host"
        assert r["is_allow"] == "user-data"
        assert r["plen"] == 7 and r["pattern"] == "user-pat"
    assert by_url["https://a.example/public/x"][0]["allowed"] is True
