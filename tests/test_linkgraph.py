"""Crawl link-graph analytics (`operators/linkgraph.py`): href extraction
and resolution, host-level aggregation, and PageRank mass conservation /
ranking behavior."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark.operators.linkgraph import (
    extract_links,
    host_graph,
    pagerank,
)


def test_extract_links_resolution_shapes(spark):
    html = (
        '<a href="https://other.example/abs">abs</a>'
        "<a href='//proto.example/pr'>proto</a>"
        '<a HREF="/root-rel">root</a>'
        '<a href="sibling.html">rel</a>'
        '<a href="page.html#frag">fragment stripped</a>'
        '<a href="?q=1&amp;r=2">entity decoded</a>'
        '<a href="mailto:x@y.example">skip</a>'
        '<a href="javascript:void(0)">skip</a>'
        '<a href="">skip empty</a>'
    )
    df = spark.createDataFrame(
        [Row(url="https://base.example/dir/page.html", html=html)]
    )
    got = sorted(r["dst_url"] for r in extract_links(df).collect())
    assert got == sorted(
        [
            "https://other.example/abs",
            "https://proto.example/pr",
            "https://base.example/root-rel",
            "https://base.example/dir/sibling.html",
            "https://base.example/dir/page.html",       # fragment stripped
            "https://base.example/dir/?q=1&r=2",        # &amp; decoded
        ]
    )
    # a relative base has nothing to resolve against -> row drops
    rel = spark.createDataFrame([Row(url="/not/absolute", html='<a href="x">y</a>')])
    assert extract_links(rel).count() == 0


def test_host_graph_weights_and_self_loops(spark):
    links = spark.createDataFrame(
        [
            Row(src_url="https://a.example/1", dst_url="https://b.example/x"),
            Row(src_url="https://a.example/2", dst_url="https://b.example/y"),
            Row(src_url="https://a.example/1", dst_url="https://a.example/self"),
            Row(src_url="https://a.example/1", dst_url="not-a-url"),  # drops
        ]
    )
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_graph(links).collect()
    }
    assert got == {
        ("a.example", "b.example"): 2,
        ("a.example", "a.example"): 1,
    }


def test_pagerank_mass_and_ordering(spark):
    """Star graph: every spoke links to the hub, hub links to one spoke.
    The hub must rank first; total rank mass stays 1 (dangling handled);
    more iterations concentrate more mass on the hub."""
    edges = spark.createDataFrame(
        [Row(src_host=f"s{i}.ex", dst_host="hub.ex", n_links=1) for i in range(4)]
        + [Row(src_host="hub.ex", dst_host="s0.ex", n_links=1)]
    )
    pr = {r["node"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    assert len(pr) == 5
    assert abs(sum(pr.values()) - 1.0) < 1e-9          # mass conserved
    assert max(pr, key=pr.get) == "hub.ex"
    assert pr["s0.ex"] > pr["s1.ex"]                   # hub's endorsement counts
    assert abs(pr["s1.ex"] - pr["s3.ex"]) < 1e-12      # symmetric spokes tie


def test_pagerank_dangling_node_redistributes(spark):
    """b has no out-edges: its mass must re-enter uniformly, not vanish."""
    edges = spark.createDataFrame([Row(src_host="a", dst_host="b", n_links=3)])
    pr = {r["node"]: r["rank"] for r in pagerank(edges, iterations=10).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    assert pr["b"] > pr["a"]                           # b receives, a only leaks


def test_pagerank_weighted_split(spark):
    """Out-weight normalization: a 3:1 weighted fan-out sends 3x the mass."""
    edges = spark.createDataFrame(
        [
            Row(src_host="a", dst_host="b", n_links=3),
            Row(src_host="a", dst_host="c", n_links=1),
            Row(src_host="b", dst_host="a", n_links=1),
            Row(src_host="c", dst_host="a", n_links=1),
        ]
    )
    pr = {r["node"]: r["rank"] for r in pagerank(edges, iterations=8).collect()}
    assert pr["b"] > pr["c"]
    ratio = (pr["b"] - 0.15 / 3) / (pr["c"] - 0.15 / 3)
    assert ratio > 1.5  # weighted contribution dominates the teleport floor
