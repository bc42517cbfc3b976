"""r15 optimization-round pins (OPTIMIZATION_r15.md).

Three internals changed for performance and must stay result-identical:

1. ``dedup.connected_components`` — the fixpoint check now rides the
   propagation aggregate (the previous label travels as a second ``min``
   column) instead of a per-round join of new labels against old. Pins:
   exact clusters on a diameter-3 multi-component graph, the rounds
   instrumentation, and the legacy semantics for edge endpoints outside
   the node set (the equivalence argument for the rewrite relies on it).
2. ``quality_clf`` (text_corpus_stats branch) — the classifier score is
   named in an inner projection so the feature->dot->sigmoid tree is
   evaluated once per row, not once per metric column. Pin: the physical
   plan contains the sigmoid exactly once (codegen's subexpression
   elimination can NOT merge lambda-bearing trees, so a second textual
   instance means a second evaluation).
3. ``_q_dedup_clusters`` / ``q_pipeline_pack_split`` construct their
   independent eager branches on two driver threads (guide §2.6). Pins
   live in the oracle gate (results identical); here we only assert the
   thread-built entry still carries every branch tag.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _cc(spark, node_ids, pair_tuples, **kw):
    from kafka_connector_s3_sink_spark.operators import dedup

    nodes = spark.createDataFrame([(i,) for i in node_ids], ["doc_id"])
    pairs = spark.createDataFrame(pair_tuples, ["id1", "id2"])
    stats = {}
    out = {
        r.doc_id: (r.cluster_id, r.is_canonical)
        for r in dedup.connected_components(
            nodes, pairs, stats=stats, **kw
        ).collect()
    }
    return out, stats


def test_cc_diameter3_chain_exact_clusters(spark):
    """A 5-node path (diameter 4 as a graph, 4 propagation hops from the
    max id to the min) plus a separate triangle and two singletons: the
    fused-fixpoint rewrite must produce exactly the min-id clusters and
    converge in hops+1 rounds (the +1 is the fixpoint-confirm round)."""
    nodes = [10, 11, 12, 13, 14, 20, 21, 22, 30, 31]
    pairs = [
        (10, 11), (11, 12), (12, 13), (13, 14),  # path: min 10 at one end
        (20, 21), (21, 22), (20, 22),            # triangle
    ]
    out, stats = _cc(spark, nodes, pairs)
    assert out == {
        10: (10, 1), 11: (10, 0), 12: (10, 0), 13: (10, 0), 14: (10, 0),
        20: (20, 1), 21: (20, 0), 22: (20, 0),
        30: (30, 1), 31: (31, 1),
    }
    # label 10 reaches node 14 in 4 rounds; round 5 confirms the fixpoint
    assert stats == {"rounds": 5}


def test_cc_changed_count_excludes_ids_new_this_round(spark):
    """Legacy semantics pin: an edge endpoint OUTSIDE the node set joins
    the label table (it receives messages) but its first appearance does
    not count as a change — the old implementation's inner join between
    new and old labels excluded it, and the rewrite's null-old filter must
    too. Consequence (pinned): propagation does not continue THROUGH the
    outside endpoint once every proper node is stable."""
    out, stats = _cc(spark, [1, 5], [(1, 9), (9, 5)])
    # 9 is not a node: round 1 labels it min(1,5)=1, nodes 1 and 5 are
    # unchanged, fixpoint declared -> 5 keeps its own label (the legacy
    # contract for out-of-node-set endpoints; callers pass closed sets)
    assert out == {1: (1, 1), 5: (5, 1), 9: (1, 0)}
    assert stats == {"rounds": 1}


def test_cc_max_iterations_respected(spark):
    """max_iterations still bounds the loop (no fixpoint reached)."""
    nodes = list(range(6))
    pairs = [(i, i + 1) for i in range(5)]
    out, stats = _cc(spark, nodes, pairs, max_iterations=2)
    assert stats == {"rounds": 2}
    # after 2 rounds the label 0 has traveled at most 2 hops
    assert out[2] == (0, 0) and out[5] != (0, 0)


def test_quality_clf_scored_once_in_plan(spark):
    """The classifier sigmoid must appear exactly ONCE in the optimized
    plan of the quality_clf branch: lambda-bearing expression trees are
    excluded from codegen subexpression elimination, so each textual
    instance in a Project is a real per-row evaluation. Two instances =
    the r14 shape (score computed per metric column) regressed."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["text_corpus_stats"](spark, "/root/testdata/sf0.001")
    branch = df.filter(F.col("branch") == "quality_clf")
    # r16 (ADVICE r15): count in explain('formatted') — its details section
    # prints full expressions, where executedPlan().toString() truncates
    # long trees via maxToStringFields and can hide (or split) the match.
    # The sigmoid's EXP( is the structural marker: the only EXP in this
    # branch's plan (the other exp()-bearing branches are pruned by the
    # literal filter), so one occurrence = one per-row evaluation.
    plan = branch._sc._jvm.PythonSQLUtils.explainString(
        branch._jdf.queryExecution(), "formatted"
    )
    assert plan.count("EXP(") == 1, (
        "classifier score evaluated more than once per row:\n" + plan
    )
    entrymod.release_caches()


def test_classifier_score_rows_bit_identical_to_column_form(spark):
    """The barrier-materialized frame scorer must be BIT-identical to the
    Column form (same expressions, same fold order) — only the evaluation
    count changes (hashing once per row instead of once per bucket filter)."""
    from kafka_connector_s3_sink_spark.operators.quality import (
        PINNED_WEIGHTS_V1,
        classifier_score,
        classifier_score_rows,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = docs.select(
        "doc_id", classifier_score(F.col("text"), PINNED_WEIGHTS_V1).alias("so")
    )
    new = classifier_score_rows(
        docs.select("doc_id", "text"), PINNED_WEIGHTS_V1, out_col="sn"
    ).select("doc_id", "sn")
    joined = old.join(new, "doc_id")
    assert joined.filter("so <> sn or (so is null) <> (sn is null)").count() == 0
    assert new.count() == docs.count()


def test_threaded_entries_carry_every_branch(spark):
    """The thread-constructed entries still union every branch tag."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    sf = "/root/testdata/sf0.001"
    tags = {
        r["branch"]
        for r in qs["dedup_clusters"](spark, sf).select("branch").distinct().collect()
    }
    assert tags == {"text", "media"}
    tags = {
        r["branch"]
        for r in qs["pipeline_pack_split"](spark, sf)
        .select("branch")
        .distinct()
        .collect()
    }
    assert tags == {
        "pack", "mix_pack", "safe_pack", "budget_pack",
        "assemble", "map_ids", "order",
    }
    entrymod.release_caches()
