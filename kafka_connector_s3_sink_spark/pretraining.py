"""One-call pretraining-corpus preset: the MIGRATION.md tour as a single
composable API.

``pretraining_pipeline`` wires the engine's corpus-engineering stages in the
order a production pretraining build runs them:

    crawl documents (``sources.warc.warc_documents`` →
    ``enrich_crawl_documents``, or any (doc_id, text, …) frame)
    → non-empty filter
    → quality floor                (static heuristic or trained classifier
                                    score — whatever sits in ``quality``)
    → paragraph dedup              (CCNet/C4 boilerplate stage)
    → duplicate-span surgery       (Lee et al. substring grain)
    → near-dup cascade             (exact → LSH → Jaccard verify → CC,
                                    keep canonicals)
    → benchmark decontamination    (exact containment AND banded near-dup,
                                    when a benchmark frame is supplied)
    → per-domain cap               (C4 balancing, salted two-phase top-K)
    → mixture                      (per-source serve rates, up-sampling by
                                    deterministic epoch replication)
    → split + sequence packing     (stable hash split joined onto packs)

Every stage is the already-scale-audited operator — the preset adds NO new
shuffle shapes, it only fixes the composition order (quality before dedup so
the cascade never fingerprints rejected docs; decontam after dedup so flags
hit canonical survivors; the cap after decontam so quota slots are not
wasted on contaminated pages; split labels derived from the ORIGINAL doc_id
so replicas of one document can never straddle the train/val boundary).

Determinism contract: every stage is a pure function of (id, seed) — re-runs
and incremental rebuilds reproduce the identical corpus, mixture, split, and
pack layout.

Scale note on accounting: ``PretrainingResult.accounting()`` runs one count
job per stage over lazy lineage — cheap at test scale, wasteful at 100 TB
(each count replays the stages above it). Production runs should either
persist/checkpoint the handful of stage frames they audit or read stage
row counts from the Spark UI's stage metrics instead.
"""

from __future__ import annotations

from collections.abc import Mapping
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark.operators import dedup, packing, sampling
from kafka_connector_s3_sink_spark.operators import text as text_ops
from kafka_connector_s3_sink_spark.operators import urls as url_ops


@dataclass(frozen=True)
class PretrainingConfig:
    """Knobs for ``pretraining_pipeline`` — defaults follow the per-operator
    defaults the individual stages document; every stage with a ``None``
    knob is skipped (the preset degrades to the stages you configured)."""

    quality_floor: float | None = 0.2
    jaccard_threshold: float = 0.8
    span_tokens: int = 50
    decontam_overlap: float = 0.5
    near_decontam_jaccard: float = 0.5
    # semantic decontam rung (active only when pretraining_pipeline is
    # given ``benchmark_embeddings``): docs must carry ``embedding_col``
    semantic_decontam_cosine: float = 0.95
    embedding_col: str = "embedding"
    embedding_dim: int = 64
    domain_cap: int | None = None
    n_salts: int = 16
    mixture: Mapping[str, float] | None = None
    source_col: str = "source"
    splits: Mapping[str, float] | None = None  # default 0.9/0.05/0.05
    ctx_len: int = 2048
    seed: str = "pretrain"


@dataclass
class PretrainingResult:
    """Stage snapshots + the final packed layout.

    ``stages`` is ordered (insertion order = pipeline order); each value is
    the lazy DataFrame AFTER that stage. ``packed`` is the trainer-facing
    layout: one row per (document replica, pack) segment with the original
    ``doc_id``, its ``mix_epoch`` replica index, the pack geometry from
    ``packing.pack_sequences``, and the document's stable ``split`` label.
    ``epoch_slots`` is the replica-id stride (``rep_id = doc_id·slots +
    epoch``) so external consumers can decode pack ordering keys."""

    stages: dict[str, DataFrame] = field(default_factory=dict)
    packed: DataFrame | None = None
    epoch_slots: int = 1

    def accounting(self) -> list[tuple[str, int]]:
        """(stage, row count) in pipeline order — one count job per stage
        (see the module docstring's scale note)."""
        return [(name, df.count()) for name, df in self.stages.items()]


def _slots(rates: Mapping[str, float]) -> int:
    out = 1
    for r in rates.values():
        n_full = int(r)
        out = max(out, n_full + (1 if r - n_full > 0 else 0))
    return out


def pretraining_pipeline(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    config: PretrainingConfig | None = None,
    benchmark_embeddings: DataFrame | None = None,
) -> PretrainingResult:
    """Run the full corpus build (module docstring) over ``docs``.

    ``docs`` needs ``doc_id`` and ``text``; a ``quality`` column gates the
    quality floor (derived via ``text.quality_score`` when absent and a
    floor is configured), a ``domain`` column (or ``url`` to derive it from)
    gates the per-domain cap, and ``config.source_col`` gates the mixture.
    ``benchmark`` is the eval-suite frame (``doc_id``, ``text``) for the
    exact and banded-near lexical decontamination passes;
    ``benchmark_embeddings`` (``doc_id`` + ``config.embedding_col``) adds
    the SEMANTIC rung — docs must then carry ``config.embedding_col`` too,
    and a translated/deeply-paraphrased leak that shares no n-grams with
    its eval twin is still cut. Returns a :class:`PretrainingResult`.
    """
    cfg = config or PretrainingConfig()
    res = PretrainingResult()
    res.stages["input"] = docs

    cur = docs.filter(F.col("text").isNotNull() & (F.trim("text") != ""))
    res.stages["nonempty"] = cur

    if cfg.quality_floor is not None:
        q = (
            F.col("quality")
            if "quality" in cur.columns
            else text_ops.quality_score(F.col("text"))
        )
        cur = cur.filter(q >= cfg.quality_floor)
        res.stages["quality_floor"] = cur

    rebuilt = dedup.remove_duplicate_paragraphs(cur)
    cur = rebuilt.filter(F.trim("text") != "")
    res.stages["paragraph_dedup"] = cur

    stripped = dedup.strip_duplicate_spans(cur, span_tokens=cfg.span_tokens)
    cur = (
        stripped.withColumn("text", F.col("text_clean"))
        .drop("text_clean")
        .filter(F.trim("text") != "")
    )
    res.stages["span_surgery"] = cur

    clusters = dedup.dedup_cascade(
        cur, jaccard_threshold=cfg.jaccard_threshold
    )
    canon = clusters.filter(F.col("is_canonical") == 1).select("doc_id")
    cur = cur.join(canon, "doc_id", "left_semi")
    res.stages["near_dedup"] = cur

    if benchmark is not None or benchmark_embeddings is not None:
        flag_sets = []
        if benchmark is not None:
            flag_sets.append(
                dedup.decontamination_matches(
                    cur, benchmark, min_overlap_ratio=cfg.decontam_overlap
                ).select("corpus_id")
            )
            flag_sets.append(
                dedup.near_decontamination_matches(
                    cur, benchmark, jaccard_threshold=cfg.near_decontam_jaccard
                ).select("corpus_id")
            )
        if benchmark_embeddings is not None:
            if cfg.embedding_col not in cur.columns:
                raise ValueError(
                    "benchmark_embeddings supplied but docs carry no "
                    f"{cfg.embedding_col!r} column"
                )
            flag_sets.append(
                dedup.semantic_decontamination_matches(
                    cur.select(
                        F.col("doc_id").alias("vec_id"),
                        F.col(cfg.embedding_col).alias("embedding"),
                    ),
                    benchmark_embeddings.select(
                        F.col("doc_id").alias("vec_id"),
                        F.col(cfg.embedding_col).alias("embedding"),
                    ),
                    dim=cfg.embedding_dim,
                    cosine_threshold=cfg.semantic_decontam_cosine,
                ).select("corpus_id")
            )
        flagged = flag_sets[0]
        for fs in flag_sets[1:]:
            flagged = flagged.unionByName(fs)
        cur = cur.join(
            flagged.distinct().withColumnRenamed("corpus_id", "doc_id"),
            "doc_id",
            "left_anti",
        )
        res.stages["decontam"] = cur

    if cfg.domain_cap is not None:
        if "domain" not in cur.columns:
            if "url" not in cur.columns:
                raise ValueError(
                    "domain_cap configured but docs carry neither a "
                    "'domain' nor a 'url' column"
                )
            cur = cur.withColumn(
                "domain", url_ops.registrable_domain(F.col("url"))
            )
        cur = (
            sampling.cap_per_domain(
                cur,
                "domain",
                cfg.domain_cap,
                priority_col="quality" if "quality" in cur.columns else None,
                n_salts=cfg.n_salts,
            )
            .filter("kept")
            .drop("domain_rank", "kept")
        )
        res.stages["domain_cap"] = cur

    if cfg.mixture is not None:
        if cfg.source_col not in cur.columns:
            raise ValueError(
                f"mixture configured but docs carry no {cfg.source_col!r} column"
            )
        res.epoch_slots = _slots(cfg.mixture)
        cur = sampling.mixture_sample(
            cur,
            cfg.mixture,
            source_col=cfg.source_col,
            seed=f"{cfg.seed}:mix",
            epoch_col="mix_epoch",
        )
        res.stages["mixture"] = cur
    else:
        cur = cur.withColumn("mix_epoch", F.lit(0).cast("int"))

    split = sampling.hash_split(
        cur.select("doc_id").distinct(),
        cfg.splits,
        seed=f"{cfg.seed}:split",
    )
    slots = res.epoch_slots
    rep = cur.select(
        (F.col("doc_id") * slots + F.col("mix_epoch")).alias("rep_id"), "text"
    )
    packed = (
        packing.pack_sequences(
            rep, ctx_len=cfg.ctx_len, id_col="rep_id", seed=f"{cfg.seed}:pack"
        )
        .withColumn("mix_epoch", (F.col("rep_id") % slots).cast("int"))
        .withColumn(
            "doc_id", ((F.col("rep_id") - F.col("rep_id") % slots) / slots).cast("long")
        )
        .join(split, "doc_id")
        .select(
            "doc_id",
            "mix_epoch",
            "n_tokens",
            "pack_id",
            "pack_pos",
            "doc_offset",
            "seg_tokens",
            "split",
        )
    )
    res.stages["packed"] = packed
    res.packed = packed
    return res
