"""Composed corpus-curation pipeline (beyond-reference flagship).

The end-to-end shape a 100 TB pretraining-data run takes, assembled
from the engine's operators in dependency order:

  1. exact dedup           (digest groupBy — removes byte clones first,
                            shrinking everything downstream)
  2. near-dup drop         (MinHash/LSH candidates -> connected
                            components -> keep min-id representative)
  3. quality filter        (per-language relative quantile cutoff —
                            absolute thresholds delete whole languages)
  4. per-source cap        (crawl-skew control before mixing)
  5. leakage-aware split   (whole sources assigned to train/val/test)
  6. shard shuffle         (deterministic training order, per-shard
                            windows — no global sort)

Every stage is a narrow/one-shuffle DataFrame op documented in its own
module; the composition adds NO driver-side loops and produces both
the curated frame and a per-stage accounting report (counts survive ->
the report is the artifact reviewers read before a run is blessed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators import curation, dedup, sampling


def curate_corpus(
    df: DataFrame,
    near_dup_threshold: float = 0.7,
    quality_q: float = 0.25,
    cap_per_source: int = 10_000,
    split_weights: dict[str, float] | None = None,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    dsir_target: DataFrame | None = None,
    dsir_keep: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run the full curation chain; returns ``(curated, report)``.

    ``curated`` carries the input columns plus ``split``, ``shard``,
    ``pos``. ``report`` is one row per stage: (stage, n_docs) — computed
    with one count per stage boundary (each count reuses the lazily
    shared prefix plan; at scale, persist the two dedup outputs to trade
    recompute for storage)."""
    stages: list[tuple[str, DataFrame]] = [("input", df)]

    d1 = dedup.drop_exact_duplicates(df, text_col=text_col, id_col=id_col)
    stages.append(("exact_dedup", d1))

    pairs = dedup.minhash_dedup_pairs(d1, threshold=near_dup_threshold,
                                      text_col=text_col, id_col=id_col)
    d2 = dedup.drop_near_duplicates(d1, pairs, id_col=id_col)
    stages.append(("near_dedup", d2))

    keep = curation.quality_quantile_filter(
        d2, q=quality_q, by="lang", text_col=text_col, id_col=id_col
    ).select(id_col)
    d3 = d2.join(keep, id_col, "left_semi")
    stages.append(("quality_filter", d3))

    if dsir_target is not None and dsir_keep:
        # optional distribution targeting: keep the dsir_keep docs
        # whose hashed-n-gram profile best matches the target corpus
        # (curation.dsir_weights) — runs after quality so the models
        # train on surviving text only
        sel = curation.dsir_weights(
            d3, dsir_target, k=dsir_keep, id_col=id_col, text_col=text_col
        ).select(id_col)
        d3 = d3.join(sel, id_col, "left_semi")
        stages.append(("dsir_select", d3))

    d4 = curation.cap_per_group(d3, by="source", n=cap_per_source, id_col=id_col)
    stages.append(("source_cap", d4))

    d5 = sampling.grouped_split(
        d4, split_weights or {"train": 0.9, "val": 0.05, "test": 0.05},
        group_col="source",
    )
    d6 = curation.shard_shuffle(d5, n_shards=n_shards, id_col=id_col)
    stages.append(("split_shuffle", d6))

    spark = df.sparkSession
    report = spark.createDataFrame(
        [(name, frame.count()) for name, frame in stages],
        "stage string, n_docs long",
    )
    return d6, report
