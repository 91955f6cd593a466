"""Semantic pins for the round-3 operators (JL projection, int8
quantization, length-bucketed batching, skew diagnosis). Oracle parity
proves cross-engine equality; these pin the mathematical properties the
operators claim."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pdf_to_vectordb_etl_spark.operators import (
    curation,
    embedding,
    quantization,
    skew,
)
from tests.conftest import load


def test_jl_projection_preserves_geometry(spark, sf_dir):
    """JL with +-1/sqrt(k) signs preserves squared norms in
    expectation; with k=16 over 64 dims, most vectors land within a
    loose multiplicative band — enough to keep near-dup candidate
    generation meaningful after projection."""
    emb = load(spark, sf_dir, "embeddings").limit(200)
    out = embedding.random_projection(emb, out_dim=16, in_dim=64)
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    rows = out.select(
        sq(F.col("embedding").cast("array<double>")).alias("n_in"),
        sq(F.col("projected")).alias("n_out"),
    ).collect()
    ratios = [r["n_out"] / r["n_in"] for r in rows if r["n_in"] > 0]
    within = sum(1 for r in ratios if 0.3 <= r <= 3.0) / len(ratios)
    assert within >= 0.9, f"only {within:.0%} of norms within the JL band"
    # expectation: mean ratio ~ 1
    mean = sum(ratios) / len(ratios)
    assert 0.7 <= mean <= 1.3, mean


def test_jl_sign_matrix_deterministic_and_scaled():
    m1 = embedding.jl_sign_matrix(8, 4)
    m2 = embedding.jl_sign_matrix(8, 4)
    assert m1 == m2
    s = 1.0 / math.sqrt(4)
    assert all(abs(x) == s for row in m1 for x in row)
    # a different seed flips at least one sign
    assert m1 != embedding.jl_sign_matrix(8, 4, seed="jl1")


def test_int8_quantize_error_bound_and_range(spark, sf_dir):
    """Codes fit int8; reconstruction error <= scale/2 (round-to-nearest
    guarantee); all-zero vectors quantize cleanly to scale 0."""
    emb = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(100)
    )
    zero = spark.createDataFrame(
        [(10**9, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    out = quantization.int8_quantize(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .unionByName(zero)
    ).collect()
    for r in out:
        assert all(-127 <= c <= 127 for c in r["codes"]), r["vec_id"]
        if r["scale"] == 0.0:
            assert r["max_abs_err"] == 0.0 and all(c == 0 for c in r["codes"])
        else:
            # +5e-7: max_abs_err is reported rounded to 6 dp, which can
            # round UP past the exact scale/2 bound
            assert r["max_abs_err"] <= r["scale"] / 2 + 5e-7, r["vec_id"]


def test_length_bucketed_batches_invariants(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = curation.length_bucketed_batches(docs, batch_size=32, n_shards=4)
    rows = out.collect()
    assert rows, "no batches produced"
    for r in rows:
        assert 1 <= r["n_docs"] <= 32
        # max_len inside its power-of-two bucket
        assert 2 ** r["bucket"] <= r["max_len"] < 2 ** (r["bucket"] + 1)
        assert 0.0 <= r["padding_frac"] < 1.0
    # batch indices are dense from 0 within each (bucket, shard)
    from collections import defaultdict

    seen = defaultdict(set)
    for r in rows:
        seen[(r["bucket"], r["shard"])].add(r["batch_idx"])
    for key, idxs in seen.items():
        assert idxs == set(range(len(idxs))), key
    # total docs conserved
    n_in = docs.filter(
        F.length(F.trim(F.col("text"))) > 0
    ).count()
    assert sum(r["n_docs"] for r in rows) == n_in


def test_key_skew_report_shares_and_counts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    rep = skew.key_skew_report(ev, "user_id", top_n=5).collect()
    assert len(rep) == 5
    total = ev.count()
    distinct = ev.select("user_id").distinct().count()
    assert all(r["n_keys"] == distinct for r in rep)
    assert abs(sum(r["share"] for r in rep) - sum(r["n"] for r in rep) / total) < 1e-4
    # top keys really are the hottest
    true_top = (
        ev.groupBy("user_id").count().orderBy(F.desc("count"), "user_id").limit(5)
    )
    assert {r["user_id"] for r in rep} == {r["user_id"] for r in true_top.collect()}
