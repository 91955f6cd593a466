"""Round-11 optimization parity pins.

Two structural rewrites this round must be bit-identical to what they
replaced:

- the hop-FUSED distributed beam probe (``_beam_probe_bsp`` — one
  mapInPandas pass over a broadcast index artifact) vs the per-hop
  join cascade vs the driver fast path (three-way);
- the rank primitives' ``monotonically_increasing_id`` per-partition
  numbering (and the size-aware no-explicit-N range exchange) vs the
  Window row_number they replaced.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import load


def test_beam_probe_three_way_parity(spark, sf_dir):
    """driver fast path == hop-fused BSP == join cascade, row for row
    (the visited set is a pure function of (graph, corpus, probes))."""
    from pdf_to_vectordb_etl_spark.operators.topk import (
        nn_descent_beam_probe,
        nn_descent_graph,
    )

    emb = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    probes = emb.filter(F.col("vec_id") < 15)
    corpus = emb.filter(
        (F.col("vec_id") >= 15) & (F.col("vec_id") < 300)
    )
    g = nn_descent_graph(corpus, k=5, rounds=3)
    fast = sorted(
        tuple(r)
        for r in nn_descent_beam_probe(
            g, corpus, probes, hops=4, beam=6
        ).collect()
    )
    bsp = sorted(
        tuple(r)
        for r in nn_descent_beam_probe(
            g, corpus, probes, hops=4, beam=6, fast_path_max_nodes=None
        ).collect()
    )
    os.environ["SPARK_GRAFT_NN_BSP"] = "0"
    try:
        cascade = sorted(
            tuple(r)
            for r in nn_descent_beam_probe(
                g,
                corpus,
                probes,
                hops=4,
                beam=6,
                fast_path_max_nodes=None,
            ).collect()
        )
    finally:
        del os.environ["SPARK_GRAFT_NN_BSP"]
    assert fast == bsp == cascade and len(fast) > 0


def test_bsp_serving_consumers_match_cascade(spark, sf_dir):
    """incremental assign and tombstone search through the BSP beam
    probe (NN_FASTPATH=0) must equal the join-cascade plans
    (NN_FASTPATH=0 + NN_BSP=0)."""
    from pdf_to_vectordb_etl_spark.operators.topk import (
        nn_descent_graph,
        nn_descent_incremental_assign,
        nn_descent_tombstone_search,
    )

    emb = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    probes = emb.filter(F.col("vec_id") < 12)
    corpus = emb.filter(
        (F.col("vec_id") >= 12) & (F.col("vec_id") < 260)
    )
    deletions = corpus.filter(F.col("vec_id") % 5 == 2).select("vec_id")

    def run():
        g = nn_descent_graph(corpus, k=5, rounds=3)
        a = sorted(
            tuple(r)
            for r in nn_descent_incremental_assign(
                g, corpus, probes, k=4, hops=3, beam=5
            ).collect()
        )
        t = sorted(
            tuple(r)
            for r in nn_descent_tombstone_search(
                g, corpus, probes, deletions, k=6, hops=3, beam=5
            ).collect()
        )
        return a, t

    os.environ["SPARK_GRAFT_NN_FASTPATH"] = "0"
    try:
        bsp = run()
        os.environ["SPARK_GRAFT_NN_BSP"] = "0"
        try:
            cascade = run()
        finally:
            del os.environ["SPARK_GRAFT_NN_BSP"]
    finally:
        del os.environ["SPARK_GRAFT_NN_FASTPATH"]
    assert bsp == cascade and len(bsp[0]) > 0 and len(bsp[1]) > 0


def test_tombstone_overcap_deletions_reuses_fast_probe(spark, sf_dir):
    """The >16k-deletions branch now reuses the already-computed fast
    visited set and applies the distributed anti-join/top-k to it
    (ADVICE r10). Feeding >16k deletions is impractical at test scale,
    so pin the identity that branch relies on directly: the
    anti-join + window over the fast-path visited set must serve the
    same rows as the fused driver mask."""
    from pyspark.sql import Window

    from pdf_to_vectordb_etl_spark.operators.topk import (
        _beam_probe_fast_arrays,
        nn_descent_graph,
        nn_descent_tombstone_search,
    )

    emb = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    probes = emb.filter(F.col("vec_id") < 12)
    corpus = emb.filter(
        (F.col("vec_id") >= 12) & (F.col("vec_id") < 260)
    )
    deletions = corpus.filter(F.col("vec_id") % 5 == 2).select("vec_id")
    g = nn_descent_graph(corpus, k=5, rounds=3)
    fused = sorted(
        tuple(r)
        for r in nn_descent_tombstone_search(
            g, corpus, probes, deletions, k=6, hops=3, beam=5
        ).collect()
    )
    import pandas as pd

    qid, cand, dist = _beam_probe_fast_arrays(
        g, corpus, probes, 3, 5, "embedding", "vec_id", 16_000, 20_000
    )
    visited = spark.createDataFrame(
        pd.DataFrame({"qid": qid, "cand": cand, "dist": dist}),
        schema="qid bigint, cand bigint, dist bigint",
    )
    alive = visited.join(
        F.broadcast(
            deletions.select(F.col("vec_id").alias("cand")).distinct()
        ),
        "cand",
        "left_anti",
    )
    w = Window.partitionBy("qid").orderBy("dist", "cand")
    replay = sorted(
        tuple(r)
        for r in alive.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= 6)
        .select("qid", "cand", "dist")
        .collect()
    )
    assert fused == replay and len(fused) > 0


def test_mid_numbering_matches_window(spark):
    """The monotonically_increasing_id per-partition numbering (r11,
    replacing the row_number/dense_rank Window in _row_numbered and
    global_dense_rank) must reproduce the Window's numbers exactly,
    including under AQE partition coalescing of the no-explicit-N
    range exchange."""
    from pyspark.sql import Window

    from pdf_to_vectordb_etl_spark.operators import suffixes

    df = spark.range(50_000).select(
        (F.col("id") * 2654435761 % 100_000).alias("v"),
        F.col("id"),
    )
    out, total = suffixes._row_numbered(df, ["v", "id"], "rn")
    assert total == 50_000
    w = Window.orderBy("v", "id")
    expect = {
        (r["v"], r["id"]): r["ern"]
        for r in df.withColumn(
            "ern", F.row_number().over(w)
        ).collect()
    }
    got = {(r["v"], r["id"]): r["rn"] for r in out.collect()}
    assert got == expect

    # dense rank over duplicate keys (distinct() inside the primitive)
    dd = spark.range(9_999).select((F.col("id") % 321).alias("k"))
    ranked = suffixes.global_dense_rank(dd, ["k"], "rk")
    exp = {
        r["k"]: r["erk"] - 1
        for r in dd.select("k")
        .distinct()
        .withColumn("erk", F.dense_rank().over(Window.orderBy("k")))
        .collect()
    }
    gotd = {r["k"]: r["rk"] for r in ranked.dropDuplicates(["k"]).collect()}
    assert gotd == exp


def test_rank_primitive_range_exchange_is_size_aware(spark):
    """The range exchange behind the rank primitives must coalesce a
    kilobyte intermediate instead of fanning it out to one task per
    core (the c8-beats-c32 finding): no explicit partition count means
    AQE sizes it to the data."""
    from pdf_to_vectordb_etl_spark.operators import suffixes

    df = spark.range(10_000).select(F.col("id").alias("v"), "id")
    out, _ = suffixes._row_numbered(df, ["v"], "rn")
    nparts = out.rdd.getNumPartitions()
    assert nparts < int(
        spark.conf.get("spark.sql.shuffle.partitions")
    ) or nparts <= 2
