"""As-of join + deterministic sampling tests (beyond-reference ops)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pdf_to_vectordb_etl_spark.operators import sampling
from pdf_to_vectordb_etl_spark.operators.joins import asof_join
from tests.conftest import load


def _pairs(df):
    return {
        (r["k"], r["t"]): (r["r_t"], r["r_v"]) for r in df.collect()
    }


def test_asof_backward_tie_and_miss(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 4), (2, 7)], "k long, t long"
    )
    right = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 15, "c"), (3, 1, "z")],
        "k long, t long, v string",
    )
    got = _pairs(asof_join(left, right, on="t", by=["k"]))
    assert got == {
        (1, 10): (10, "b"),  # tie matches inclusively
        (1, 20): (15, "c"),
        (1, 4): (None, None),  # nothing at-or-before
        (2, 7): (None, None),  # key absent from right
    }


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, 10), (1, 16)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b")], "k long, t long, v string"
    )
    got = _pairs(asof_join(left, right, on="t", by=["k"], direction="forward"))
    assert got == {(1, 10): (10, "a"), (1, 16): (None, None)}


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, 100), (1, 200)], "k long, t long")
    right = spark.createDataFrame([(1, 95, "a"), (1, 120, "b")], "k long, t long, v string")
    got = _pairs(asof_join(left, right, on="t", by=["k"], tolerance=10))
    assert got == {(1, 100): (95, "a"), (1, 200): (None, None)}


def test_asof_matches_pandas_merge_asof(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    got = {
        (r["user_id"], r["click_id"]): r["r_view_id"]
        for r in asof_join(clicks, views, on="ts", by=["user_id"]).collect()
    }
    lp = clicks.toPandas().sort_values("ts")
    rp = views.toPandas().sort_values("ts")
    exp_df = pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward")
    exp = {
        (r.user_id, r.click_id): (None if pd.isna(r.view_id) else int(r.view_id))
        for r in exp_df.itertuples()
    }
    assert got == exp and len(got) > 0


def test_sessionize_gap_boundary(spark):
    from pdf_to_vectordb_etl_spark.operators.aggregates import sessionize_gaps

    # gaps: exactly `gap` stays in-session; gap+1 opens a new one
    rows = [(1, 0), (1, 100), (1, 201), (2, 0)]
    df = spark.createDataFrame(rows, "user_id long, t long")
    got = {
        (r["user_id"], r["t"]): r["session_id"]
        for r in sessionize_gaps(df, time_col="t", by="user_id", gap=100).collect()
    }
    assert got == {(1, 0): 1, (1, 100): 1, (1, 201): 2, (2, 0): 1}


def test_split_deterministic_disjoint_complete(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = sampling.deterministic_split(docs, w)
    s2 = sampling.deterministic_split(docs.repartition(7, "lang"), w)
    m1 = {r["doc_id"]: r["split"] for r in s1.select("doc_id", "split").collect()}
    m2 = {r["doc_id"]: r["split"] for r in s2.select("doc_id", "split").collect()}
    assert m1 == m2  # physical layout never changes assignment
    assert len(m1) == docs.count()  # complete: every row gets one label
    n = len(m1)
    n_train = sum(1 for v in m1.values() if v == "train")
    assert 0.7 <= n_train / n <= 0.9  # ~weights at fixture size


def test_stratified_sample_rates_and_composition(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    s = sampling.stratified_sample(
        docs, {"src0": 0.5, "src2": 0.0}, default_rate=1.0
    )
    by_src = {r["source"]: r["n"] for r in s.groupBy("source").agg(F.count("*").alias("n")).collect()}
    full = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "src2" not in by_src  # rate 0 drops the stratum entirely
    assert by_src["src1"] == full["src1"]  # default 1.0 keeps EVERY row
    assert 0 < by_src.get("src0", 0) < full["src0"]
    # stratum sample is the restriction of the global sample mechanism:
    half = {r["doc_id"] for r in sampling.deterministic_sample(docs, 0.5).collect()}
    src0 = {r["doc_id"] for r in s.filter(F.col("source") == "src0").collect()}
    assert src0 == {i for i in half} & {
        r["doc_id"] for r in docs.filter(F.col("source") == "src0").collect()
    }


def test_profile_single_pass_values(spark):
    from pdf_to_vectordb_etl_spark.operators import profiling

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")], "x long, s string"
    )
    got = {r["column"]: r for r in profiling.profile(df).collect()}
    assert got["x"]["n_nulls"] == 1 and got["x"]["n_distinct"] == 3
    assert got["x"]["min_v"] == "1" and got["x"]["max_v"] == "3"
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_v"] == "a" and got["s"]["max_v"] == "b"


def test_approx_sketches_error_bounds(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    approx = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("au"),
            F.percentile_approx("value", 0.5, 10000).alias("p50"),
        )
        .collect()
    }
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("u"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    for t, e in exact.items():
        assert abs(approx[t]["au"] - e["u"]) <= max(2, 0.05 * e["u"])
        assert abs(approx[t]["p50"] - e["p50"]) <= max(0.5, 0.05 * abs(e["p50"]))


def test_sample_subset_and_stable(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    small = {r["doc_id"] for r in sampling.deterministic_sample(docs, 0.1).collect()}
    big = {r["doc_id"] for r in sampling.deterministic_sample(docs, 0.3).collect()}
    assert small <= big  # nested: growing the fraction only adds rows
    again = {r["doc_id"] for r in sampling.deterministic_sample(docs, 0.1).collect()}
    assert small == again
    n = docs.count()
    assert 0.03 <= len(small) / n <= 0.2


def test_asof_empty_right_side(spark):
    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame([], "k long, t long, v string")
    got = asof_join(left, right, on="t", by=["k"]).collect()
    assert len(got) == 1 and got[0]["r_v"] is None


def test_bm25_absent_term_empty(spark):
    from pdf_to_vectordb_etl_spark.operators import textsearch

    docs = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    assert textsearch.bm25_scores(docs, ["zzzznope"]).count() == 0


def test_resample_locf_dense_grid_and_carry(spark):
    from pdf_to_vectordb_etl_spark.operators import aggregates

    # user 1: observations in buckets 0 and 3 (gap at 1, 2)
    df = spark.createDataFrame(
        [(1, 5, 10.0), (1, 8, 30.0), (1, 305, 50.0), (2, 100, 7.0)],
        "user_id long, tus long, value double",
    )
    out = aggregates.resample_locf(df, "tus", "user_id", "value", step=100)
    rows = {
        (r["user_id"], r["bucket_start"]): (r["observed"], r["value_filled"])
        for r in out.collect()
    }
    # user 1 spans buckets 0..3 -> 4 dense rows; user 2 just one
    assert len(rows) == 5
    assert rows[(1, 0)] == (True, 20.0)  # avg(10, 30)
    assert rows[(1, 100)] == (False, 20.0)  # carried
    assert rows[(1, 200)] == (False, 20.0)  # carried
    assert rows[(1, 300)] == (True, 50.0)
    assert rows[(2, 100)] == (True, 7.0)


def test_delta_encode_roundtrip_lossless(spark):
    from pyspark.sql import Window

    ev = spark.createDataFrame(
        [(1, 1, 100), (1, 2, 250), (1, 3, 900), (2, 4, 50)],
        "user_id long, event_id long, tus long",
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    enc = ev.select(
        "user_id", "event_id",
        F.coalesce(F.col("tus") - F.lag("tus").over(w), F.col("tus")).alias("delta_us"),
    )
    # reconstruct: running sum of deltas in the same per-key order
    # (the encoded frame no longer carries tus, so order on event_id)
    w2 = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dec = enc.withColumn("tus", F.sum("delta_us").over(w2))
    got = sorted((r["user_id"], r["event_id"], r["tus"]) for r in dec.collect())
    assert got == [(1, 1, 100), (1, 2, 250), (1, 3, 900), (2, 4, 50)]
