"""Degenerate-input hardening: empty, single-row, null, and tiny inputs
must flow through every operator without crashing and with sane output."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_to_vectordb_etl_spark.operators import dedup, embedding, topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_ops_on_empty_input(spark):
    empty = _docs(spark, [])
    assert dedup.exact_duplicates(empty).count() == 0
    assert dedup.ngram_jaccard_pairs(empty, threshold=0.1).count() == 0
    assert dedup.minhash_dedup_pairs(empty, threshold=0.1).count() == 0
    assert dedup.simhash_signatures(empty).count() == 0


def test_dedup_ops_on_single_row(spark):
    one = _docs(spark, [(1, "only one document here")])
    assert dedup.exact_duplicates(one).count() == 1
    assert dedup.ngram_jaccard_pairs(one, threshold=0.1).count() == 0  # no pairs
    assert dedup.minhash_dedup_pairs(one, threshold=0.1).count() == 0


def test_dedup_null_and_empty_text(spark):
    df = _docs(spark, [(1, None), (2, ""), (3, "   "), (4, "real text here")])
    # nulls/empties never pair, never crash
    assert dedup.ngram_jaccard_pairs(df, threshold=0.1).count() == 0
    sigs = {r["id"]: r["simhash"] for r in dedup.simhash_signatures(df).collect()}
    # empty/whitespace docs share the zero signature; null text keeps a row
    assert sigs[2] == sigs[3] == 0
    assert set(sigs) == {1, 2, 3, 4}


def test_identical_texts_jaccard_one(spark):
    df = _docs(spark, [(1, "a b c d e f g"), (2, "a b c d e f g")])
    rows = dedup.ngram_jaccard_pairs(df, threshold=0.99, n=3).collect()
    assert len(rows) == 1 and rows[0]["jaccard"] == 1.0
    mh = dedup.minhash_dedup_pairs(df, threshold=0.99, shingle_n=3).collect()
    assert len(mh) == 1 and mh[0]["jaccard"] == 1.0


def test_topk_k_larger_than_corpus(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(3)], "id long, vector array<float>"
    )
    q = spark.createDataFrame([(0, [1.0, 0.0])], "qid long, vector array<float>")
    out = topk.topk_cosine_join(emb, q, k=10)
    assert out.count() == 3  # all rows, no crash, no padding


def test_topk_zero_norm_vector_is_null_sim(spark):
    emb = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])], "id long, vector array<float>"
    )
    out = topk.topk_cosine(emb, [1.0, 0.0], k=5)
    sims = {r["id"]: r["cosine_sim"] for r in out.collect()}
    assert sims[1] is None and abs(sims[2] - 1.0) < 1e-6


def test_embedder_on_null_and_empty(spark):
    df = _docs(spark, [(1, None), (2, "")])
    out = df.select(
        "doc_id", embedding.deterministic_embedding(F.col("text"), dim=8).alias("v")
    ).collect()
    vals = {r["doc_id"]: r["v"] for r in out}
    assert vals[1] is None  # null text -> null embedding
    assert len(vals[2]) == 8  # empty text embeds deterministically


def test_snapshot_diff_identity_empty_and_directions(spark, sf_dir):
    from pdf_to_vectordb_etl_spark.operators import cdc
    from tests.conftest import load

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value").limit(200)
    # diff(x, x) is empty
    assert cdc.snapshot_diff(ev, ev, ["event_id"]).count() == 0
    empty = ev.filter("1 = 0")
    added = cdc.snapshot_diff(empty, ev, ["event_id"]).collect()
    assert len(added) == 200 and {r["change_type"] for r in added} == {"added"}
    removed = cdc.snapshot_diff(ev, empty, ["event_id"]).collect()
    assert len(removed) == 200 and {r["change_type"] for r in removed} == {"removed"}


def test_forward_fill_idempotent(spark):
    from pyspark.sql import functions as F

    from pdf_to_vectordb_etl_spark.operators import aggregates

    rows = [("a", 1, None), ("a", 2, 1.5), ("a", 3, None), ("b", 1, None)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    once = aggregates.forward_fill(df, "v", by="k", order_cols=["t"], out_col="vf")
    twice = aggregates.forward_fill(once, "vf", by="k", order_cols=["t"], out_col="vf2")
    assert twice.filter(~F.col("vf").eqNullSafe(F.col("vf2"))).count() == 0
