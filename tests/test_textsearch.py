"""BM25 keyword search tests (oracle covers numeric parity; these pin
ranking semantics on controlled corpora)."""

from __future__ import annotations

import pytest

from pdf_to_vectordb_etl_spark.operators import textsearch


def _scores(df):
    return {r["id"]: r["score"] for r in df.collect()}


def test_bm25_rare_term_outranks_common(spark):
    # "zebra" appears in 1 doc, "the" in all: the zebra doc must outrank
    # docs matching only the common term
    docs = spark.createDataFrame(
        [
            (1, "the zebra jumped"),
            (2, "the cat sat"),
            (3, "the dog ran"),
        ],
        "doc_id long, text string",
    )
    s = _scores(textsearch.bm25_scores(docs, ["zebra", "the"]))
    assert set(s) == {1, 2, 3}
    assert s[1] > s[2] and s[1] > s[3]


def test_bm25_tf_monotonic_at_equal_length(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark pad"),
            (2, "spark pad pad pad"),
            (3, "none of these match"),
        ],
        "doc_id long, text string",
    )
    s = _scores(textsearch.bm25_scores(docs, ["spark"]))
    assert 3 not in s  # no query term, no row
    assert s[1] > s[2] > 0


def test_bm25_topk_deterministic_boundary(spark):
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(10)], "doc_id long, text string"
    )
    top = textsearch.bm25_topk(docs, ["same"], k=3)
    # all scores tie -> id tiebreak keeps the smallest ids
    assert [r["id"] for r in top.collect()] == [0, 1, 2]


def test_bm25_empty_query_raises(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textsearch.bm25_scores(docs, [])


def test_hybrid_rrf_rewards_presence_in_both_lists(spark):
    from pdf_to_vectordb_etl_spark.operators.textsearch import hybrid_rrf

    lex = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id long, rank int")
    sem = spark.createDataFrame([(2, 1), (4, 2), (5, 3)], "id long, rank int")
    out = hybrid_rrf(lex, sem, k=10)
    rows = {r["id"]: r for r in out.collect()}
    # doc 2 is in both lists -> must outrank every single-list doc
    best = max(rows.values(), key=lambda r: r["rrf_score"])
    assert best["id"] == 2
    assert rows[2]["lexical_rank"] == 2 and rows[2]["semantic_rank"] == 1
    assert rows[1]["semantic_rank"] is None  # lexical-only doc
    assert len(rows) == 5  # union of both shortlists
