"""Text-analysis kernels: PII redaction edge cases (the rest of the
module is pinned by the DuckDB oracle queries ta_*)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_to_vectordb_etl_spark.operators import textanalysis as ta


def test_redact_pii_covers_types_and_leaves_clean_text(spark):
    rows = [
        (1, "mail me at jane.doe+x@sub.example.co.uk today"),
        (2, "server 192.168.0.1 rebooted"),
        (3, "call +1 555 867 5309 or 555-867-5309"),
        (4, "no pii here, just 12345 and v1.2 release notes"),
        (5, "combo a@b.io via 10.0.0.7"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {
        r["id"]: (r["red"], r["hits"])
        for r in df.select(
            "id",
            ta.redact_pii("text").alias("red"),
            ta.pii_hit_count("text").alias("hits"),
        ).collect()
    }
    assert out[1] == ("mail me at <EMAIL> today", 1)
    assert out[2] == ("server <IP> rebooted", 1)
    assert out[3][0] == "call <PHONE> or <PHONE>" and out[3][1] == 2
    # clean text passes through byte-identical, zero hits
    assert out[4] == (rows[3][1], 0)
    assert out[5] == ("combo <EMAIL> via <IP>", 2)


def test_redact_pii_is_native_expression(spark):
    """The scrub must stay JVM-side (no BatchEvalPython / pandas UDF) so
    it runs at scan throughput."""
    df = spark.createDataFrame([(1, "x@y.io")], "id int, text string")
    plan = (
        df.select(ta.redact_pii("text").alias("r"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


def test_bigram_logprob_hand_computed(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "a b c")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["lm_score"], r["n_bigrams"])
        for r in ta.bigram_logprob_scores(df).collect()
    }
    # corpus: c(a,b)=2 c(a,c)=1 c(b,c)=1; c1(a)=3 c1(b)=1
    assert out[1] == (round(math.log(2 / 3), 4), 1)
    assert out[2] == (round(math.log(1 / 3), 4), 1)
    assert out[3] == (round((math.log(2 / 3) + 0.0) / 2, 4), 2)
