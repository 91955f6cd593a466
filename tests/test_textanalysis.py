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


def test_webcorpus_url_canonicalization(spark):
    from pdf_to_vectordb_etl_spark.operators import webcorpus as wc

    cases = [
        ("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&q=1#top",
         "http://example.com/a/b/?q=1"),
        ("https://news.example.co.uk:443/path/", "https://news.example.co.uk/path"),
        ("https://example.com/?fbclid=abc", "https://example.com"),
        ("https://example.com/a?id=2&gclid=z&x=3", "https://example.com/a?id=2&x=3"),
        ("no-scheme/plain", "no-scheme/plain"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r[0] for r in df.select(wc.canonicalize_url(F.col("u"))).collect()]
    assert got == [want for _, want in cases]


def test_webcorpus_registrable_domain(spark):
    from pdf_to_vectordb_etl_spark.operators import webcorpus as wc

    cases = [
        ("https://a.b.news.example.co.uk/x", "example.co.uk"),
        ("http://WWW.Sub.Example.COM/y", "example.com"),
        ("https://localhost/z", ""),  # single label: no registrable domain
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r[0] for r in df.select(wc.registrable_domain(F.col("u"))).collect()]
    assert got == [want for _, want in cases]


def test_webcorpus_strip_markup(spark):
    from pdf_to_vectordb_etl_spark.operators import webcorpus as wc

    df = spark.createDataFrame(
        [('<div class="a">Hello <b>world</b> &amp;amp; <!-- note --> '
          "friends&nbsp;&lt;3</div>",)],
        "h string",
    )
    got = df.select(wc.strip_markup(F.col("h"))).first()[0]
    # single-pass unescape: &amp;amp; -> &amp; (NOT a double unescape)
    assert got == "Hello world &amp; friends <3"


def test_webcorpus_domain_stats(spark):
    from pdf_to_vectordb_etl_spark.operators import webcorpus as wc

    df = spark.createDataFrame(
        [("https://a.example.com/1",), ("http://www.example.com/2",),
         ("https://other.org/x",)],
        "url string",
    )
    got = {r["domain"]: r["n_docs"] for r in wc.domain_stats(df).collect()}
    assert got == {"example.com": 2, "other.org": 1}


def test_webcorpus_dehyphenate(spark):
    from pdf_to_vectordb_etl_spark.operators import webcorpus as wc

    df = spark.createDataFrame([("exam-\nple stays-afloat end-\n2",)], "t string")
    got = df.select(wc.dehyphenate(F.col("t"))).first()[0]
    assert got == "example stays-afloat end-\n2"  # digits: not hyphenation
