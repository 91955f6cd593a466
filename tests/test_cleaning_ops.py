"""Pins for operators.cleaning — PII masking and boilerplate line
removal (r7)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_scrub_masks_and_counts(spark):
    from pdf_to_vectordb_etl_spark.operators import cleaning

    df = _df(spark, [
        (1, "mail a.b+c@ex-ample.co.uk and bob@x.io twice"),
        (2, "server at 192.168.0.1 port 80; also 10.0.0.255"),
        (3, "call +44 (020) 7946 0958 or +1 555-123-4567"),
        (4, "ssn 123-45-6789; card 4111 1111 1111 1111"),
        (5, None),
        (6, "no pii here, 3.14 is fine and so is v1.2.3.4a"),
    ])
    out = {r.doc_id: r for r in cleaning.pii_scrub(df).collect()}
    assert out[1].n_email == 2 and "<PII:email>" in out[1].text
    assert "@" not in out[1].text
    assert out[2].n_ipv4 == 2 and "192.168.0.1" not in out[2].text
    assert out[3].n_phone == 2
    assert out[4].n_ssn == 1 and out[4].n_card == 1 and out[4].n_pii == 2
    assert out[5].text == "" and out[5].n_pii == 0  # NULL -> empty
    # \b guards: version strings / decimals are not IPs
    assert out[6].n_pii == 0 and out[6].text.startswith("no pii")


def test_pii_report_aggregates(spark):
    from pdf_to_vectordb_etl_spark.operators import cleaning

    df = spark.createDataFrame(
        [(1, "a@b.co", "s0"), (2, "clean", "s0"), (3, "c@d.io e@f.io", "s1")],
        "doc_id long, text string, source string",
    )
    rep = {r.source: r for r in cleaning.pii_report(df).collect()}
    assert rep["s0"].n_docs == 2 and rep["s0"].n_docs_with_pii == 1
    assert rep["s0"].n_email == 1
    assert rep["s1"].n_email == 2 and rep["s1"].n_docs_with_pii == 1


def test_frequent_lines_distinct_per_doc(spark):
    from pdf_to_vectordb_etl_spark.operators import cleaning

    footer = "all rights reserved worldwide"
    df = _df(spark, [
        (1, f"body one\n{footer}\n{footer}"),   # repeats within ONE doc
        (2, f"body two\n{footer}"),
        (3, f"body three\n  {footer}  "),        # trimmed match
        (4, "short\nxx"),                         # below min_chars
    ])
    fl = cleaning.frequent_lines(df, min_docs=3, min_chars=10).collect()
    assert len(fl) == 1
    assert fl[0].line == footer and fl[0].n_docs == 3  # not 4: in-doc dup


def test_strip_boilerplate_preserves_order_and_bytes(spark):
    from pdf_to_vectordb_etl_spark.operators import cleaning

    footer = "all rights reserved worldwide"
    df = _df(spark, [
        (1, f"alpha\n{footer}\nbeta\n{footer}\ngamma"),
        (2, f"{footer}"),
        (3, "alpha\nbeta"),
        (4, None),
    ])
    bp = spark.createDataFrame([(footer,)], "line string")
    out = {r.doc_id: r for r in
           cleaning.strip_boilerplate_lines(df, bp).collect()}
    assert out[1].text == "alpha\nbeta\ngamma"
    assert out[1].n_lines_dropped == 2
    assert out[2].text == "" and out[2].n_lines_dropped == 1
    assert out[3].text == "alpha\nbeta" and out[3].n_lines_dropped == 0
    assert out[4].text == "" and out[4].n_lines_dropped == 0
    assert set(out) == {1, 2, 3, 4}  # every doc survives the strip


def test_strip_end_to_end_with_inventory(spark, sf_dir):
    # inventory -> strip roundtrip on real documents: stripping the
    # inventory's lines makes a second inventory pass come back empty
    from tests.conftest import load
    from pdf_to_vectordb_etl_spark.operators import cleaning

    docs = load(spark, sf_dir, "documents").limit(150)
    fl = cleaning.frequent_lines(docs, min_docs=3, min_chars=10)
    fl = fl.localCheckpoint(eager=True)
    stripped = cleaning.strip_boilerplate_lines(docs, fl)
    again = cleaning.frequent_lines(stripped, min_docs=3, min_chars=10)
    assert again.count() == 0
    assert stripped.count() == docs.count()


def test_pii_scrub_idempotent(spark):
    # masks contain no digits/@, so a second scrub is a no-op
    from pdf_to_vectordb_etl_spark.operators import cleaning

    df = _df(spark, [
        (1, "a@b.co 192.168.0.1 +1 555-123-4567 123-45-6789 "
            "4111 1111 1111 1111"),
        (2, "nested a@b.co inside a@b.co twice a@b.co"),
    ])
    once = cleaning.pii_scrub(df).select("doc_id", "text")
    twice = cleaning.pii_scrub(once).select("doc_id", "text")
    assert {(r.doc_id, r.text) for r in once.collect()} == \
           {(r.doc_id, r.text) for r in twice.collect()}
    n2 = {r.doc_id: r.n_pii for r in cleaning.pii_scrub(once).collect()}
    assert n2 == {1: 0, 2: 0}
