"""Question-parse pipeline: page-grain text -> question-grain records.

Spark-first re-expression of the reference's sequential per-page /
per-question loops (reference enem_pdf_extractor.py:231-266 page
preprocessing, :396-523 D1 handler, :549-662 D2 handler). The mutable
counters become window functions; the ``str.find`` segmentation loop
becomes ``posexplode(split(...))``; the ``re.subn`` alternative parser
becomes native ``regexp_count`` + ``regexp_replace`` (Spark >= 3.5), so
the entire pipeline is JVM-side expressions — no Python UDF in the hot
path.

Scale notes (100 TB): everything below is embarrassingly parallel per
document — the only wide operation is the W1/W2 window partitioned by
``doc_id`` (one shuffle on a high-cardinality key, no skew since a doc
has bounded pages). No collect, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.textops import (
    DELIM,
    canonical_delim,
    page_question_count,
    scrub_barcodes,
    strip_header,
)
from ..schemas import SUBJECT_RANGES

# X7 — doubled-letter alternative marker, with backreference
# (reference enem_pdf_extractor.py:116-128) …
ALT_MARKER_PATTERN = r"([A-E])\s*\n\1\s*"
# … and the 2020-format fallback (reference :129-134)
ALT_MARKER_FALLBACK = r"([A-E])\s{2}"
# X8 — segmented alternative marker after normalization
ALT_SPLIT_PATTERN = r"[A-E]\)"


def preprocess_pages(pages: DataFrame, text_col: str = "page_text") -> DataFrame:
    """S7 + F1 + F3 + F4 + X6 + A1 (reference __page_preprocessing__ :231-266).

    Emits one row per *question-bearing* content page with a clean
    ``text`` column and a per-page question count ``n_questions``.
    Page order and image flags are preserved for the numbering windows.
    """
    t = canonical_delim(F.col(text_col))
    return (
        pages.filter(F.col("page_index") >= 1)  # S7 cover skip (reference :410)
        .withColumn("text", scrub_barcodes(strip_header(t)))
        .filter(F.instr(t, DELIM) > 0)  # F1 essay-page drop (reference :238-241)
        .withColumn("n_questions", page_question_count("text"))
        .drop(text_col)
    )


def number_pages(pages: DataFrame) -> DataFrame:
    """W1 — running question totals across pages (reference :248-252).

    ``page_first_internal`` = 1 + sum of question counts on *all* prior
    pages of the doc — including image pages, which are counted but not
    emitted in no-images mode (F2 ordering trap, reference :250-258).
    MUST run before any image-page filter.
    """
    w = (
        Window.partitionBy("doc_id")
        .orderBy("page_index")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return pages.withColumn(
        "page_first_internal",
        (F.coalesce(F.sum("n_questions").over(w), F.lit(0)) + 1).cast("int"),
    )


def drop_image_pages(pages: DataFrame) -> DataFrame:
    """F2 — in no-images mode, image pages are skipped *after* counting
    (reference :254-258; consumed :695-696,:853-854)."""
    return pages.filter(F.coalesce(F.col("n_images"), F.lit(0)) == 0)


def segment_questions(pages: DataFrame) -> DataFrame:
    """X10/X11/X12/F8 — split page text into per-question bodies.

    The reference walks ``str.find`` positions and slices between
    consecutive delimiters with an appended terminator
    (reference :179-186,:263,:434-448). ``posexplode(split(text, DELIM))``
    yields the same bodies: element 0 is the (empty) prefix before the
    first delimiter — dropped, as the reference drops the match at
    position 0 (F8, reference :434-435).

    Output grain: one row per question with ``pos`` (1-based intra-page
    order), ``internal_num`` (W2 — the reference's ``answer_number``
    counter :429,:504) and ``question_text`` re-prefixed with the
    delimiter.
    """
    parts = F.split(F.col("text"), DELIM)
    return (
        pages.select(
            "doc_id",
            "year",
            "day",
            "color",
            "page_index",
            "page_first_internal",
            F.posexplode(parts).alias("pos", "body"),
        )
        .filter(F.col("pos") >= 1)  # F8 leading-match skip
        .withColumn("internal_num", (F.col("page_first_internal") + F.col("pos") - 1).cast("int"))
        .withColumn("question_text", F.concat(F.lit(DELIM), F.col("body")))
        .drop("body")
    )


def normalize_alternative_markers(q: Column) -> tuple[Column, Column]:
    """X7 — collapse doubled-letter markers to ``X)`` and count the
    substitutions; <5 on both patterns => malformed (reference :116-137).

    Returns (normalized_text, parse_ok). Uses the native ``regexp_count``
    fast path SURVEY §4 proposes instead of a ``re.subn`` pandas UDF.
    The fallback cascade is reproduced exactly: try the doubled-letter
    pattern; if its count < 5, try the two-space pattern; if still < 5,
    the question is malformed (reference :129-134).
    """
    c1 = F.regexp_count(q, F.lit(ALT_MARKER_PATTERN))
    c2 = F.regexp_count(q, F.lit(ALT_MARKER_FALLBACK))
    primary = F.regexp_replace(q, ALT_MARKER_PATTERN, "$1)")
    fallback = F.regexp_replace(q, ALT_MARKER_FALLBACK, "$1)")
    normalized = F.when(c1 >= 5, primary).when(c2 >= 5, fallback).otherwise(q)
    parse_ok = (c1 >= 5) | (c2 >= 5)
    return normalized, parse_ok


def parse_alternatives(questions: DataFrame, text_col: str = "question_text") -> DataFrame:
    """X7 + X8 + X9 + F5 — extract the 5 ``X)...`` alternatives.

    Emits ``alternatives array<string>`` (items ``"A)..."``), the stem
    (text before the first marker) as the new ``question_text``, and
    ``parse_ok`` (false => sentinel drop downstream, reference
    :457-460). An empty alternative body also flips ``parse_ok``
    (reference :147-151).
    """
    normalized, marker_ok = normalize_alternative_markers(F.col(text_col))
    segments = F.split(normalized, ALT_SPLIT_PATTERN)
    letters = F.regexp_extract_all(normalized, F.lit(r"([A-E])\)"), 1)
    bodies = F.slice(segments, 2, 5)
    alts = F.zip_with(
        letters,
        bodies,
        lambda letter, body: F.concat(letter, F.lit(")"), F.btrim(body, F.lit(" \n\t\r"))),
    )
    has_empty = F.exists(alts, lambda a: (F.length(a) <= 2) | a.isNull())
    # Stage computed columns BEFORE overwriting question_text: the flag
    # expressions reference the raw text column (self-reference trap).
    stem = F.btrim(F.element_at(segments, 1), F.lit(" \n\t\r"))
    return (
        questions.withColumn(
            "parse_ok", marker_ok & ~F.coalesce(has_empty, F.lit(True))
        )
        .withColumn("alternatives", F.when(marker_ok, alts))
        .withColumn("_stem", stem)
        .withColumn(
            "question_text",
            F.when(F.col("parse_ok"), F.col("_stem")).otherwise(F.col(text_col)),
        )
        .drop("_stem")
    )


def printed_number(day: Column, internal_num: Column) -> Column:
    """Internal counter -> exam-printed numbering: D1 subtracts 5 when
    internal > 5 (shared English/Spanish slots, reference :342-343,
    :192-193), D2 adds 90 (reference :344-345)."""
    return F.when(
        (day == "D1") & (internal_num > 5), internal_num - 5
    ).when(day == "D1", internal_num).otherwise(internal_num + 90).cast("int")


def subject_case_expr(day: Column, internal_num: Column) -> Column:
    """J3 (CASE form) — subject bucketing by closed internal-number
    ranges (reference :408 D1, :559 D2)."""
    expr = F.lit(None).cast("string")
    for d, subject, lo, hi in reversed(SUBJECT_RANGES):
        expr = F.when((day == d) & internal_num.between(lo, hi), subject).otherwise(expr)
    return expr
