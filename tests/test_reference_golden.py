"""Loader-side golden parity against the reference's committed outputs.

The reference commits real extraction results (TXT + JSON per
(year, subject), pivoted count CSVs) under
/root/reference/pdf_content_to_files/ and /root/reference/
extraction_metadata/ (SURVEY §5.3). Its loader re-derives question
chunks from the TXT by splitting on the literal ``(RESPOSTA CORRETA)``
key (reference qdrant_text_loader.py:66-76). Our W4 chunker consuming
the SAME committed TXT must recover exactly the question set the
committed JSON records — count, question numbers, and answer letters —
which pins the engine's chunking/regex semantics to the reference's
real-world behavior, not just synthetic fixtures.

The reference tree is read-only input data here; skipped when absent.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from pyspark.sql import functions as F

from pdf_to_vectordb_etl_spark.functions import filename as fn
from pdf_to_vectordb_etl_spark.operators import chunking

REF = "/root/reference/pdf_content_to_files"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference golden files not present"
)

# documented yields (SURVEY §5.3 / BASELINE.md): 2023, no-images mode
GOLDEN_COUNTS_2023 = {"eng": 0, "spani": 3, "lang": 31, "huma": 29, "math": 35, "natu": 37}


def _golden_txts(spark):
    """S5 — whole-file TXT scan + X1/X2/X16 filename parsing on the
    reference's real file names."""
    df = spark.read.text(f"{REF}/*/*_questions.txt", wholetext=True).select(
        F.input_file_name().alias("path"), F.col("value").alias("content")
    )
    tail = fn.file_tail(F.col("path"))
    return df.select(
        fn.year_of(tail).alias("year"),
        fn.subject_of(tail).alias("subject"),
        "content",
    )


def test_filename_tokens_on_real_names(spark):
    rows = _golden_txts(spark).select("year", "subject").collect()
    got = {(r["year"], r["subject"]) for r in rows}
    # eng's golden TXT is 0 bytes (0 questions): the text source emits
    # no row for it — the same skip the reference applies (F6)
    assert got == {(2023, s) for s, n in GOLDEN_COUNTS_2023.items() if n > 0}


def test_chunk_counts_match_golden_json(spark):
    txts = _golden_txts(spark)
    chunks = chunking.split_chunks(txts, text_col="content", key_cols=("year", "subject"))
    got = {
        r["subject"]: r["n_chunks"]
        for r in chunking.chunk_counts(chunks).collect()
    }
    want = {}
    for p in glob.glob(f"{REF}/*/*_questions.json"):
        recs = json.load(open(p))
        subj = os.path.basename(p).split("_")[1]
        want[subj] = len(recs)
    # empty subjects produce no TXT chunks (reference skips empty:
    # qdrant_text_loader.py:194-196) — drop zero entries on both sides
    want = {k: v for k, v in want.items() if v > 0}
    got = {k: v for k, v in got.items() if v > 0}
    assert got == want
    assert want == {k: v for k, v in GOLDEN_COUNTS_2023.items() if v > 0}


def test_chunk_answers_match_golden_json(spark):
    """Each re-derived chunk must carry the same (question_num ->
    correct_answer) pairs the reference extracted (J2 parity on real
    data, incl. the D2 +90 printed-number shift)."""
    txts = _golden_txts(spark)
    chunks = chunking.split_chunks(txts, text_col="content", key_cols=("year", "subject"))
    parsed = chunks.select(
        "subject",
        F.regexp_extract("chunk", r"QUESTÃO (\d+)", 1).cast("int").alias("qnum"),
        F.regexp_extract("chunk", r"\(RESPOSTA CORRETA\): ?(\S+)", 1).alias("ans"),
    )
    got = {
        (r["subject"], r["qnum"]): r["ans"] for r in parsed.collect()
    }
    import re as _re

    want = {}
    for p in glob.glob(f"{REF}/*/*_questions.json"):
        subj = os.path.basename(p).split("_")[1]
        for rec in json.load(open(p)):
            # join on the PRINTED number from the question text: the
            # reference's question_num field is positional (counter+90)
            # and real exams print questions out of positional order
            printed = int(_re.search(r"QUESTÃO (\d+)", rec["question_text"]).group(1))
            want[(subj, printed)] = rec["correct_answer"]
    assert got == want
    # D2 printed numbers carry the +90 shift (math 136-177, natu 91-131)
    assert min(q for (s, q) in want if s == "math") >= 136
    assert min(q for (s, q) in want if s == "natu") >= 91


def test_txt_render_byte_parity_with_golden(spark):
    """O1/X13/A2 — rendering the golden JSON records through our TXT
    template and order-preserving concat reproduces the committed golden
    TXT files byte-for-byte (all 5 non-empty 2023 subjects)."""
    from pdf_to_vectordb_etl_spark.functions.textops import txt_record

    for p in glob.glob(f"{REF}/*/*_questions.json"):
        recs = json.load(open(p))
        if not recs:
            continue
        golden = open(p.replace(".json", ".txt")).read()
        df = spark.createDataFrame(
            [
                (r["question_num"], r["year"], r["question_text"], r["correct_answer"])
                for r in recs
            ],
            "question_num int, year int, question_text string, correct_answer string",
        )
        rendered_rows = (
            df.select(
                "question_num",
                txt_record(
                    F.col("year"), F.col("question_text"), F.col("correct_answer")
                ).alias("txt"),
            )
            # question_num is the reference's positional counter: ordering
            # by it reproduces document order (A2's order-preservation)
            .groupBy()
            .agg(
                F.array_join(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("question_num", "txt"))
                        ),
                        lambda s: s["txt"],
                    ),
                    "",
                ).alias("content")
            )
            .collect()
        )
        assert rendered_rows[0]["content"] == golden, os.path.basename(p)


def test_stats_pivot_reproduces_qdrant_csv_rows(spark):
    """O7 — feeding the reference's own 2022 golden counts through our
    long-form stats -> reference-shaped pivot reproduces the committed
    qdrant_extraction_data.csv row exactly (cells, labels, float form)."""
    import csv as csvmod

    from pdf_to_vectordb_etl_spark.operators import aggregates

    ref_csv = "/root/reference/extraction_metadata/qdrant_extraction_data.csv"
    rows = list(csvmod.reader(open(ref_csv)))
    header, data = rows[0][1:], rows[1:]
    ref_2022 = {
        r[0]: {s: v for s, v in zip(header, r[1:])}
        for r in data
        if r[0].startswith("2022")
    }
    long_rows = []
    for label, cells in ref_2022.items():
        kind = "todas_questoes" if "todas" in label else "questoes_add"
        for s, v in cells.items():
            if v:
                long_rows.append((2022, s, kind, int(float(v))))
    stats = spark.createDataFrame(
        long_rows, "year int, subject string, kind string, n long"
    )
    out = aggregates.stats_pivot_reference_csv(stats, subjects=header)
    got = {
        r[""]: {s: r[s] for s in header if r[s] is not None}
        for r in out.collect()
    }
    want = {
        label: {s: float(v) for s, v in cells.items() if v}
        for label, cells in ref_2022.items()
    }
    assert got == want


def test_pivot_csv_matches_reference_shape(spark):
    """O7 — our pivot of the golden counts reproduces the committed
    extraction_metadata CSV's 2023 row (test_extraction_metadata.csv)."""
    import csv as csvmod

    ref_csv = "/root/reference/extraction_metadata/test_extraction_metadata.csv"
    rows = list(csvmod.reader(open(ref_csv)))
    header = rows[0][1:]
    year_row = next((r for r in rows[1:] if r[0].startswith("2023 todas")), None)
    if year_row is None:
        pytest.skip("2023 row not committed in reference CSV")
    ref_counts = {
        s: int(float(v)) for s, v in zip(header, year_row[1:]) if v not in ("", None)
    }
    ours = {
        s: n for s, n in GOLDEN_COUNTS_2023.items() if s in ref_counts
    }
    assert ours == ref_counts


def test_json_sink_byte_parity_with_golden(spark, tmp_path):
    """O2 pretty mode — writing the golden records back through
    ``write_subject_json(pretty=True)`` reproduces every committed
    non-empty reference JSON file byte-for-byte (indent=4 arrays,
    reference key order, question order)."""
    from pdf_to_vectordb_etl_spark import sinks

    goldens = [p for p in glob.glob(f"{REF}/*/*_questions.json") if json.load(open(p))]
    if not goldens:
        pytest.skip("no non-empty golden JSON committed")
    rows = []
    for p in goldens:
        subj = os.path.basename(p).split("_")[1]
        for r in json.load(open(p)):
            rows.append(
                (
                    r["question_text"], r["correct_answer"], r["alternatives"],
                    r["ID"], r["year"], r["day"], r["question_num"], subj,
                )
            )
    df = spark.createDataFrame(
        rows,
        "question_text string, correct_answer string, alternatives array<string>, "
        "ID string, year int, day string, question_num int, subject string",
    )
    out = str(tmp_path / "json_tree")
    sinks.write_subject_json(df, out, pretty=True)
    for p in goldens:
        rel = os.path.relpath(p, REF)
        got = open(os.path.join(out, rel), "rb").read()
        want = open(p, "rb").read()
        assert got == want, f"byte mismatch for {rel}"
