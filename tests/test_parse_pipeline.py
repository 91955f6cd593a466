"""Parse-pipeline correctness against the pure-Python corpus oracle.

Pins the reference semantics SURVEY §7 flags as easy to get silently
wrong: F2's count-then-skip ordering, F5's malformed drop, J4's shared
printed slots, and the continuous cross-page numbering (W1/W2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_to_vectordb_etl_spark.operators import joins, parse
from pdf_to_vectordb_etl_spark.plans import etl
from pdf_to_vectordb_etl_spark.sources import synthetic

YEARS = (2022, 2023)


def _questions(spark):
    pages = synthetic.corpus_df(spark, years=YEARS)
    return etl.extract_questions(pages)


def test_counts_match_python_oracle(spark):
    got = {
        (r["year"], r["subject"]): r["n"]
        for r in etl.extraction_report(_questions(spark)).collect()
    }
    expected = synthetic.expected_question_counts(years=YEARS)
    assert got == expected


def test_numbering_continuous_and_printed_ranges(spark):
    q = _questions(spark).collect()
    # printed ranges: D1 1..90 (eng/spa share 1-5), D2 91..181
    for r in q:
        if r["day"] == "D1":
            assert 1 <= r["question_num"] <= 90
        else:
            assert 91 <= r["question_num"] <= 181
    # internal numbering continuous per doc over NON-dropped pages:
    # dropped image pages leave gaps exactly equal to their question count
    by_doc: dict = {}
    for r in q:
        by_doc.setdefault(r["doc_id"], []).append(r["internal_num"])
    for doc, nums in by_doc.items():
        assert len(nums) == len(set(nums)), doc


def test_image_pages_counted_but_not_emitted(spark):
    """F2: questions on image pages advance numbering but are absent."""
    pages = synthetic.corpus_df(spark, years=(2022,))
    pv = pages.filter(F.col("kind") == "PV")
    numbered = parse.number_pages(parse.preprocess_pages(pv))
    img_pages = numbered.filter(F.col("n_images") > 0).collect()
    assert img_pages, "fixture must contain image pages"
    emitted = etl.extract_questions(pages).collect()
    emitted_keys = {(r["doc_id"], r["internal_num"]) for r in emitted}
    for p in img_pages:
        for k in range(p["n_questions"]):
            assert (p["doc_id"], p["page_first_internal"] + k) not in emitted_keys
    # and numbers after an image page still follow the gap
    after = [
        r
        for r in emitted
        if r["doc_id"] == img_pages[0]["doc_id"]
        and r["internal_num"] > img_pages[0]["page_first_internal"]
    ]
    assert after, "questions after the image page must keep numbering"


def test_answers_join_and_sentinel(spark):
    q = _questions(spark).collect()
    miss = [r for r in q if r["correct_answer"] is None]
    hit = [r for r in q if r["correct_answer"] is not None]
    assert hit, "most questions must find an answer"
    assert miss, "fixture must exercise the missing-slot NULL path"
    for r in hit:
        assert r["correct_answer"] == synthetic.answer_letter(
            r["year"], r["day"], r["question_num"]
        )
    # compat mode reproduces the literal sentinel (reference :210)
    pages = synthetic.corpus_df(spark, years=(2022,))
    compat = etl.extract_questions(pages, compat_sentinel=True)
    n_sentinel = compat.filter(
        F.col("correct_answer") == joins.ANSWER_MISS_SENTINEL
    ).count()
    assert n_sentinel == len([r for r in miss if r["year"] == 2022])


def test_alternatives_parsed(spark):
    q = _questions(spark).collect()
    for r in q:
        alts = r["alternatives"]
        assert alts is not None and len(alts) == 5, r["ID"]
        assert [a[0] for a in alts] == list("ABCDE")
        assert all(a[1] == ")" and len(a) > 2 for a in alts)
        assert r["question_text"].startswith("QUESTÃO")


def test_malformed_dropped_but_numbered(spark):
    """F5: malformed questions vanish yet their numbers stay consumed."""
    pages = synthetic.corpus_df(spark, years=(2022,))
    kept = etl.extract_questions(pages, keep_malformed=True)
    bad = kept.filter(~F.col("parse_ok"))
    assert bad.count() > 0, "fixture must contain malformed questions"
    # compare on (doc_id, internal_num): the reference's printed ID space
    # collides between D1 eng and spani (shared slots 1-5, J4)
    good = {
        (r["doc_id"], r["internal_num"])
        for r in etl.extract_questions(pages).collect()
    }
    for r in bad.collect():
        assert (r["doc_id"], r["internal_num"]) not in good


def test_subject_case_equals_range_join(spark):
    pages = synthetic.corpus_df(spark, years=(2022,))
    q = etl.extract_questions(pages)
    dim = joins.subject_dim(spark)
    via_join = joins.bucket_subjects_range_join(q.drop("subject"), dim)
    a = {(r["ID"], r["subject"]) for r in q.select("ID", "subject").collect()}
    b = {(r["ID"], r["subject"]) for r in via_join.select("ID", "subject").collect()}
    assert a == b


def test_pairing_all_or_nothing(spark):
    pages = synthetic.corpus_df(spark, years=(2022,))
    files = pages.select("doc_id", "year", "kind", "day", "color").distinct()
    pairs, orphans = joins.pair_tests_with_keys(files)
    assert orphans.count() == 0
    assert pairs.count() == files.filter(F.col("kind") == "PV").count()
    # drop one key -> its test becomes an orphan (reference all-or-nothing :70-71)
    broken = files.filter(~((F.col("kind") == "GB") & (F.col("day") == "D1")))
    pairs2, orphans2 = joins.pair_tests_with_keys(broken)
    assert orphans2.count() == 1


def test_sentence_chunks_overlap_and_coverage(spark):
    from pdf_to_vectordb_etl_spark.operators import chunking

    text = " ".join(f"Sentence number {i}." for i in range(11))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        r["chunk_id"]: (r["chunk_text"], r["n_sentences"])
        for r in chunking.sentence_chunks(
            df, sentences_per_chunk=5, overlap=1
        ).collect()
    }
    # 11 sentences, K=5, stride=4 -> starts 0, 4, 8
    assert sorted(got) == [0, 1, 2]
    assert got[0][1] == 5 and got[1][1] == 5 and got[2][1] == 3
    # overlap: chunk 1 starts with the last sentence of chunk 0
    assert got[1][0].startswith("Sentence number 4.")
    assert got[0][0].endswith("Sentence number 4.")
    # every sentence appears at least once across chunks
    all_text = " ".join(t for t, _ in got.values())
    assert all(f"Sentence number {i}." in all_text for i in range(11))


def test_sentence_chunks_short_doc_single_chunk(spark):
    from pdf_to_vectordb_etl_spark.operators import chunking

    df = spark.createDataFrame(
        [(1, "Only one. Two here."), (2, "No enders at all")],
        "doc_id long, text string",
    )
    got = chunking.sentence_chunks(df, 5, 1).collect()
    assert {(r["doc_id"], r["chunk_id"]) for r in got} == {(1, 0), (2, 0)}
