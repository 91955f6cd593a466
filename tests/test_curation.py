"""Curation operators: repetition metrics, per-domain caps,
deterministic sharding, benchmark contamination."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pdf_to_vectordb_etl_spark.operators import curation

from tests.conftest import load


def test_repetition_metrics_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # 4x "spam", 1x "ham": top unigram 4/5; top bigram "spam spam"
            # 3/4; top trigram "spam spam spam" 2/3
            (1, "spam spam spam spam ham"),
            # all distinct: every fraction is 1/count
            (2, "a b c d"),
            # single word: unigram 1.0, no bi/trigrams -> NULL
            (3, "solo"),
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in curation.repetition_metrics(df).collect()}
    assert got[1]["top_unigram_frac"] == 0.8
    assert got[1]["top_bigram_frac"] == 0.75
    assert got[1]["top_trigram_frac"] == round(2 / 3, 6)
    assert got[2]["top_unigram_frac"] == 0.25
    assert got[2]["top_bigram_frac"] == round(1 / 3, 6)
    assert got[3]["top_unigram_frac"] == 1.0
    assert got[3]["top_bigram_frac"] is None
    assert got[3]["top_trigram_frac"] is None


def test_cap_per_group_bounds_and_determinism(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    capped = curation.cap_per_group(docs, by="source", n=10)
    sizes = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 10 for r in sizes)
    # deterministic: same rows on a different partition layout
    a = {r["doc_id"] for r in capped.select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in curation.cap_per_group(docs.repartition(13), by="source", n=10)
        .select("doc_id")
        .collect()
    }
    assert a == b and len(a) > 0


def test_shard_shuffle_contiguous_and_salted(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    s = curation.shard_shuffle(docs, n_shards=8, salt="epoch0")
    rows = s.select("shard", "pos").collect()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # positions are 1..count within every shard (a valid total order)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    assert len(rows) == docs.count()
    # a different salt produces a different order
    order0 = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in curation.shard_shuffle(docs, 8, salt="epoch0").collect()
    }
    order1 = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in curation.shard_shuffle(docs, 8, salt="epoch1").collect()
    }
    assert order0 != order1 and set(order0) == set(order1)


def test_pack_sequences_stream_invariants(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    budget = 256
    packed = curation.pack_sequences(docs, budget=budget, n_shards=4)
    rows = packed.collect()
    assert len(rows) == docs.count()  # no zero-token docs in testdata
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r["offset"] < budget
        # span covers exactly the doc's token footprint in the stream
        start = r["seq_id"] * budget + r["offset"]
        end = start + r["n_tokens"] - 1
        assert r["n_seqs_spanned"] == end // budget - r["seq_id"] + 1
        by_shard.setdefault(r["shard"], []).append((start, end))
    # the stream is gapless per shard: footprints tile [0, total)
    for spans in by_shard.values():
        spans.sort()
        assert spans[0][0] == 0
        for (_, ae), (bs, _) in zip(spans, spans[1:]):
            assert bs == ae + 1


def test_quality_quantile_filter_keeps_top_three_quarters(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    kept = curation.quality_quantile_filter(docs, q=0.25, by="lang")
    per_lang_total = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    per_lang_kept = {r["lang"]: r["count"] for r in kept.groupBy("lang").count().collect()}
    for lang, total in per_lang_total.items():
        # ~75% survive (interpolated cutoff can exclude one extra row;
        # ties at the cutoff can only add rows)
        assert per_lang_kept[lang] >= 0.75 * total - 1
    # every kept score is at or above its group cutoff
    assert kept.filter(F.col("score") < F.col("cutoff")).count() == 0


def test_mixture_plan_feasible_and_proportional(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 100 else ("b" if i < 130 else "c")) for i in range(140)],
        "doc_id int, source string",
    )
    wt = F.when(F.col("source") == "a", 6.0).when(F.col("source") == "b", 3.0).otherwise(1.0)
    plan = {r["source"]: r for r in curation.mixture_plan(df, wt).collect()}
    # binding constraint: b has 30 docs at weight 3 -> T = 10
    assert plan["b"]["n_keep"] == 30
    assert plan["a"]["n_keep"] == 60  # 6 * 10
    assert plan["c"]["n_keep"] == 10  # 1 * 10
    for r in plan.values():
        assert r["n_keep"] <= r["n_docs"]
        assert abs(r["rate"] - r["n_keep"] / r["n_docs"]) < 1e-6


def test_contamination_detects_planted_overlap(spark):
    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [
            (1, f"intro words then {passage} trailing tail words here"),
            (2, "completely disjoint text with no shared long phrases at all"),
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, f"benchmark question: {passage} answer: none")],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r
        for r in curation.contamination_check(corpus, bench, n=8).collect()
    }
    assert got[1]["contaminated"] and got[1]["n_overlap"] == 3
    assert not got[2]["contaminated"] and got[2]["n_overlap"] == 0


def test_grouped_split_no_group_straddles(spark, sf_dir):
    from pdf_to_vectordb_etl_spark.operators import sampling

    docs = load(spark, sf_dir, "documents")
    s = sampling.grouped_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    per_group = s.groupBy("source").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_group.filter(F.col("n_splits") > 1).count() == 0
    # every row labeled, all three split names only
    names = {r["split"] for r in s.select("split").distinct().collect()}
    assert names <= {"train", "val", "test"}
    assert s.count() == docs.count()


def test_containment_catches_subset_jaccard_misses(spark):
    from pdf_to_vectordb_etl_spark.operators import dedup

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    page = ("intro words here before the excerpt " + quote +
            " and then a very long tail " + " ".join(f"w{i}" for i in range(60)))
    df = spark.createDataFrame(
        [(1, quote), (2, page), (3, "completely different content entirely here")],
        "doc_id long, text string",
    )
    cont = dedup.ngram_containment_pairs(df, threshold=0.9)
    got = {(r["id_a"], r["id_b"]) for r in cont.collect()}
    assert (1, 2) in got  # the quote is fully contained
    jac = dedup.ngram_jaccard_pairs(df, threshold=0.5)
    assert (1, 2) not in {(r["id_a"], r["id_b"]) for r in jac.collect()}


def test_weighted_sample_rates_track_weights(spark):
    from pdf_to_vectordb_etl_spark.operators import sampling

    n = 4000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 0.9).otherwise(0.1).alias("w"),
    )
    kept = sampling.weighted_sample(df, F.col("w"))
    hi = kept.filter(F.col("w") == 0.9).count() / (n / 2)
    lo = kept.filter(F.col("w") == 0.1).count() / (n / 2)
    assert 0.85 < hi < 0.95 and 0.05 < lo < 0.15
    # deterministic: same ids survive on re-run
    again = {r["doc_id"] for r in sampling.weighted_sample(df, F.col("w")).collect()}
    assert again == {r["doc_id"] for r in kept.collect()}
    # clamping: weight > 1 keeps everything, < 0 keeps nothing
    assert sampling.weighted_sample(df, F.lit(5.0)).count() == n
    assert sampling.weighted_sample(df, F.lit(-1.0)).count() == 0
