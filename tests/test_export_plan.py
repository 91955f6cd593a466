"""E2E pins for plans.export — the curate→tokenize→pack→manifest
composition (r7, VERDICT r6 next-round item 2).

The one law that makes the report trustworthy is TOKEN CONSERVATION:
what the tokenizer emitted is exactly what packing cut into sequences
and exactly what the manifest promises the training loader. These
tests run the real chain end-to-end (files on disk included) and check
the totals against each other, not against golden numbers.
"""

from __future__ import annotations

import glob
import json

import pytest
from pyspark.sql import functions as F

from tests.conftest import load


@pytest.fixture(scope="module")
def export_run(spark, sf_dir, tmp_path_factory):
    from pdf_to_vectordb_etl_spark.plans.export import export_training_data

    out = str(tmp_path_factory.mktemp("export") / "shards")
    docs = load(spark, sf_dir, "documents")
    report, packed, manifest = export_training_data(
        docs, path=out, train_pieces_with_em=False
    )
    rep = {(r.stage, r.split): r for r in report.collect()}
    return rep, packed, manifest, out


def test_funnel_monotone_and_complete(export_run):
    rep, _, _, _ = export_run
    n_in = rep[("input", "all")].n_docs
    n_dd = rep[("exact_dedup", "all")].n_docs
    n_q = rep[("quality_floor", "all")].n_docs
    assert n_in >= n_dd >= n_q > 0
    splits = {s for (stage, s) in rep if stage == "split"}
    assert splits == {"train", "holdout"}
    assert (
        rep[("split", "train")].n_docs + rep[("split", "holdout")].n_docs
        == n_q
    )


def test_token_conservation_encoded_equals_packed(export_run):
    rep, _, _, _ = export_run
    for s in ("train", "holdout"):
        enc = rep[("encoded", s)]
        pk = rep[("packed", s)]
        assert enc.n_tokens == pk.n_tokens > 0, s
        # every token landed in some sequence, sequences hold <= budget
        assert pk.n_seqs * 256 >= pk.n_tokens
        assert (pk.n_seqs - pk.n_docs) * 256 < pk.n_tokens  # no empty seqs


def test_packed_offsets_are_a_gapless_stream(export_run, spark):
    _, packed, _, _ = export_run
    # within each (split, shard), doc starts tile the token stream:
    # sum of n_tokens == last doc's start + its tokens (no gaps/overlap)
    agg = (
        packed.groupBy("split", "shard")
        .agg(
            F.sum("n_tokens").alias("t"),
            F.max(F.expr("seq_id * 256 + offset + n_tokens")).alias("end"),
        )
        .collect()
    )
    assert agg and all(r.t == r.end for r in agg)


def test_manifest_matches_report_and_disk(export_run, spark):
    rep, _, manifest, out = export_run
    man = manifest.collect()
    assert {r.shard for r in man} == set(range(4))
    assert sum(r.n_tokens for r in man) == rep[("encoded", "train")].n_tokens
    assert sum(r.n_rows for r in man) == rep[("split", "train")].n_docs
    # the written shards agree with the manifest row-for-row
    disk = spark.read.parquet(out)
    on_disk = {
        r.shard: r.n for r in disk.groupBy("shard").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    assert on_disk == {r.shard: r.n_rows for r in man}
    # and the json manifest file landed next to the data
    files = glob.glob(f"{out}/_manifest/part*.json")
    assert len(files) == 1
    rows = [json.loads(line) for line in open(files[0])]
    assert {r["shard"] for r in rows} == set(range(4))


def test_supplied_pieces_short_circuit_training(spark, sf_dir):
    # passing a piece table must skip tokenizer training entirely and
    # encode with it (the persisted-artifact contract)
    from pdf_to_vectordb_etl_spark.operators import textanalysis as ta
    from pdf_to_vectordb_etl_spark.plans.export import export_training_data

    docs = load(spark, sf_dir, "documents").limit(60)
    ascii_docs = docs.withColumn(
        "text", F.regexp_replace(F.coalesce("text", F.lit("")),
                                 r"[^\x20-\x7e]", "")
    )
    pieces = ta.unigram_seed_pieces(ascii_docs, vocab_size=32,
                                    seed_cap_factor=1)
    report, packed, manifest = export_training_data(docs, pieces=pieces)
    assert manifest is None
    rep = {(r.stage, r.split): r for r in report.collect()}
    assert rep[("encoded", "train")].n_tokens > 0


def test_bytebpe_export_conservation_and_denomination(spark, sf_dir):
    """The byte-BPE-denominated export obeys the same conservation law
    (encoded == packed per split) and its token totals are byte-BPE
    pieces: bounded below by pre-token counts and above by byte
    counts; every pre-token segments (byte fallback — no OOV), so
    encoded covers every split doc."""
    from pdf_to_vectordb_etl_spark.plans.export import export_training_data

    docs = load(spark, sf_dir, "documents")
    report, packed, _ = export_training_data(
        docs, tokenizer="bytebpe", n_merges=6
    )
    rep = {(r.stage, r.split): r for r in report.collect()}
    for s in ("train", "holdout"):
        enc = rep[("encoded", s)]
        pk = rep[("packed", s)]
        assert enc.n_tokens == pk.n_tokens > 0, s
        assert enc.n_docs == rep[("split", s)].n_docs  # no doc lost
        # byte-BPE tokens: at least one per whitespace word (splits
        # never merge across pre-token boundaries)
        assert enc.n_tokens >= rep[("split", s)].n_tokens
