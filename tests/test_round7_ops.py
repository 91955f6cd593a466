"""Round-7 operator pins: T30 streaming Bloom dedup (multi-batch) and
the collapse-exact graded-minhash invariants not covered by the oracle
gate."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from tests.conftest import load


def test_t30_multibatch_admits_exactly_the_batch_digest_set(spark, sf_dir):
    """Three micro-batches (3 files, maxFilesPerTrigger=1): the admitted
    DIGEST set must equal the batch twin's — each unseen digest admitted
    exactly once, across batch boundaries (the persisted _digests table
    is the cross-batch memory). Row ids can differ from the batch twin
    when a later batch carries a smaller id for an already-admitted
    digest, so the pin is on digests — the admit decision itself."""
    from pdf_to_vectordb_etl_spark.operators import dedup
    from pdf_to_vectordb_etl_spark.streaming.pipeline import (
        stream_bloom_dedup_ingest,
    )

    docs = load(spark, sf_dir, "documents").limit(300)
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    corpus, new = docs.filter(h < "8"), docs.filter(h >= "8")
    corpus_digests = dedup.content_digests(corpus)

    src = tempfile.mkdtemp(prefix="t30src")
    new.repartition(3).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = tempfile.mkdtemp(prefix="t30out")
    q = stream_bloom_dedup_ingest(
        stream, corpus_digests, out, tempfile.mkdtemp(prefix="t30ck")
    )
    q.awaitTermination(300)
    assert q.lastProgress["batchId"] >= 2, "expected >= 3 micro-batches"

    got = spark.read.parquet(f"{out}/data")
    got_digests = sorted(
        r.digest for r in dedup.content_digests(got).select("digest").collect()
    )
    want = dedup.incremental_exact_dedup(new, corpus_digests)
    want_digests = sorted(
        r.digest
        for r in dedup.content_digests(want).select("digest").collect()
    )
    assert got_digests == want_digests and len(got_digests) > 0
    # exactly-once per digest: no digest admitted twice across batches
    assert len(got_digests) == len(set(got_digests)) == got.count()


def test_t30_second_run_admits_nothing_new(spark, sf_dir):
    """Replaying the SAME stream into the same out dir (fresh
    checkpoint, so batches re-fire) must admit zero rows — the
    persisted digest table makes re-ingest idempotent at the digest
    level."""
    from pdf_to_vectordb_etl_spark.operators import dedup
    from pdf_to_vectordb_etl_spark.streaming.pipeline import (
        stream_bloom_dedup_ingest,
    )

    docs = load(spark, sf_dir, "documents").limit(120)
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    corpus_digests = dedup.content_digests(docs.filter(h < "8"))
    new = docs.filter(h >= "8")

    src = tempfile.mkdtemp(prefix="t30src2")
    new.coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    out = tempfile.mkdtemp(prefix="t30out2")

    def run():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = stream_bloom_dedup_ingest(
            stream, corpus_digests, out, tempfile.mkdtemp(prefix="t30ck2")
        )
        q.awaitTermination(300)

    run()
    n1 = spark.read.parquet(f"{out}/data").count()
    run()
    n2 = spark.read.parquet(f"{out}/data").count()
    assert n1 > 0 and n2 == n1
