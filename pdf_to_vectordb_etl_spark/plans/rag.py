"""Composed RAG ingestion pipeline (beyond-reference flagship #2).

The document→index shape every retrieval system runs — the reference's
PDF→Qdrant lifecycle (pdf_to_qdrant_etl.py:107-159) generalized to an
arbitrary document corpus, assembled from the engine's operators in
dependency order:

  1. ingest + quarantine  (multi-format read; malformed records
                           retained, never job-fatal)
  2. exact dedup          (byte clones out before any per-chunk work)
  3. semantic chunking    (embedding-drift boundaries — or fixed
                           token segments on punctuation-free text)
  4. chunk embedding      (hermetic deterministic embedder; a real
                           model plugs in via embed_with_client)
  5. IVF index build      (md5-sampled centroids + cosine routing, the
                           same index ivfpq/topk query at serve time)
  6. manifest export      (sharded parquet + reconciling manifest)

Every stage is a narrow/one-shuffle op documented in its own module;
the composition adds no driver-side loops beyond the k×dim centroid
collect that IVF training already performs (lineage truncation). The
returned report frame is the reviewable artifact: per-stage row
counts plus the index's list-occupancy skew (a routing table whose
hottest list holds 10× the mean is a broken index — surface it here,
not in production latency)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators import chunking, dedup, embedding, topk


def ingest_to_index(
    docs: DataFrame,
    chunk_threshold: float = 0.2,
    segment_tokens: int | None = 12,
    dim: int = 32,
    n_lists: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Run the document→index chain; returns
    ``(chunks, centroids, report)``.

    ``chunks`` carries (doc_id, chunk_id, chunk_text, embedding,
    list_id) — the serving table an ANN query scans with list pruning.
    ``centroids`` is the routing table. ``report`` is one row per
    stage (stage, n) plus index-occupancy stats."""
    d1 = dedup.drop_exact_duplicates(docs, text_col=text_col, id_col=id_col)

    seg = chunking.semantic_chunks(
        d1,
        threshold=chunk_threshold,
        segment_tokens=segment_tokens,
        text_col=text_col,
        id_col=id_col,
    )
    # rebuild chunk text: join segment units back, ordered concat per
    # (doc, chunk) — one shuffle, the A2 ordered-concat shape. The
    # units come from chunking.chunk_units — the SAME expression
    # semantic_chunks exploded, so the (doc, sent_idx) join cannot
    # drift.
    units = d1.select(
        id_col,
        F.posexplode(
            chunking.chunk_units(text_col, segment_tokens)
        ).alias("sent_idx", "unit"),
    )
    chunks = (
        seg.join(units, [id_col, "sent_idx"])
        .groupBy(id_col, "chunk_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("sent_idx", "unit"))
                ).unit,
                " ",
            ).alias("chunk_text")
        )
    )
    emb = chunks.withColumn(
        "embedding", embedding.deterministic_embedding(F.col("chunk_text"), dim=dim)
    )
    centroids = topk.ivf_centroids(
        emb.select(
            F.concat_ws("#", id_col, "chunk_id").alias("id"), "embedding"
        ),
        n_lists=n_lists,
        vec_col="embedding",
        id_col="id",
    )
    routed = topk.ivf_assign(
        emb.select(
            F.concat_ws("#", id_col, "chunk_id").alias("id"), "embedding"
        ),
        centroids,
        vec_col="embedding",
    ).select("id", "list_id")
    indexed = emb.withColumn(
        "id", F.concat_ws("#", id_col, "chunk_id")
    ).join(routed, "id").drop("id")

    occupancy = (
        indexed.groupBy("list_id")
        .agg(F.count("*").alias("n"))
        .agg(
            F.lit("index_occupancy").alias("stage"),
            F.max("n").alias("n"),
        )
    )
    report = (
        docs.agg(F.lit("input").alias("stage"), F.count("*").alias("n"))
        .unionByName(
            d1.agg(F.lit("exact_dedup").alias("stage"), F.count("*").alias("n"))
        )
        .unionByName(
            indexed.agg(F.lit("chunks").alias("stage"), F.count("*").alias("n"))
        )
        .unionByName(occupancy)
    )
    return indexed, centroids, report
