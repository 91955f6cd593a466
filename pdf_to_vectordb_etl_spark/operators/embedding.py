"""Embedding stage (SURVEY §2.12 U3, §1.5 vector points).

The reference embeds each chunk with ONE OpenAI HTTPS call per chunk,
serially (reference qdrant_text_loader.py:283 -> :58-64) — its dominant
cost. Here the stage is:

- a *deterministic* native embedder (pure Catalyst expressions) used by
  tests/bench — hermetic, JVM-side, scales linearly;
- an Arrow-batched **iterator pandas UDF** wrapper for real clients
  (OpenAI-compatible or any callable), which batches texts per Arrow
  batch instead of per row — the 10-100x fix for U3. The client import
  is deferred and optional: no network or package needed until a real
  embedder is injected.

ID assignment (SURVEY §2.5 W3): deterministic ``xxhash64(ID)`` by
default — idempotent under retries and concurrent writers; the
reference's count-continuation scheme (qdrant_text_loader.py:189,:276)
is kept as an explicit compat mode via a single-partition row_number.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F, types as T

from ..schemas import EMBEDDING_DIM


def deterministic_embedding(
    text: Column | str, dim: int = 64, normalize: bool = True
) -> Column:
    """Pseudo-embedding from text content, fully native.

    Component i = scaled ``xxhash64(text, i)`` in [-1, 1); optionally
    L2-normalized so cosine against other embeddings is dot-product-
    comparable. Deterministic across executors/retries — the hermetic
    stand-in for a real model (SURVEY §7 hard part 5).
    """
    t = F.col(text) if isinstance(text, str) else text
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (F.pmod(F.xxhash64(t, i), F.lit(100000)) / 50000.0 - 1.0),
    )
    if normalize:
        norm = F.sqrt(F.aggregate(comp, F.lit(0.0), lambda acc, v: acc + v * v))
        comp = F.transform(comp, lambda v: (v / norm).cast("float"))
    else:
        comp = comp.cast(T.ArrayType(T.FloatType()))
    # hash functions treat NULL input as the seed: keep NULL text -> NULL
    return F.when(t.isNull(), F.lit(None)).otherwise(comp)


def embed_with_client(
    df: DataFrame,
    embed_fn: Callable[[list[str]], list[list[float]]],
    text_col: str = "chunk",
    out_col: str = "vector",
    dim: int = EMBEDDING_DIM,
    batch_size: int = 128,
    max_retries: int = 2,
    retry_backoff_s: float = 0.0,
    on_error: str = "raise",
) -> DataFrame:
    """U3 as an iterator-of-series pandas UDF around any batch client.

    ``embed_fn(texts) -> vectors`` is called once per ``batch_size``
    texts from inside each Arrow batch — executor-side, parallel across
    partitions, batched over the wire (the reference calls the API once
    per chunk, serially: qdrant_text_loader.py:283).

    Failure semantics (a real API client WILL flake):

    - each sub-batch call is retried up to ``max_retries`` times with
      exponential backoff (``retry_backoff_s`` · 2^attempt; 0 disables
      sleeping) — retries happen INSIDE the task, so one 429/timeout
      doesn't burn a whole Spark task attempt and re-embed every other
      sub-batch in the partition;
    - a client that returns the wrong number of vectors is a contract
      violation, surfaced as ValueError immediately — never silently
      misaligning every subsequent row in the Arrow batch;
    - ``on_error='raise'`` (default) re-raises after retries exhaust,
      failing the task; ``on_error='null'`` contains the blast radius
      to the failing sub-batch — its rows get NULL vectors, every
      other row still embeds, and the NULLs are a filterable signal
      for a later repair pass.
    """
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null': {on_error!r}")

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import time as _time

        for texts in batches:
            out: list[list[float] | None] = []
            vals = texts.fillna("").tolist()
            for lo in range(0, len(vals), batch_size):
                sub = vals[lo : lo + batch_size]
                for attempt in range(max_retries + 1):
                    try:
                        vecs = list(embed_fn(sub))
                        if len(vecs) != len(sub):
                            raise ValueError(
                                f"embed_fn returned {len(vecs)} vectors "
                                f"for {len(sub)} texts — refusing to "
                                "misalign rows"
                            )
                        break
                    except Exception:
                        if attempt == max_retries:
                            if on_error == "null":
                                vecs = [None] * len(sub)
                                break
                            raise
                        if retry_backoff_s > 0:
                            _time.sleep(retry_backoff_s * (2**attempt))
                out.extend(vecs)
            yield pd.Series(out)

    return df.withColumn(out_col, _embed(F.col(text_col)))


def fake_client_embed(texts: list[str], dim: int = EMBEDDING_DIM) -> list[list[float]]:
    """Deterministic stand-in for an embeddings API client (blake2-
    seeded), used to exercise the pandas-UDF path hermetically. A real
    OpenAI-compatible client drops in with the same signature."""
    import hashlib
    import struct

    out = []
    for t in texts:
        h = hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest()
        (seed,) = struct.unpack("<q", h)
        vec, x = [], seed & 0xFFFFFFFFFFFFFFFF
        for _ in range(dim):
            # splitmix64 stream
            x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            z = x
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            z ^= z >> 31
            vec.append((z >> 11) / float(1 << 53) * 2.0 - 1.0)
        norm = sum(v * v for v in vec) ** 0.5 or 1.0
        out.append([v / norm for v in vec])
    return out


def openai_embed_fn(
    model: str = "text-embedding-ada-002", api_key: str | None = None
) -> Callable[[list[str]], list[list[float]]]:
    """Real-client factory (reference model: qdrant_text_loader.py:29).

    Import is deferred and failure is explicit — this container has no
    network/SDK; inject :func:`fake_client_embed` in tests instead.
    """
    try:
        from openai import OpenAI  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - SDK not in test env
        raise NotImplementedError(
            "openai SDK not installed; use fake_client_embed or any "
            "callable(list[str]) -> list[list[float]]"
        ) from e

    client = OpenAI(api_key=api_key)  # pragma: no cover

    def _embed(texts: list[str]) -> list[list[float]]:  # pragma: no cover
        rsp = client.embeddings.create(model=model, input=texts)
        return [d.embedding for d in rsp.data]

    return _embed


# ------------------------------------------------------------- vector points

def assign_ids(
    df: DataFrame,
    natural_key: str | tuple[str, ...] = ("ID", "subject"),
    mode: str = "hash",
    offset: int = 0,
    order_cols: tuple[str, ...] = ("materia", "chunk_index"),
) -> DataFrame:
    """Vector-point IDs (SURVEY §2.5 W3).

    ``hash``: ``xxhash64(natural_key...)`` — deterministic, idempotent,
    shuffle-free; the scale default. The key defaults to (ID, subject)
    because the reference's question IDs alone are NOT unique: D1
    English and Spanish share printed numbers 3-5 (SURVEY §1.1), so
    ``2022_D1_N3`` names two questions. ``sequential``: reference-compat
    count-continuation (qdrant_text_loader.py:189,:210-211) — a single-
    partition window; correct but serializing, gated to compat use.

    NOTE: under Spark's default case-INsensitive resolution the added
    ``id`` column REPLACES an existing ``ID`` column — capture the
    natural key first if you need it downstream.
    """
    if mode == "hash":
        keys = (natural_key,) if isinstance(natural_key, str) else natural_key
        return df.withColumn("id", F.xxhash64(*[F.col(k) for k in keys]))
    if mode == "sequential":
        w = Window.orderBy(*order_cols)
        return df.withColumn(
            "id", (F.row_number().over(w) + F.lit(offset) - 1).cast("long")
        )
    raise ValueError(f"unknown id mode: {mode}")


def vector_points(
    chunks: DataFrame,
    text_col: str = "chunk",
    subject_col: str = "subject",
    year_col: str = "year",
    vector_col: str = "vector",
) -> DataFrame:
    """Shape rows as the reference's Qdrant point payload (N3:
    qdrant_text_loader.py:205-211): flat id/vector plus the nested
    ``{page_content, metadata{materia, ano}}`` struct."""
    return chunks.select(
        F.col("id"),
        F.col(vector_col).alias("vector"),
        F.struct(
            F.col(text_col).alias("page_content"),
            F.struct(
                F.col(subject_col).alias("materia"),
                F.col(year_col).cast("int").alias("ano"),
            ).alias("metadata"),
        ).alias("payload"),
    )


def jl_sign_matrix(in_dim: int, out_dim: int, seed: str = "jl0") -> list[list[float]]:
    """Deterministic ±1/sqrt(out_dim) Johnson–Lindenstrauss projection
    matrix (Achlioptas 2003, public result): sign of bit 0 of
    md5(seed:j:i). Pure function of (dims, seed) — any engine or
    language regenerates the identical matrix, so a SQL oracle can
    replay the projection exactly. out_dim x in_dim, kilobytes."""
    import hashlib

    scale = 1.0 / (out_dim ** 0.5)
    return [
        [
            scale
            if hashlib.md5(f"{seed}:{j}:{i}".encode()).digest()[0] % 2 == 0
            else -scale
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    df: DataFrame,
    out_dim: int = 16,
    in_dim: int | None = None,
    vec_col: str = "embedding",
    seed: str = "jl0",
) -> DataFrame:
    """JL random projection: embed dim -> out_dim with distances
    preserved in expectation — the cheap pre-step that makes clustering
    / near-dup candidate generation O(out_dim) per comparison instead
    of O(dim).

    The sign matrix is a driver-side constant folded into the plan as a
    literal (out_dim x in_dim doubles — kilobytes), so the projection
    is a narrow, shuffle-free codegen projection: per row,
    out_dim x in_dim multiply-adds inside higher-order functions. No
    UDF, no join, nothing leaves the scan stage; at 100 TB this runs at
    I/O speed."""
    if in_dim is None:
        in_dim = len(df.select(vec_col).first()[0])
    mat = jl_sign_matrix(in_dim, out_dim, seed)
    rows = F.array(*[
        F.array(*[F.lit(x) for x in row]) for row in mat
    ])
    v = F.col(vec_col).cast("array<double>")
    proj = F.transform(
        rows,
        lambda r: F.round(
            F.aggregate(
                F.zip_with(r, v, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ),
    )
    return df.withColumn("projected", proj)


def matryoshka_topk_recall(
    corpus: DataFrame,
    queries: DataFrame,
    prefix_dims: tuple[int, ...] = (16, 32),
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id: str = "qid",
) -> DataFrame:
    """Recall@k of prefix-truncated cosine rankings against the
    full-dimension ranking — the evaluation that decides how far a
    Matryoshka-style embedding (Kusupati et al. 2022: information
    front-loaded into leading dims) can be cut for cheap first-stage
    retrieval.

    The broadcast cross join projects ALL similarity columns (full +
    every prefix) in one expression tree; each ranking is a per-query
    window with a rank filter (WindowGroupLimit — k rows per query
    leave each partition), and recall is |truncated ∩ full| / k via an
    equi-join on (qid, id). Each ranking re-derives the narrow sims
    subtree (one corpus re-scan per prefix, no extra shuffle) — the
    deliberate trade against the alternative single-pass plan, whose
    multi-column window would shuffle EVERY corpus row to Q partitions
    and full-sort them (Q = query count, so those partitions are huge
    at scale; WindowGroupLimit cannot push a rank filter through an OR
    of rank columns). Persist the sims projection if scan bandwidth
    beats shuffle capacity on your cluster. Sims rounded to 5 before
    ranking, ties broken by id, so external replays rank identically.

    Returns (prefix_dim, qid, recall) — one row per (dim, query).
    """
    from pyspark.sql import Window

    from ..functions.vector import cosine_similarity

    joined = corpus.select(
        F.col(id_col), F.col(vec_col).alias("_cv")
    ).crossJoin(
        F.broadcast(
            queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
        )
    )
    sims = joined.select(
        query_id,
        id_col,
        F.round(cosine_similarity(F.col("_cv"), F.col("_qv")), 5).alias("s_full"),
        *[
            F.round(
                cosine_similarity(
                    F.slice("_cv", 1, d), F.slice("_qv", 1, d)
                ),
                5,
            ).alias(f"s_{d}")
            for d in prefix_dims
        ],
    )

    def ranked(col: str) -> DataFrame:
        w = Window.partitionBy(query_id).orderBy(F.desc(col), id_col)
        return (
            sims.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= k)
            .select(query_id, id_col)
        )

    full = ranked("s_full")
    out = None
    for d in prefix_dims:
        hits = (
            ranked(f"s_{d}")
            .join(full, [query_id, id_col])
            .groupBy(query_id)
            .agg((F.count("*") / F.lit(float(k))).alias("recall"))
        )
        part = (
            queries.select(query_id)
            .join(hits, query_id, "left")
            .select(
                F.lit(d).alias("prefix_dim"),
                query_id,
                F.coalesce(F.col("recall"), F.lit(0.0)).alias("recall"),
            )
        )
        out = part if out is None else out.unionByName(part)
    return out


def whiten(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    round_stats: int = 6,
    round_out: int = 4,
) -> DataFrame:
    """Per-dimension standardization (mean-center, unit-variance) of an
    embedding column — the preprocessing step before PQ/IVF training or
    cosine retrieval when dimensions have wildly different scales.

    Scale shape: per-dim sums come from ONE hash aggregate producing
    2·dim partial-combinable sums (F.sum over array slots — no explode,
    so no dim-cardinality shuffle with only `dim` reduce groups).
    Exactly dim means + dim stds (a few KB) are collected to the driver
    — the same lineage-truncation move as kmeans_fit — then re-enter
    the plan as broadcast literals; the whitening itself is a narrow
    codegen transform() per row. Stats floor-quantize to
    ``round_stats`` dp from EXACT micro-integer sums (r9 port — the
    previous Python round() of a double sum was both summation-order-
    dependent and half-EVEN, vs the oracle's half-away round(avg));
    degenerate dims (std 0 after quantization) pass through centered
    only. The float() conversions below mirror the oracle's
    CAST(... AS DOUBLE) op order token for token."""
    import math

    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    v = F.col(vec_col)
    grid = 10 ** round_stats

    def _q(i):
        return F.floor(v[i].cast("double") * grid).cast("long")

    sums = emb.agg(
        F.count("*").alias("n"),
        F.array(*[F.sum(_q(i)) for i in range(dim)]).alias("s"),
        F.array(
            *[
                F.sum(_q(i).cast("decimal(38,0)") * _q(i))
                for i in range(dim)
            ]
        ).alias("ss"),
    ).first()
    n = sums["n"]
    g2 = float(grid) * grid
    means = [math.floor(float(s) / n) / grid + 0.0 for s in sums["s"]]
    stds = [
        math.floor(
            math.sqrt(
                max(
                    float(ss) / n / g2 - (float(s) / n / grid) ** 2, 0.0
                )
            )
            * grid
        )
        / grid
        + 0.0
        for s, ss in zip(sums["s"], sums["ss"])
    ]
    mean_lit = F.array(*[F.lit(m) for m in means])
    std_lit = F.array(*[F.lit(s if s > 0 else 1.0) for s in stds])
    # + 0.0 after the round collapses IEEE negative zero so the rounded
    # output is bit-identical across engines (-0.0 vs 0.0 hash apart)
    z = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.round(
            (v[i].cast("double") - F.element_at(mean_lit, i + 1))
            / F.element_at(std_lit, i + 1),
            round_out,
        )
        + F.lit(0.0),
    )
    znorm = F.round(
        F.sqrt(F.aggregate(z, F.lit(0.0), lambda acc, x: acc + x * x)), round_out
    )
    return emb.select(
        F.col(id_col), z.alias("z"), znorm.alias("z_norm")
    )
