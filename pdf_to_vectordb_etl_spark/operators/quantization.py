"""Product quantization (PQ) for embedding columns (beyond-reference).

At 100 TB an fp32 embedding column dominates storage and shuffle; PQ
(Jégou et al., 2011 — public algorithm) stores each vector as m small
codes: split the dimension into m subspaces, k-means each subspace
independently, and keep only each subvector's nearest-centroid code.
dim=64 float32 (256 B) at m=4, k=16 becomes 4 codes (4 B at k<=256) —
a 64x compression with bounded reconstruction error.

Everything reuses the clustering module's DataFrame-native Lloyd
machinery, so training is m independent linear passes (m is a small
constant — the driver loop is over SUBSPACES, never rows), encoding is
one union + one groupBy, and the whole path inherits k-means'
determinism contract (md5 init, 6 dp rounding) — an external SQL
oracle replays training, encoding, and reconstruction error exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .clustering import kmeans_assign, kmeans_fit


def _subspace(df: DataFrame, j: int, sub_dim: int, vec_col: str, id_col: str) -> DataFrame:
    # F.slice is 1-based; subspace j covers [j*sub_dim+1, (j+1)*sub_dim]
    return df.select(
        F.col(id_col),
        F.slice(F.col(vec_col), j * sub_dim + 1, sub_dim).alias(vec_col),
    )


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    n_iters: int = 1,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "cosine",
) -> DataFrame:
    """Codebooks: (subspace, cluster_id, centroid, n_members) — an
    independent k-means per subspace. m linear passes; nothing
    quadratic; the returned table is m*k rows (kilobytes)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_dim = dim // m
    books = []
    for j in range(m):
        cb = kmeans_fit(
            _subspace(df, j, sub_dim, vec_col, id_col),
            k=k, n_iters=n_iters, vec_col=vec_col, id_col=id_col,
            metric=metric,
        )
        books.append(cb.select(F.lit(j).alias("subspace"), "cluster_id",
                               "centroid", "n_members"))
    out = books[0]
    for b in books[1:]:
        out = out.unionByName(b)
    return out


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "cosine",
) -> DataFrame:
    """(id, codes) — codes[j] = nearest centroid of subspace j. Per
    subspace one broadcast-argmax assign; the m small (id, code) frames
    union and fold to an array with ONE groupBy."""
    meta = codebooks.groupBy("subspace").count().collect()
    m = len(meta)
    sub_dim_row = codebooks.select(F.size("centroid")).first()
    sub_dim = sub_dim_row[0]
    parts = []
    for j in range(m):
        cb = codebooks.filter(F.col("subspace") == j).select("cluster_id", "centroid")
        assigned = kmeans_assign(
            _subspace(df, j, sub_dim, vec_col, id_col), cb, vec_col, id_col,
            metric,
        )
        parts.append(assigned.select(id_col, F.lit(j).alias("subspace"),
                                     F.col("cluster_id").alias("code")))
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    return allc.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "code"))),
            lambda s: s["code"],
        ).alias("codes")
    )


def pq_reconstruction_report(
    df: DataFrame,
    codebooks: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-subspace quality report: codes actually used and mean squared
    L2 reconstruction error of the quantized subvectors — the metric
    that decides whether (m, k) is adequate before committing a corpus
    rewrite. One assign + one join + one aggregate per subspace."""
    sub_dim = codebooks.select(F.size("centroid")).first()[0]
    m = codebooks.agg(F.countDistinct("subspace")).first()[0]
    reports = []
    for j in range(m):
        cb = codebooks.filter(F.col("subspace") == j).select("cluster_id", "centroid")
        sub = _subspace(df, j, sub_dim, vec_col, id_col)
        assigned = kmeans_assign(sub, cb, vec_col, id_col)
        joined = assigned.join(F.broadcast(cb), "cluster_id")
        # exact pico-int squared error (r9 port): each per-dim term is
        # floor-quantized at 1e-12 BEFORE summing, so the per-row error
        # and its corpus mean are exact integer arithmetic — immune to
        # both fold-vs-hash-agg dim ordering and row summation order
        # (round(avg(double)) was order-dependent across engines)
        sqerr_micro = F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"), F.col("centroid"),
                lambda a, b: F.floor((a - b) * (a - b) * 1e12),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        reports.append(
            joined.select(F.lit(j).alias("subspace"),
                          F.col("cluster_id"), sqerr_micro.alias("_e"))
            .groupBy("subspace")
            .agg(
                F.countDistinct("cluster_id").alias("n_codes_used"),
                (
                    F.floor(
                        F.sum(F.col("_e").cast("decimal(38,0)"))
                        .cast("double")
                        / (F.count(F.lit(1)).cast("double") * 1e8)
                    )
                    / 1e4
                    + 0.0
                ).alias("avg_sq_err"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def pq_topk(
    codes_df: DataFrame,
    codebooks: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate cosine top-k by ASYMMETRIC DISTANCE COMPUTATION over
    PQ codes — search never touches a full vector.

    The query is sliced per subspace and dotted against every centroid
    ONCE: an (m x k)-row lookup table (kilobytes, broadcast). Each
    corpus row then explodes its m codes, joins the table, and one
    aggregation sums dot products and centroid norms:

        cos(q, x) ~ sum_j <q_j, c_{j,code_j}>
                    / (||q|| * sqrt(sum_j ||c_{j,code_j}||^2))

    Per corpus row the work is m table lookups — independent of dim —
    so a 100 TB scan ranks at code width, not vector width.

    Exactness (r9 — the sf0.1 sweep rolled a round-4 half-up boundary
    on an ADC score): the lookup table's dot products and centroid
    norms are EXACT integer sums over micro-quantized operands —
    centroid components are already on the 1e-6 lattice
    (_centroid_means), so floor(c·1e6 + 0.5) recovers their grid
    integers exactly, and the query micro-quantizes once. Per-row
    accumulation is integer, the final cosine is one mirrored
    double expression over exact ints (bit-identical in any engine),
    and the output floor-quantizes at 6 dp with an id tiebreak; exact
    re-ranking of the shortlist against full vectors is one extra join
    when recall demands it.
    """
    import math

    sub_dim = codebooks.select(F.size("centroid")).first()[0]
    qm = [int(math.floor(float(x) * 1e6)) for x in query]
    qn2 = sum(q * q for q in qm)  # exact python int
    qlit = F.lit(qm)
    ki = F.transform(
        "centroid", lambda c: F.floor(c * 1e6 + F.lit(0.5)).cast("long")
    )
    table = codebooks.select(
        "subspace",
        F.col("cluster_id").alias("code"),
        F.aggregate(
            F.zip_with(
                ki,
                F.slice(qlit, F.col("subspace") * sub_dim + 1, sub_dim),
                lambda c, q: c * q,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dot"),
        F.aggregate(
            F.transform(ki, lambda c: c * c),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n2"),
    )
    ex = codes_df.select(id_col, F.posexplode("codes").alias("subspace", "code"))
    scored = (
        ex.join(F.broadcast(table), ["subspace", "code"])
        .groupBy(id_col)
        .agg(F.sum("dot").alias("_num"), F.sum("n2").alias("_n2"))
        .select(
            id_col,
            # a zero query vector scores the cosine sentinel -1.0,
            # matching ivfpq_topk and functions.vector.cosine_similarity;
            # the 1e-12 floor keeps an all-zero codebook from dividing
            # by zero (same floor in the DuckDB twin)
            F.when(F.lit(qn2 == 0), F.lit(-1.0))
            .otherwise(
                F.floor(
                    F.col("_num").cast("double")
                    / (
                        F.sqrt(
                            F.greatest(
                                F.col("_n2").cast("double"), F.lit(1e-12)
                            )
                        )
                        * F.sqrt(F.lit(float(qn2)))
                    )
                    * 1e6
                )
                / 1e6
                + 0.0
            )
            .alias("adc_sim"),
        )
    )
    return scored.orderBy(F.desc("adc_sim"), F.col(id_col)).limit(k)


def ivfpq_build(
    df: DataFrame,
    n_lists: int = 16,
    m: int = 4,
    k: int = 16,
    n_iters: int = 1,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Build the IVF-PQ index (the FAISS production shape, public
    algorithm): a coarse quantizer routes each vector to its nearest
    list; PQ codes the RESIDUAL (vector - list centroid), which is far
    smaller in norm than the vector, so the same code budget buys much
    lower quantization error.

    Returns ``(centroids, codebooks, coded)`` where ``coded`` carries
    (id, list_id, codes) — at 100 TB that's the ONLY per-vector state
    (one int + m codes), written bucketed by list_id so probes prune
    files. Build cost: one coarse assign + m Lloyd passes on residuals.
    """
    from .topk import ivf_centroids, ivf_assign

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    src = df.select(F.col(id_col), F.col(vec_col))
    cents = ivf_centroids(src, n_lists, vec_col, id_col)
    assigned = ivf_assign(src, cents, 1, vec_col)
    resid = assigned.join(F.broadcast(cents), "list_id").select(
        id_col,
        "list_id",
        F.zip_with(
            F.col(vec_col).cast("array<double>"), F.col("centroid"),
            lambda a, b: a - b,
        ).alias("residual"),
    )
    books = pq_train(resid, m=m, k=k, n_iters=n_iters, dim=dim,
                     vec_col="residual", id_col=id_col, metric="l2")
    codes = pq_encode(resid, books, vec_col="residual", id_col=id_col,
                      metric="l2")
    coded = codes.join(resid.select(id_col, "list_id"), id_col)
    return cents, books, coded


def ivfpq_topk(
    centroids: DataFrame,
    codebooks: DataFrame,
    coded: DataFrame,
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate COSINE top-k over the IVF-PQ index.

    Reconstruction is implicit: for x ~ c_list + r̂,
      <q, x>   = <q, c_l> + sum_j <q_j, cb_j[code_j]>
      ||x||^2  = ||c_l||^2 + 2 sum_j <c_l[j], cb_j[code_j]>
                 + sum_j ||cb_j[code_j]||^2
    so both numerator and norm come from ONE broadcast lookup table
    keyed (list_id, subspace, code) — n_lists*m*k rows, kilobytes —
    plus a per-list constant. Only the ``n_probe`` nearest lists are
    scanned (partition pruning on list_id at scale); per-row cost is m
    lookups regardless of dim. Shortlist semantics: exact re-rank of
    the k rows against full vectors is one join away.
    """
    from .topk import cosine_similarity

    qlit = F.lit([float(x) for x in query])
    # 1e-12 floor: a zero query vector scores 0 everywhere instead
    # of dividing by zero (same floor in the DuckDB twin)
    qnorm = max(sum(float(x) * float(x) for x in query) ** 0.5, 1e-12)
    sub_dim = codebooks.select(F.size("centroid")).first()[0]

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x)

    cents = centroids.withColumn(
        "_qdotc", dot(F.col("centroid"), qlit)
    ).withColumn("_cl2", dot(F.col("centroid"), F.col("centroid")))
    lists = (
        cents.withColumn("_sim", F.round(cosine_similarity(F.col("centroid"), qlit), 6))
        .orderBy(F.desc("_sim"), F.col("list_id"))
        .limit(n_probe)
    )
    # one combined lookup table over the probed lists' centroid slices
    csub = F.slice(F.col("centroid"), F.col("subspace") * sub_dim + 1, sub_dim)
    qsub = F.slice(qlit, F.col("subspace") * sub_dim + 1, sub_dim)
    table = (
        lists.select("list_id", "_qdotc", "_cl2", "centroid")
        .crossJoin(
            codebooks.select(
                "subspace", F.col("cluster_id").alias("code"),
                F.col("centroid").alias("_cb"),
            )
        )
        .select(
            "list_id", "subspace", "code", "_qdotc", "_cl2",
            dot(F.col("_cb"), qsub).alias("_qdot"),
            dot(csub.cast("array<double>"), F.col("_cb")).alias("_cdot"),
            dot(F.col("_cb"), F.col("_cb")).alias("_n2"),
        )
    )
    ex = coded.select(id_col, "list_id", F.posexplode("codes").alias("subspace", "code"))
    scored = (
        ex.join(F.broadcast(table), ["list_id", "subspace", "code"])
        .groupBy(id_col)
        .agg(
            (F.first("_qdotc") + F.sum("_qdot")).alias("_num"),
            (F.first("_cl2") + 2 * F.sum("_cdot") + F.sum("_n2")).alias("_xn2"),
        )
        .select(
            id_col,
            # a zero query vector scores the cosine sentinel -1.0 for
            # every candidate (DuckDB's list_cosine_similarity
            # convention, matching functions.vector.cosine_similarity)
            F.round(
                F.when(F.lit(qnorm <= 1e-12), F.lit(-1.0)).otherwise(
                    F.col("_num")
                    / (
                        F.sqrt(F.greatest(F.col("_xn2"), F.lit(1e-12)))
                        * F.lit(qnorm)
                    )
                ),
                6,
            ).alias("approx_cos"),
        )
    )
    return scored.orderBy(F.desc("approx_cos"), F.col(id_col)).limit(k)


def int8_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: each vector is
    scaled by 127/max(|x|) and rounded — the standard 4x storage cut
    for embedding columns (fp32 -> int8) that keeps cosine rankings
    nearly intact because the per-vector scale cancels in the
    numerator/norm ratio.

    Narrow, shuffle-free, pure codegen: one pass computes the scale
    (array_max of |x|), one ``transform`` emits the codes. Returns
    (id, scale, codes, max_abs_err) — the error column makes the
    quality check free at write time instead of a second scan.
    """
    v = F.col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # degenerate all-zero vector: scale 0 codes 0, error 0
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(0.0))
    codes = F.transform(
        v,
        lambda x: F.when(
            F.col("_scale") > 0, F.round(x / F.col("_scale"), 0).cast("int")
        ).otherwise(F.lit(0)),
    )
    err = F.round(
        F.array_max(
            F.zip_with(
                v,
                F.col("codes"),
                lambda x, c: F.abs(x - c.cast("double") * F.col("_scale")),
            )
        ),
        6,
    )
    return (
        df.select(F.col(id_col), v.alias(vec_col))
        .withColumn("_scale", scale)
        .withColumn("codes", codes)
        .withColumn("max_abs_err", err)
        .select(
            id_col,
            F.round("_scale", 9).alias("scale"),
            "codes",
            "max_abs_err",
        )
    )


def sq8_recall_report(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Serving-quality report for int8 scalar-quantized storage (the
    FAISS SQ8 deployment question): recall@k of nearest-neighbor
    search over RECONSTRUCTED int8 vectors vs exact search over the
    raw vectors, plus the mean per-vector max reconstruction error —
    the two numbers that decide whether the 4x storage cut ships.

    Exact end to end: probes and raw corpus micro-quantize once
    (bit-identical floor), int8 reconstruction c·scale is an identical
    double both engines (scale is the 9-dp-rounded artifact of
    :func:`int8_quantize`) and floors onto the SAME micro lattice, so
    every distance is exact integer squared L2, rankings tie-break on
    id, and recall is one exact integer division. One broadcastable
    probe panel; the corpus scans twice (the checkpointed int8 encode +
    the exact-score pass — the reconstruction is consumed by both the
    SQ scoring and the error aggregate, so it localCheckpoints per the
    consumed-twice convention) with no shuffle beyond two per-probe
    top-k windows.

    Returns one row: (n_queries, recall_at_{k}_q6, mean_abs_err_q6).
    """
    from pyspark.sql import Window

    from .topk import _sq_l2_micro
    from .valuation import _quantize_micro

    pv = probes.select(
        F.col(id_col).alias("qid"), _quantize_micro(vec_col).alias("pq")
    )
    sq = int8_quantize(corpus, vec_col, id_col)
    recon = sq.select(
        F.col(id_col).alias("cid"),
        F.transform(
            "codes",
            lambda c: F.floor(
                c.cast("double") * F.col("scale") * F.lit(1000000.0)
            ).cast("long"),
        ).alias("rm"),
        F.floor(F.col("max_abs_err") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("_errq"),
    ).localCheckpoint(eager=True)
    exact = corpus.select(
        F.col(id_col).alias("cid"), _quantize_micro(vec_col).alias("xm")
    )
    w = Window.partitionBy("qid").orderBy("dist", "cid")

    def _top(scored):
        return (
            scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .select("qid", "cid")
        )

    # probe panel broadcasts; the corpus never shuffles for scoring
    top_sq = _top(
        recon.select("cid", "rm").crossJoin(F.broadcast(pv)).select(
            "qid", "cid", _sq_l2_micro("pq", "rm").alias("dist")
        )
    )
    top_ex = _top(
        exact.crossJoin(F.broadcast(pv)).select(
            "qid", "cid", _sq_l2_micro("pq", "xm").alias("dist")
        )
    )
    hits = top_sq.join(top_ex, ["qid", "cid"]).groupBy("qid").agg(
        F.count("*").alias("_hit")
    )
    per_q = pv.select("qid").join(hits, "qid", "left").select(
        F.coalesce("_hit", F.lit(0)).alias("_hit")
    )
    errs = recon.agg(
        F.sum("_errq").alias("_se"), F.count(F.lit(1)).alias("_ne")
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        (
            F.floor(
                F.sum("_hit").cast("double")
                * 1e6
                / (F.count(F.lit(1)).cast("double") * float(k))
            )
            / 1e6
            + 0.0
        ).alias(f"recall_at_{k}_q6"),
    ).crossJoin(
        errs.select(
            (
                F.floor(F.col("_se").cast("double") / F.col("_ne"))
                / 1e6
                + 0.0
            ).alias("mean_abs_err_q6")
        )
    )


BITS_PER_WORD = 32


def binarize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """1-bit sign quantization: each dimension collapses to its sign
    bit, packed little-endian into 32-bit words stored as longs — a
    32x storage cut (fp32 -> 1 bit) under which Hamming distance
    approximates angular distance (Charikar 2002 random-hyperplane
    sketch with the identity hyperplanes; the coordinate basis is the
    right choice when inputs are already mean-centered per dim).

    32 bits per word (not 64) keeps every word exactly representable in
    a DOUBLE and far from BIGINT sign trouble, so external oracles and
    non-JVM consumers reproduce the packing bit-for-bit. Narrow,
    shuffle-free, pure codegen — no explode: the per-row cost is
    dim/32 aggregate steps over a sequence literal.

    Returns (id, sig) with sig array<long> of ceil(dim/32) words.
    """
    v = F.col(vec_col).cast("array<double>")
    n_words = F.ceil(F.size(v) / F.lit(BITS_PER_WORD)).cast("int")
    word = lambda w: F.aggregate(  # noqa: E731
        F.sequence(F.lit(0), F.lit(BITS_PER_WORD - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.when(
            (w * BITS_PER_WORD + j + 1 <= F.size(v))
            & (
                F.element_at(v, (w * BITS_PER_WORD + j + 1).cast("int"))
                > 0
            ),
            F.pow(F.lit(2.0), j).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    sig = F.transform(F.sequence(F.lit(0), n_words - 1), word)
    return df.select(F.col(id_col), sig.alias("sig"))


def hamming_distance(a, b):
    """Total differing bits between two packed signatures
    (array<long>, equal length): sum of bit_count(xor) per word.
    Pure codegen; cost = word count."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, c: acc + c,
    )


def binary_topk_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id: str = "qid",
) -> DataFrame:
    """Two-stage ANN over sign bits: Hamming shortlist on the packed
    1-bit signatures (cheap: dim/32 xor+popcount words per pair), then
    exact-cosine rerank of the shortlist only.

    Both stages are per-query windows with a rank filter, so they
    compile to WindowGroupLimit — only ``shortlist`` rows per query
    leave a partition after stage 1, only ``k`` after stage 2. The
    query side is broadcast; the corpus is never shuffled. At 100 TB
    the signature column is the only thing the first stage reads
    (1/32nd of the vector bytes).

    Returns (qid, id, hamming, cosine rounded 4, rank).
    """
    from pyspark.sql import Window

    from ..functions.vector import cosine_similarity

    cb = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv")).join(
        binarize_embeddings(corpus, vec_col, id_col), id_col
    )
    qb = queries.select(
        F.col(query_id), F.col(vec_col).alias("_qv")
    ).join(
        binarize_embeddings(queries, vec_col, query_id).select(
            F.col(query_id), F.col("sig").alias("qsig")
        ),
        query_id,
    )
    joined = cb.crossJoin(F.broadcast(qb)).select(
        query_id,
        id_col,
        "_cv",
        "_qv",
        hamming_distance(F.col("sig"), F.col("qsig")).alias("hamming"),
    )
    w1 = Window.partitionBy(query_id).orderBy("hamming", id_col)
    short = joined.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= shortlist
    )
    scored = short.select(
        query_id,
        id_col,
        "hamming",
        F.round(cosine_similarity(F.col("_cv"), F.col("_qv")), 4).alias("cosine"),
    )
    w2 = Window.partitionBy(query_id).orderBy(F.desc("cosine"), id_col)
    return scored.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= k
    )
