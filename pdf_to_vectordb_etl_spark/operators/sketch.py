"""Distributed probabilistic sketches (beyond-reference).

Bloom filter (Bloom 1970) and Count-Min sketch (Cormode & Muthukrishnan
2005) built as plain aggregates over hashed positions — the two
workhorses of large-scale ingest pipelines (membership pre-screens
before expensive dedup joins; frequency estimates without a full
vocabulary shuffle).

Both use the repo's portable 60-bit md5 hash (same construction as
dedup.simhash portable mode: top 15 hex chars of md5, base-16 folded)
so an external engine replays every bit of the sketch — no JVM-only
hash in the signature path.

Scale shape: a sketch IS a partial-combinable aggregate — each
partition ORs its local bitset / sums its local counters, and the merge
is associative. The materialized sketch is constant-size (m_bits/32
longs; depth x width counters), so probing broadcast-joins it against
any stream for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

WORD_BITS = 32  # 32-bit words: exactly representable in DOUBLE, so
# oracle replays and non-JVM consumers reproduce the packing bit-for-bit


def _h60(c: Column) -> Column:
    """Portable 60-bit hash: top 15 hex chars of md5, as a long."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _pos(elem: Column, i: int, modulus: int) -> Column:
    """i-th hash position in [0, modulus): salted portable hash."""
    return _h60(F.concat(F.lit(f"{i}:"), elem)) % modulus


def bloom_build(
    df: DataFrame,
    elem_col: str,
    m_bits: int = 16384,
    k: int = 4,
) -> DataFrame:
    """Build a Bloom bitset over ``elem_col``: k salted positions per
    element, OR-ed into m_bits/32 packed words via one hash agg on
    word index (partial bit_or per partition, associative merge).
    Returns (word_idx, bits) — at most m_bits/32 rows, broadcastable
    anywhere."""
    elem = F.col(elem_col)
    poss = F.array(*[_pos(elem, i, m_bits) for i in range(k)])
    return (
        df.select(F.explode(poss).alias("p"))
        .select(
            (F.col("p") / WORD_BITS).cast("int").alias("word_idx"),
            F.pow(F.lit(2.0), F.col("p") % WORD_BITS).cast("long").alias("m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("m").alias("bits"))
    )


def bloom_screen(
    df: DataFrame,
    bloom: DataFrame,
    elem_col: str,
    m_bits: int = 16384,
    k: int = 4,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """ZERO-SHUFFLE membership column appended to ``df``: one broadcast
    hash join per salted position against the constant-size bitset,
    AND-ed bit tests. Unlike :func:`bloom_probe` (explode to k rows +
    re-aggregate — one shuffle on the id), the screen preserves the
    input's partitioning end-to-end, which is the whole point of a
    pre-screen: the batch scan flows straight into the filter. k stays
    small (4) so this is k broadcast builds of <= m_bits/32 rows.
    No false negatives; ``out_col`` False => definitely absent. A NULL
    element screens as False (a NULL key matches nothing in the
    downstream anti-join either, so miss is the faithful verdict —
    without the coalesce the whole ROW would silently drop through
    both filter branches)."""
    out = df
    hit = None
    for i in range(k):
        p = _pos(F.col(elem_col), i, m_bits)
        out = out.withColumns(
            {
                f"_w{i}": (p / WORD_BITS).cast("int"),
                f"_m{i}": F.pow(F.lit(2.0), p % WORD_BITS).cast("long"),
            }
        )
        b = bloom.select(
            F.col("word_idx").alias(f"_w{i}"), F.col("bits").alias(f"_b{i}")
        )
        out = out.join(F.broadcast(b), f"_w{i}", "left")
        t = (
            F.coalesce(F.col(f"_b{i}"), F.lit(0)).bitwiseAND(F.col(f"_m{i}"))
            != 0
        )
        hit = t if hit is None else hit & t
    drop = [c for i in range(k) for c in (f"_w{i}", f"_m{i}", f"_b{i}")]
    return out.withColumn(
        out_col, F.coalesce(hit, F.lit(False))
    ).drop(*drop)


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    elem_col: str,
    id_col: str,
    m_bits: int = 16384,
    k: int = 4,
) -> DataFrame:
    """Membership probe: an element is a MAYBE only if all k bits are
    set (no false negatives by construction). The probe stream explodes
    to k rows, broadcast-joins the constant-size bitset on word index,
    and re-aggregates with bool_and — one narrow pass over the stream,
    zero shuffles of the sketch. Returns (id, bloom_hit)."""
    elem = F.col(elem_col)
    poss = F.array(*[_pos(elem, i, m_bits) for i in range(k)])
    probes = df.select(F.col(id_col), F.explode(poss).alias("p")).select(
        id_col,
        (F.col("p") / WORD_BITS).cast("int").alias("word_idx"),
        F.pow(F.lit(2.0), F.col("p") % WORD_BITS).cast("long").alias("m"),
    )
    joined = probes.join(F.broadcast(bloom), "word_idx", "left").select(
        id_col,
        (
            F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("m")) != 0
        ).alias("hit"),
    )
    return joined.groupBy(id_col).agg(F.min("hit").alias("bloom_hit"))


def countmin_build(
    df: DataFrame,
    elem_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-Min sketch: depth salted hash rows of ``width`` counters;
    one hash agg on (row, position) — partial counts combine
    associatively. Returns (row, pos, n): at most depth*width rows."""
    elem = F.col(elem_col)
    rows = F.array(
        *[
            F.struct(F.lit(i).alias("row"), _pos(elem, i, width).alias("pos"))
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("e"))
        .select("e.row", "e.pos")
        .groupBy("row", "pos")
        .agg(F.count("*").alias("n"))
    )


def countmin_estimate(
    probes: DataFrame,
    sketch: DataFrame,
    elem_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates: min over the depth counters each
    element hashes to (never underestimates). Sketch is broadcast;
    probe stream explodes to depth rows and re-aggregates. Returns
    (elem, est_n)."""
    elem = F.col(elem_col)
    rows = F.array(
        *[
            F.struct(F.lit(i).alias("row"), _pos(elem, i, width).alias("pos"))
            for i in range(depth)
        ]
    )
    ex = probes.select(elem.alias("elem"), F.explode(rows).alias("e")).select(
        "elem", "e.row", "e.pos"
    )
    return (
        ex.join(F.broadcast(sketch), ["row", "pos"], "left")
        .select("elem", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
        .groupBy("elem")
        .agg(F.min("n").alias("est_n"))
    )


def _hll_parts(elem: Column, m: int = 256) -> tuple[Column, Column]:
    """(bucket, rho) for a portable HyperLogLog (Flajolet et al. 2007):
    bucket = first 2 md5 hex chars (m=256 registers), rho = 1 + number
    of leading zero BITS in the next 48 bits, derived purely from hex-
    string scanning (leading '0' chars ×4 + zeros in the first nonzero
    nibble) — no float log2, so every engine computes the identical
    register file."""
    assert m == 256, "portable layout fixed at 2 hex chars = 256 registers"
    hx = F.md5(elem)
    bucket = F.conv(F.substring(hx, 1, 2), 16, 10).cast("int")
    tail = F.substring(hx, 3, 12)  # 48 bits
    z = F.length(F.regexp_extract(tail, "^0*", 0))
    nib = F.substr(tail, z + 1, F.lit(1))
    nz = (
        F.when(nib == "1", 3)
        .when(nib.isin("2", "3"), 2)
        .when(nib.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(z == 12, F.lit(49)).otherwise(z * 4 + nz + 1)
    return bucket, rho


def hll_estimate(
    df: DataFrame,
    elem_col: str,
    by: str | None = None,
    m: int = 256,
) -> DataFrame:
    """Distinct-count estimate per ``by`` group from a 256-register
    portable HLL. The register file is ONE partial-combinable max-agg
    (each partition maxes its local registers; merge is max — the
    associative sketch property), then a register-count-sized agg
    computes the harmonic-mean estimate with the standard small-range
    (linear-counting) correction. Nothing here exceeds m rows per
    group after the first agg, and the register file itself is the
    mergeable artifact an incremental pipeline persists."""
    regs = hll_registers(df, elem_col, by=by, m=m)
    return hll_estimate_from_registers(regs, by=by, m=m)


def hll_registers(
    df: DataFrame,
    elem_col: str,
    by: str | None = None,
    m: int = 256,
) -> DataFrame:
    """The HLL register file: per (by, bucket) max rho — ONE
    partial-combinable max-agg. This is the mergeable artifact an
    incremental/streaming pipeline maintains (max is associative, so a
    stream's state store or a persisted parquet of registers absorbs
    new data without rescanning old)."""
    bucket, rho = _hll_parts(F.col(elem_col), m)
    keys = ([by] if by else []) + ["bucket"]
    return (
        df.select(*([by] if by else []), bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*keys)
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, by: str | None = None, m: int = 256
) -> DataFrame:
    """Harmonic-mean estimate + linear-counting small-range correction
    over a register file (from hll_registers, a streaming snapshot, or
    a merge of either — the math only sees (bucket, r) rows)."""
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = regs.groupBy(*([by] if by else [])).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("s"),
        F.count("*").alias("np"),
    )
    raw = F.lit(alpha * m * m) / (F.col("s") + (F.lit(m) - F.col("np")))
    v = F.lit(m) - F.col("np")
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    cols = ([F.col(by)] if by else []) + [F.round(est, 4).alias("hll_estimate")]
    return agg.select(*cols)


def hll_sliding_uniques(
    df: DataFrame,
    elem_col: str,
    time_bucket_col: str,
    window_buckets: int = 6,
    m: int = 256,
) -> DataFrame:
    """Distinct elements per SLIDING time window — the query exact
    counting cannot do incrementally (sliding distinct is not
    subtractable) and the one that shows why sketches carry their
    weight: per-bucket register files merge with max, so an N-bucket
    sliding window is a per-(register, bucket) windowed max over the
    register TABLE (m rows per bucket — constant, tiny), never a
    rescan of raw events.

    Returns (time_bucket, hll_estimate) for every OBSERVED bucket,
    estimating uniques over the trailing ``window_buckets`` observed
    buckets (a ROWS frame: gaps in the bucket domain slide over
    present buckets — densify the bucket axis upstream if you need
    strict calendar windows over sparse streams)."""
    from pyspark.sql import Window

    bucket, rho = _hll_parts(F.col(elem_col), m)
    regs = (
        df.select(
            F.col(time_bucket_col).alias("tb"),
            bucket.alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("tb", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    # densify: every (tb, bucket) pair so the sliding max sees gaps as
    # absent registers (tb domain × 256 rows — register-table-sized)
    tbs = regs.select("tb").distinct()
    buckets = regs.select("bucket").distinct()
    dense = (
        tbs.crossJoin(buckets)
        .join(regs, ["tb", "bucket"], "left")
        .select("tb", "bucket", F.coalesce(F.col("r"), F.lit(0)).alias("r"))
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("tb")
        .rowsBetween(-(window_buckets - 1), 0)
    )
    merged = dense.withColumn("rw", F.max("r").over(w)).filter(F.col("rw") > 0)
    return hll_estimate_from_registers(
        merged.select("tb", "bucket", F.col("rw").alias("r")), by="tb", m=m
    ).select(F.col("tb").alias("time_bucket"), "hll_estimate")


# ----------------------------------------------------------------- KMV

#: 12 md5 hex chars = 48 bits: exactly representable in DOUBLE, and the
#: ('0x'||hex)::BIGINT cast replays it in DuckDB without nibble math.
_KMV_HEX = 12
_KMV_SPAN = float(16**_KMV_HEX)


def kmv_u(c: Column) -> Column:
    """Uniform (0,1) tag for a distinct element: first 12 md5 hex chars
    + 0.5, scaled — strictly inside the unit interval (same guard as
    sampling.weighted_sample: u=0 would break the estimator below)."""
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, _KMV_HEX), 16, 10)
    return (h.cast("double") + 0.5) / F.lit(_KMV_SPAN)


def kmv_bottomk(
    df: DataFrame,
    elem_col: str,
    k: int = 256,
    by: str | None = None,
) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002; Beyer
    et al. 2007, public): per group, the ``k`` smallest uniform hash
    tags over DISTINCT elements. Complements the HLL register file
    with two properties HLL lacks: the sketch doubles as a uniform
    sample of the distinct domain (quantiles/joins over it are
    meaningful), and every value in it is exact — so the whole sketch
    is deterministically replayable by an external engine, not just
    the estimate.

    Mergeable: bottom-k of a union == bottom-k of the concatenated
    per-partition bottom-ks (pinned in tests). Plan shape: project to
    the tag, distinct on it (one hash agg — distinct elements whose
    48-bit tags collide collapse, a ≤0.2%-at-1M-distinct negative bias
    the estimator absorbs and the oracle reproduces), then per-group
    rank window (WindowGroupLimit: only k rows leave each partition)
    or, with no grouping, a global TakeOrdered limit — never a
    single-partition window. The sketch is ≤ groups×k rows of one
    double each. Returns (by?, u)."""
    from pyspark.sql import Window

    keys = [by] if by else []
    d = df.select(
        *keys, kmv_u(F.col(elem_col)).alias("u")
    ).distinct()
    if not keys:
        return d.orderBy("u").limit(k)
    w = Window.partitionBy(*keys).orderBy("u")
    return (
        d.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def kmv_estimate(bottomk: DataFrame, k: int, by: str | None = None) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: (k-1)/u_k with u_k
    the k-th smallest tag; a group holding fewer than k tags has been
    seen in full, so its count is exact. One agg over the ≤ groups×k
    sketch rows. Returns (by?, est_distinct)."""
    keys = [by] if by else []
    g = bottomk.groupBy(*keys) if keys else bottomk.groupBy()
    return g.agg(
        F.when(
            F.count("*") < k, F.count("*").cast("double")
        )
        .otherwise((F.lit(float(k - 1))) / F.max("u"))
        .alias("est_distinct")
    )


def hll_set_report(
    df: DataFrame,
    elem_col: str,
    split_col: str,
    a_value: str,
    b_value: str,
    m: int = 256,
) -> DataFrame:
    """Sketch-algebra set report from HLL register files only: |A|,
    |B|, |A∪B| (merge = per-bucket max — the associative property),
    |A∩B| by inclusion-exclusion, and the derived Jaccard.  The two
    register files are one partial-combinable agg each over their
    filtered slices; everything after is ≤ m-row arithmetic.  This is
    the operation that makes persisted per-shard/per-day register
    files composable without ever rescanning rows.

    Returns one row: ``est_a, est_b, est_union, est_intersection,
    jaccard``.
    """
    ra = hll_registers(
        df.filter(F.col(split_col) == a_value), elem_col, m=m
    ).withColumnRenamed("r", "ra")
    rb = hll_registers(
        df.filter(F.col(split_col) == b_value), elem_col, m=m
    ).withColumnRenamed("r", "rb")
    merged = (
        ra.join(rb, "bucket", "full_outer")
        .select(
            "bucket",
            F.greatest(
                F.coalesce("ra", F.lit(0)), F.coalesce("rb", F.lit(0))
            ).alias("r"),
        )
    )
    ea = hll_estimate_from_registers(ra.select("bucket", F.col("ra").alias("r")), m=m) \
        .withColumnRenamed("hll_estimate", "est_a")
    eb = hll_estimate_from_registers(rb.select("bucket", F.col("rb").alias("r")), m=m) \
        .withColumnRenamed("hll_estimate", "est_b")
    eu = hll_estimate_from_registers(merged, m=m).withColumnRenamed(
        "hll_estimate", "est_union"
    )
    inter = F.greatest(
        F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0.0)
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(inter, 4).alias("est_intersection"),
            # est_union = 0 only when both slices were empty → NULL
            F.round(
                inter / F.nullif(F.col("est_union"), F.lit(0.0)), 6
            ).alias("jaccard"),
        )
    )


def kmv_set_report(
    df: DataFrame,
    elem_col: str,
    split_col: str,
    a_value: str,
    b_value: str,
    k: int = 256,
) -> DataFrame:
    """KMV set algebra (Beyer et al. 2007, public): bottom-k sketches
    of A and B; the union sketch is the bottom-k of the concatenated
    tags (mergeability), and the Jaccard estimator is ρ = |{t ∈
    Kmin(A∪B) : t ∈ A and t ∈ B}| / |Kmin(A∪B)| — membership tested
    against the full per-set sketches, exact because Kmin(A∪B) never
    reaches past either set's k-th tag.  Intersection = ρ·|A∪B|.
    All joins are on the tag value (exact doubles from the same md5
    derivation); every table after the first distinct is ≤ k rows.

    Returns one row: ``est_a, est_b, est_union, jaccard,
    est_intersection``.
    """
    def bottom(v):
        return kmv_bottomk(
            df.filter(F.col(split_col) == v), elem_col, k=k
        )

    ka, kb = bottom(a_value), bottom(b_value)
    union_k = (
        ka.unionByName(kb).distinct().orderBy("u").limit(k)
    )
    def est(sk, name):
        return sk.agg(
            F.when(F.count("*") < k, F.count("*").cast("double"))
            .otherwise(F.lit(float(k - 1)) / F.max("u"))
            .alias(name)
        )

    rho_t = (
        union_k.join(ka.select(F.col("u").alias("u")), "u", "left_semi")
        .join(kb.select(F.col("u").alias("u")), "u", "left_semi")
        .agg(F.count("*").alias("_both"))
    )
    denom = union_k.agg(F.count("*").alias("_nu"))
    out = (
        est(ka, "est_a")
        .crossJoin(est(kb, "est_b"))
        .crossJoin(est(union_k, "est_union"))
        .crossJoin(rho_t)
        .crossJoin(denom)
    )
    # empty union sketch (_nu = 0) → NULL, not 0/0
    jac = F.col("_both") / F.nullif(F.col("_nu"), F.lit(0))
    return out.select(
        F.round("est_a", 4).alias("est_a"),
        F.round("est_b", 4).alias("est_b"),
        F.round("est_union", 4).alias("est_union"),
        F.round(jac, 6).alias("jaccard"),
        F.round(jac * F.col("est_union"), 4).alias("est_intersection"),
    )


# --------------------------------------------------------------- DDSketch


def ddsketch_buckets(
    df: DataFrame,
    value_col: str,
    by: str | None = None,
    alpha: float = 0.01,
) -> DataFrame:
    """DDSketch bucket table (Masson, Rim & Lee, VLDB 2019 "DDSketch:
    A Fast and Fully-Mergeable Quantile Sketch with Relative-Error
    Guarantees", public): log-γ buckets with γ = (1+α)/(1−α), index
    ceil(log_γ x) for x > 0, a dedicated zero bucket (idx 0, holds
    |x| < γ⁻¹⁵⁰ too — the standard min-indexable cutoff), and a
    mirrored negative store (negative idx).

    The sketch IS the (bucket, count) table — counts are associative
    sums, so per-shard sketches, a streaming aggregate, or any union
    of partials folds into the identical table (the HLL/CMS register
    contract). Bucket-table size is log_γ(max/min) rows — a few
    hundred for any float range at α = 1% — REGARDLESS of corpus
    size; that bound is what makes the quantile finale's cumulative
    window safe.

    Returns (by?, idx, cnt)."""
    g = (1.0 + alpha) / (1.0 - alpha)
    lg = F.log(F.lit(g))
    v = F.col(value_col)
    # min-indexable magnitude: γ^-150 (~at α=1%: 5e-2... exact cutoff
    # only matters for denormal-ish values; everything below folds
    # into the zero bucket, as the paper's collapsing variant does)
    tiny = float(g) ** -150
    idx = (
        F.when(v > tiny, F.ceil(F.log(v) / lg))
        .when(v < -tiny, -F.ceil(F.log(-v) / lg))
        .otherwise(F.lit(0))
    ).cast("long")
    keys = ([by] if by else []) + ["idx"]
    return (
        df.filter(v.isNotNull())
        .select(*([by] if by else []), idx.alias("idx"))
        .groupBy(*keys)
        .agg(F.count("*").alias("cnt"))
    )


def ddsketch_quantiles(
    buckets: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    by: str | None = None,
    alpha: float = 0.01,
) -> DataFrame:
    """Quantile finale over a DDSketch bucket table: walk buckets in
    index order accumulating counts; the q-quantile estimate for the
    first bucket whose cumulative count reaches ceil(q·(n−1))+1 is the
    bucket midpoint 2γ^idx/(γ+1) (sign-mirrored for the negative
    store, 0 for the zero bucket) — guaranteed within relative error α
    of the true quantile for positive data.

    The cumulative window runs over the BOUNDED bucket table (log-γ
    range rows — see ddsketch_buckets), per group when ``by`` is set.
    The group total comes from a full-frame window over the same
    bounded table rather than a groupBy + self-join (a streaming
    memory-sink snapshot trips Spark's self-join attribute
    resolution, and the join bought nothing). Estimates are
    floor-quantized to the 1e-6 grid (both engines compute pow from
    the same integer idx, then the same floor) so the report replays
    bit-identically.

    Returns (by?, q, est, n)."""
    from pyspark.sql import Window

    g = (1.0 + alpha) / (1.0 - alpha)
    part = [by] if by else []
    w = Window.partitionBy(*part).orderBy("idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy(*part).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = buckets.withColumn("_cum", F.sum("cnt").over(w)).withColumn(
        "_n", F.sum("cnt").over(w_all)
    )
    qdf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    # rank of the q-quantile under the paper's convention
    need = F.ceil(F.col("q") * (F.col("_n") - 1)) + 1
    est = (
        F.when(F.col("idx") > 0, F.pow(F.lit(g), F.col("idx")) * 2.0 / (g + 1.0))
        .when(F.col("idx") < 0, -F.pow(F.lit(g), -F.col("idx")) * 2.0 / (g + 1.0))
        .otherwise(F.lit(0.0))
    )
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .filter(F.col("_cum") >= need)
        .groupBy(*part, "q")
        .agg(
            F.min_by(F.floor(est * 1e6) / 1e6, F.col("idx")).alias("est"),
            F.max("_n").alias("n"),
        )
    )
    return hit.orderBy(*part, "q")


def misra_gries_partition_summaries(
    df: DataFrame,
    item_col: str,
    n_counters: int = 64,
) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries (Misra-Gries 1982;
    merge rule per Agarwal et al. 2012 'Mergeable Summaries', public):
    bounded ``n_counters`` dict per partition, batches folded in
    vectorized via value_counts + the subtract-(c+1)-th-largest merge.
    Returns (item, cnt_lb) rows — cnt_lb is the MG lower bound; the
    summary guarantees every item with partition frequency >
    n_p/(n_counters+1) is present. Items hash-cast to string."""
    import pandas as pd

    c = int(n_counters)
    if c < 1:
        raise ValueError("n_counters must be >= 1")

    src = df.select(F.col(item_col).cast("string").alias("item"))

    def part(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            vc = pdf["item"].dropna().value_counts()
            for v, n in vc.items():
                counters[v] = counters.get(v, 0) + int(n)
            if len(counters) > c:
                # subtract the (c+1)-th largest count from everything,
                # drop <= 0 — the mergeable-summaries MG merge
                cut = sorted(counters.values(), reverse=True)[c]
                counters = {
                    k: v - cut for k, v in counters.items() if v - cut > 0
                }
        if counters:
            yield pd.DataFrame(
                {
                    "item": list(counters.keys()),
                    "cnt_lb": list(counters.values()),
                }
            )

    return src.mapInPandas(part, "item string, cnt_lb long")


def heavy_hitters_exact(
    df: DataFrame,
    item_col: str,
    k: int = 20,
    n_counters: int | None = None,
) -> DataFrame:
    """Exact phi-heavy hitters (count > n/k) via a two-phase plan whose
    OUTPUT is independent of partitioning: (1) per-partition
    Misra-Gries screen with c >= k counters — by pigeonhole any item
    with global count > n/k exceeds n_p/k > n_p/(c+1) in at least one
    partition, so the union of partition summaries is a guaranteed
    candidate SUPERSET; (2) exact recount of the candidates only
    (broadcast semi-join — the full corpus never shuffles by item) and
    the exact integer threshold count * k > n. The CMS variant
    (countmin_estimate) trades this for fixed memory at any k; MG is
    the deterministic-bound alternative.

    Returns (item, cnt, share_q6), share on the exact micro grid."""
    c = int(n_counters) if n_counters is not None else max(2 * k, 8)
    if c < k:
        raise ValueError(
            f"n_counters={c} < k={k} breaks the no-false-negative "
            "pigeonhole guarantee"
        )
    src = df.select(F.col(item_col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    candidates = (
        misra_gries_partition_summaries(src, "item", c)
        .select("item")
        .distinct()
    )
    counted = (
        src.join(F.broadcast(candidates), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    tot = src.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        counted.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * k > F.col("n"))
        .selectExpr(
            "item",
            "cnt",
            "((CAST(cnt AS DECIMAL(38,0)) * 1000000) div n) / 1e6"
            " AS share_q6",
        )
    )
