"""Deterministic sampling / dataset splitting for training-data curation.

Beyond-reference capability: a 100 TB corpus pipeline needs
reproducible held-out splits and down-samples — the same row must land
in the same split on every run, on every executor, after retries, and
when the corpus is re-partitioned. Spark's ``df.sample`` is seeded per
partition, so it changes with partitioning; these operators instead
bucket each row by a cryptographic hash of its id, which is stable
under any physical layout and portable across engines (md5 hex is
identical in Spark and DuckDB, so splits computed here are verifiable
and re-derivable downstream).

All operators are narrow (no shuffle): a scan + projection/filter that
keeps codegen and pushes the split decision next to the read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 4 hex chars = 65536 buckets: split boundaries resolve to ~0.0015%.
_HEX_DIGITS = 4
_BUCKETS = 16**_HEX_DIGITS


def hash_bucket_hex(key: Column | str, digits: int = _HEX_DIGITS) -> Column:
    """Uniform hex bucket label for a row key: the first ``digits`` hex
    chars of md5(key as string). Lexicographic order on the label is
    numeric order on the bucket, so range predicates define splits."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(c.cast("string")), 1, digits)


def _threshold(cum: float) -> str:
    """Hex string t such that ``bucket < t`` keeps ~cum of rows.

    'g' sorts after every hex digit, so a rate >= 1.0 keeps ALL rows
    (a capped 'ffff' would silently drop the bucket == 'ffff' sliver).
    """
    n = int(round(cum * _BUCKETS))
    if n >= _BUCKETS:
        return "g"
    return format(max(n, 0), f"0{_HEX_DIGITS}x")


def deterministic_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id"
) -> DataFrame:
    """Keep a stable ~``fraction`` of rows, chosen by id hash — the
    same ids survive regardless of partitioning, ordering, or cluster
    size (unlike ``df.sample``)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction == 1.0:
        return df
    return df.filter(hash_bucket_hex(id_col) < F.lit(_threshold(fraction)))


def split_column(id_col: Column | str, weights: dict[str, float]) -> Column:
    """Split-label column: assigns each row to one named split with
    probability proportional to its weight, by id-hash range."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bucket = hash_bucket_hex(id_col)
    cum = 0.0
    expr = None
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = bucket < F.lit(_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def deterministic_split(
    df: DataFrame, weights: dict[str, float], id_col: str = "doc_id"
) -> DataFrame:
    """Add a ``split`` column ("train"/"val"/... per ``weights``).

    One pass, no shuffle; filtering a split afterwards is a pushable
    predicate, so each split's reader scans once and prunes early.
    """
    return df.withColumn("split", split_column(id_col, weights))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    strata_col: str = "source",
) -> DataFrame:
    """Per-stratum deterministic down-sampling — the corpus-mixing
    primitive: re-weight sources of a training mix ("keep 50% of web,
    10% of forums, all of books") in one narrow pass.

    Same id-hash mechanism as :func:`deterministic_sample`, so strata
    rates compose with global samples and stay stable under layout
    changes; a stratum missing from ``rates`` gets ``default_rate``.
    The rate lookup is a literal map expression — no join, no shuffle,
    nothing leaves the scan stage.
    """
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {v}")
    pairs = []
    for k, v in rates.items():
        pairs += [F.lit(k), F.lit(_threshold(v))]
    mapping = F.create_map(*pairs) if pairs else F.create_map()
    thr = F.coalesce(
        mapping[F.col(strata_col)], F.lit(_threshold(default_rate))
    )
    return df.filter(hash_bucket_hex(id_col) < thr)


def grouped_split(
    df: DataFrame, weights: dict[str, float], group_col: str = "source"
) -> DataFrame:
    """Leakage-aware split: assign whole GROUPS (domain / source /
    author), not rows, to splits.

    Row-hash splits leak: near-duplicate or correlated documents from
    one site end up on both sides of train/test and inflate held-out
    scores. Hashing the group key instead guarantees a group never
    straddles splits — the standard decontamination-adjacent guard for
    web corpora (pair with dedup.contamination_check for benchmark
    overlap). Same md5-bucket mechanism as :func:`deterministic_split`:
    narrow, layout-invariant, re-derivable in SQL downstream."""
    return df.withColumn("split", split_column(F.col(group_col), weights))


def weighted_sample(
    df: DataFrame, weight: Column, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic PER-ROW weighted keep: row survives iff its md5
    bucket falls below its own weight (a keep-probability in [0, 1]).

    The curation use: weight = quality score, so high-quality documents
    survive at higher rates than boilerplate WITHOUT a hard cutoff —
    the soft alternative to quality_quantile_filter. Same md5 basis as
    every sampler here: layout-invariant, retry-stable, re-derivable in
    SQL. Narrow (no shuffle); weights outside [0, 1] clamp.
    """
    w = F.least(F.lit(1.0), F.greatest(F.lit(0.0), weight))
    # bucket/65536 in [0,1): keep iff below the row's own rate
    frac = (
        F.conv(hash_bucket_hex(id_col), 16, 10).cast("double") / F.lit(float(_BUCKETS))
    )
    return df.filter(frac < w)


def weighted_sample_without_replacement(
    df: DataFrame,
    k: int,
    weight: Column,
    by: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential keys
    (Efraimidis & Spirakis 2006, public): each row draws the key
    u^(1/w) with u uniform from the row's md5 bucket; the top-k keys
    per group are a correct weighted sample — one pass, no rejection
    loop, deterministic (same md5 basis as every sampler here) and
    distributed (per-group rank window / TakeOrdered, never a
    sequential draw).

    u maps from the 4-hex-digit bucket to (0, 1) as (bucket+0.5)/65536
    — strictly inside the unit interval: u=0 would make the key 0 for
    every weight, and u=1 would make it 1.0 for EVERY weight (a
    zero-weight row in the top hash bucket would then outrank all
    heavy rows — the 0xffff pathology). Weights clamp below at a tiny
    epsilon so zero-weight rows sort last instead of dividing by
    zero. The key is rounded to 12 dp (both engines compute the same
    pow/ln inputs; rounding absorbs libm ulp differences) with the id
    as the tiebreak."""
    from pyspark.sql import Window

    u = (F.conv(hash_bucket_hex(id_col), 16, 10).cast("double") + 0.5) / F.lit(
        float(_BUCKETS)
    )
    w_ = F.greatest(weight.cast("double"), F.lit(1e-12))
    key = F.round(F.pow(u, F.lit(1.0) / w_), 12)
    if by is None:
        ranked = df.withColumn("_key", key).orderBy(
            F.desc("_key"), F.col(id_col)
        ).limit(k)
        return ranked.drop("_key")
    win = Window.partitionBy(by).orderBy(F.desc(key), F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def rendezvous_shard(
    key: Column | str, n_shards: int, salt: str = ""
) -> Column:
    """Rendezvous (highest-random-weight) shard assignment (Thaler &
    Ravishankar 1998, public): shard(key) = argmax over s in
    [0, n_shards) of md5(key ‖ '#' ‖ s ‖ salt). The property mod-N
    sharding lacks: growing N→N+1 moves only ~1/(N+1) of keys (each
    key moves iff the NEW shard's weight is its maximum), so shard
    counts can be re-tuned on a live 100 TB corpus without a full
    reshuffle — only the stolen keys migrate.

    Same md5 determinism contract as every sampler here:
    layout-invariant, retry-stable, byte-identical in DuckDB
    (arg_max over the same concat). Narrow — a per-row expression,
    no shuffle; per-row cost is O(n_shards) hashes, so this shape is
    for shard counts in the hundreds. For thousands of shards use
    HRW over ~64 virtual nodes per shard or jump-consistent hashing
    and keep the same argmax contract.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    c = F.col(key) if isinstance(key, str) else key
    pairs = F.array(
        *[
            F.struct(
                F.md5(
                    F.concat_ws("#", c.cast("string"), F.lit(str(s) + salt))
                ).alias("w"),
                F.lit(s).alias("s"),
            )
            for s in range(n_shards)
        ]
    )
    return F.array_max(pairs)["s"]
