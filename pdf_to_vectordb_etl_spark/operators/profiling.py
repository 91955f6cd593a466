"""Single-pass column profiling for data-quality triage.

Beyond-reference capability: before curating a 100 TB corpus you
profile it — null rates, cardinalities, value ranges per column. One
wide aggregate computes every statistic in a single scan (4 aggregates
per column, all partial-aggregated map-side), then a ``stack`` unpivots
to long form. No per-column jobs, no driver loops — profiling a
500-column table is still exactly one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Long-form profile ``(column, n_nulls, n_distinct, min_v, max_v)``.

    min/max are computed in the column's native type (true numeric
    ordering) and cast to string only for the uniform output schema.
    ``n_distinct`` is exact; swap in ``approx_count_distinct`` for
    sketch-sized state at extreme cardinalities.
    """
    cols = cols or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "as (column, n_nulls, n_distinct, min_v, max_v)"
        )
    )


def cooccurrence_pairs(
    df: DataFrame,
    key_col: str = "user_id",
    item_col: str = "event_type",
    min_keys: int = 10,
) -> DataFrame:
    """Market-basket pair mining: for every unordered item pair, the
    number of keys exhibiting both, the support, and the lift vs
    independence — the association signal behind co-view/co-purchase
    and tag-co-occurrence analyses.

    Plan: distinct (key, item) once, then a self-join per key with
    item_a < item_b — per-key fan-out is |items|²/2, bounded by the
    item DOMAIN (not the corpus), so the join output is
    keys × domain²/2 worst-case; for unbounded domains pre-filter to
    the top-M items first. Everything else is three small aggregates
    and a 1-row broadcast of the key universe size."""
    items = df.select(
        F.col(key_col).alias("k"), F.col(item_col).alias("item")
    ).distinct()
    tot = items.agg(F.countDistinct("k").alias("_n"))
    per_item = items.groupBy("item").agg(F.count("*").alias("n_item"))
    a = items.select("k", F.col("item").alias("item_a"))
    b = items.select("k", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "k")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_keys"))
        .filter(F.col("n_keys") >= min_keys)
    )
    na = per_item.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a"))
    nb = per_item.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "item_a",
            "item_b",
            "n_keys",
            F.round(F.col("n_keys") / F.col("_n"), 6).alias("support"),
            F.round(
                (F.col("n_keys") * F.col("_n"))
                / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
    )


def psi_drift(
    df: DataFrame,
    value_col: str = "value",
    by: str = "event_type",
    ts_col: str = "tus",
    bins: int = 10,
) -> DataFrame:
    """Population Stability Index between the early and late half of a
    stream, per group — the standard ML-monitoring drift score
    (PSI < 0.1 stable, > 0.25 action). Reference = rows before the
    midpoint of the observed time range; comparison = rows after.

    Plan: ONE 1-row agg broadcasts the global (t_min, t_max, v_min,
    v_max); binning is then a narrow projection; counts are one
    partial-combinable agg over (group, half, bin); the PSI fold runs
    over ≤ groups×bins rows. Laplace smoothing keeps empty bins
    finite; identical constants on both engines."""
    bounds = df.agg(
        F.min(ts_col).alias("t_lo"),
        F.max(ts_col).alias("t_hi"),
        F.min(value_col).alias("v_lo"),
        F.max(value_col).alias("v_hi"),
    )
    j = df.crossJoin(F.broadcast(bounds))
    mid = (F.col("t_lo") + F.col("t_hi")) / 2
    span = F.col("v_hi") - F.col("v_lo")
    binned = j.select(
        F.col(by),
        F.when(F.col(ts_col) < mid, F.lit("ref")).otherwise(F.lit("cur")).alias(
            "half"
        ),
        F.when(span == 0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(bins - 1),
                F.floor((F.col(value_col) - F.col("v_lo")) / span * bins).cast(
                    "int"
                ),
            )
        )
        .alias("bin"),
    )
    counts = binned.groupBy(by, "half", "bin").agg(F.count("*").alias("c"))
    return psi_from_counts(counts, by=by, bins=bins)


def psi_from_counts(
    counts: DataFrame, by: str = "event_type", bins: int = 10
) -> DataFrame:
    """PSI finale over a (by, half, bin, c) count table — shared by the
    batch splitter above and the streaming path (t16), whose live
    histogram snapshot unions with the batch reference counts into
    exactly this shape. Everything here is groups×bins-sized."""
    tot = counts.groupBy(by, "half").agg(F.sum("c").alias("n"))
    probs = counts.join(tot, [by, "half"]).select(
        by,
        "half",
        "bin",
        ((F.col("c") + 0.5) / (F.col("n") + 0.5 * bins)).alias("p"),
    )
    ref = probs.filter(F.col("half") == "ref").select(
        by, "bin", F.col("p").alias("p_ref")
    )
    cur = probs.filter(F.col("half") == "cur").select(
        by, "bin", F.col("p").alias("p_cur")
    )
    # full outer on bins so a bin present in only one half still counts
    # (the absent side gets the pure-smoothing mass)
    # one zero-filled row per group (NOT two filtered inner joins):
    # a group living entirely in one half — a brand-new or vanished
    # category, maximal drift by definition — must stay in the report
    # with the absent side reading pure smoothing mass, not silently
    # drop out of it
    halves = tot.groupBy(by).agg(
        F.coalesce(
            F.sum(F.when(F.col("half") == "ref", F.col("n"))), F.lit(0)
        ).alias("nr"),
        F.coalesce(
            F.sum(F.when(F.col("half") == "cur", F.col("n"))), F.lit(0)
        ).alias("nc"),
    )
    both = (
        ref.join(cur, [by, "bin"], "full_outer")
        .join(F.broadcast(halves), by)
        .select(
            by,
            F.coalesce(F.col("p_ref"), 0.5 / (F.col("nr") + 0.5 * bins)).alias(
                "pr"
            ),
            F.coalesce(F.col("p_cur"), 0.5 / (F.col("nc") + 0.5 * bins)).alias(
                "pc"
            ),
        )
    )
    return (
        both.groupBy(by)
        .agg(
            F.round(
                F.sum((F.col("pc") - F.col("pr")) * F.log(F.col("pc") / F.col("pr"))),
                5,
            ).alias("psi")
        )
    )


def fd_violations(
    df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Functional-dependency check over candidate column pairs (the
    core primitive of FD-discovery profilers — Papenbrock et al.,
    VLDB'15 'Functional Dependency Discovery', public): for each
    (determinant → dependent) candidate, the violation count is
    Σ_over_det_values (group size − mode frequency) — the minimum
    number of rows to delete for the FD to hold exactly (the g3 error
    measure). ``holds`` iff that count is 0.

    Per pair: one (det, dep) hash agg, one det-level re-agg, one
    global fold — all partial-combinable, no windows, no joins; pairs
    are evaluated independently and unioned (the candidate list is
    human-sized). Skew-safe: the mode per determinant comes from
    max(count), never from collecting a group."""
    outs = []
    for det, dep in pairs:
        g = df.groupBy(det, dep).agg(F.count("*").alias("_c"))
        per_det = g.groupBy(det).agg(
            F.sum("_c").alias("_n"), F.max("_c").alias("_mode")
        )
        outs.append(
            per_det.agg(
                F.count("*").alias("n_groups"),
                F.coalesce(F.sum(F.col("_n") - F.col("_mode")), F.lit(0))
                .cast("long")
                .alias("n_violations"),
            ).select(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                "n_groups",
                "n_violations",
                (F.col("n_violations") == 0).alias("holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def benford_digit_counts(
    df: DataFrame, value_col: str, scale: int = 100
) -> DataFrame:
    """(d, c) first-significant-digit counts for Benford screening —
    d = 0 collects the rows with no leading digit on the grid
    (value ≤ 0).  ≤10 rows, associative counts: runs identically as a
    batch agg or a streaming complete-mode agg (the T-twin shared-
    finale contract).  The digit is read from the floor-quantized
    INTEGER's decimal string — no log10, no float-boundary dice,
    engine-portable digit extraction."""
    v = F.floor(F.col(value_col) * scale).cast("long")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(v.alias("_i"))
        .select(
            F.when(
                F.col("_i") >= 1,
                F.substring(F.col("_i").cast("string"), 1, 1).cast("int"),
            )
            .otherwise(F.lit(0))
            .alias("d")
        )
        .groupBy("d")
        .agg(F.count("*").cast("long").alias("c"))
    )


def benford_finale(counts: DataFrame) -> DataFrame:
    """Chi-square + MAD Benford verdict from a (d, c) digit-count
    table (d = 0 rows are the skipped non-positive count) — shared by
    the batch operator and the T24 streaming twin, so the stream
    snapshot hash-matches the batch SQL by construction.

    Expected probabilities log10(1+1/d) enter as literal constants
    (identical on both engines); each digit's chi/MAD contribution is
    1e-9-floored before the exact-integer sum; absent digits fold in
    closed form via the remaining probability mass."""
    import math as _math

    probs = {d: _math.log10(1 + 1 / d) for d in range(1, 10)}
    pos = counts.filter(F.col("d") >= 1)
    skipped = counts.filter(F.col("d") == 0).agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_skipped")
    )
    q9 = lambda c: F.floor(c * 1e9).cast("long")  # noqa: E731
    tot = pos.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n")
    )
    nn = F.col("n").cast("double")
    enriched = pos.crossJoin(F.broadcast(tot))
    p_of_d = None
    for d in range(1, 10):
        term = F.when(F.col("d") == d, F.lit(float(probs[d])))
        p_of_d = term if p_of_d is None else F.coalesce(p_of_d, term)
    obs_share = F.col("c").cast("double") / nn
    chi_term = (
        (F.col("c").cast("double") - nn * p_of_d)
        * (F.col("c").cast("double") - nn * p_of_d)
        / (nn * p_of_d)
    )
    mad_term = F.abs(obs_share - p_of_d)
    present = enriched.agg(
        F.coalesce(F.sum(q9(chi_term)), F.lit(0)).alias("_chi9"),
        F.coalesce(F.sum(q9(mad_term)), F.lit(0)).alias("_mad9"),
        F.coalesce(F.sum(q9(p_of_d)), F.lit(0)).alias("_pmass9"),
        *[
            F.coalesce(
                F.sum(F.when(F.col("d") == d, F.col("c")).otherwise(0)),
                F.lit(0),
            ).cast("long").alias(f"_c{d}")
            for d in range(1, 10)
        ],
    )
    row = tot.crossJoin(present).crossJoin(F.broadcast(skipped))
    full_p9 = int(sum(_math.floor(probs[d] * 1e9) for d in range(1, 10)))
    missing_p = (F.lit(full_p9) - F.col("_pmass9")) / 1e9
    chi2 = F.col("_chi9") / 1e9 + nn * missing_p
    mad = (F.col("_mad9") / 1e9 + missing_p) / 9.0
    shares = [
        F.when(
            F.col("n") > 0,
            F.floor(F.col(f"_c{d}") * 1000000 / F.col("n")) / 1e6,
        ).alias(f"d{d}_q6")
        for d in range(1, 10)
    ]
    return row.select(
        "n",
        "n_skipped",
        *shares,
        F.when(F.col("n") > 0, F.floor(chi2 * 1e3) / 1e3).alias("chi2_q"),
        F.when(F.col("n") > 0, F.floor(mad * 1e6) / 1e6).alias("mad_q6"),
    )


def benford_first_digit(
    df: DataFrame, value_col: str, scale: int = 100
) -> DataFrame:
    """Benford's-law first-significant-digit test — the classic
    fabricated-data / corruption screen for naturally-occurring
    positive quantities (Benford 1938; Nigrini's audit standard).
    One corpus hash agg into ≤10 rows (:func:`benford_digit_counts`),
    then the shared :func:`benford_finale`.

    Returns one row: n, n_skipped (value ≤ 0 on the grid),
    d1_q6..d9_q6 observed shares, chi2_q (3dp), mad_q6."""
    return benford_finale(benford_digit_counts(df, value_col, scale))


def source_jaccard_matrix(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    shingle_words: int = 3,
) -> DataFrame:
    """Pairwise Jaccard similarity between the word-shingle sets of
    every corpus source — the corpus-composition diagnostic behind
    mixture planning (two sources with high overlap double-count
    their tokens; candidates for merging or deduplication ACROSS
    sources). Exact, not sketched: the inverted-index self-join on
    8-byte shingle hashes produces at most |sources|² rows per
    distinct shingle, and the output is |sources|²-bounded.

    Jaccard reports as an exact integer pair (intersection, union)
    plus j_q6 = (inter*1e6) div union / 1e6 — integer floor division,
    no float anywhere. Hash collisions: xxhash64 over shingles (the
    dedup-family convention — collision risk identical to
    dedup_ngram_jaccard's, documented there)."""
    from .dedup import _spread, word_shingles

    # word_shingles normalizes internally; _spread parallelizes the
    # per-doc shingle transform past a single-file local scan (no-op
    # on a real multi-split corpus — the blocklist_hits lesson)
    sh = (
        _spread(df, F.xxhash64(F.col(text_col)))
        .select(
            F.col(source_col).alias("src"),
            F.explode(
                word_shingles(F.col(text_col), shingle_words)
            ).alias("sh"),
        )
        .select("src", F.xxhash64("sh").alias("h"))
        .distinct()
    )
    sizes = sh.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    a = sh.selectExpr("src AS s1", "h")
    b = sh.selectExpr("src AS s2", "h")
    inter = (
        a.join(b, "h")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    return (
        inter.join(sizes.selectExpr("src AS s1", "sz AS sz1"), "s1")
        .join(sizes.selectExpr("src AS s2", "sz AS sz2"), "s2")
        .selectExpr(
            "s1",
            "s2",
            "inter",
            "sz1 + sz2 - inter AS uni",
            "(inter * 1000000 div (sz1 + sz2 - inter)) / 1e6 AS j_q6",
        )
    )
