"""Model/data evaluation statistics, distributed-first.

A training-data pipeline doesn't stop at producing a corpus — it has
to *grade* the filters and clusterings it applied: is the learned
quality score actually separating good from bad (AUC, calibration)?
Did the clustering produce tight clusters (silhouette)? Is token mass
concentrated in a few documents (Gini)? Are two cohorts actually
different (Welch)?  How long do users survive before churning
(Kaplan-Meier)?

Every estimator here is one or two partial-combinable aggregations.
Where a classical formula wants a global sort (AUC ranks, KM's
time-ordered at-risk counts), the sort runs over a table whose size is
BOUNDED BY CONSTRUCTION — a fixed score grid (``n_bins``) or the
distinct-duration domain — never over corpus-cardinality rows, so the
single-partition window is a constant-size reduction no matter how
many input rows feed it.  (Beyond-reference capability; no counterpart
in the reference pipeline.)
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F

# ln(x) guard: Kaplan-Meier's survival product hits factor == 0.0 when
# the last at-risk subject churns; Spark's ln(0) is NULL while DuckDB's
# is -inf.  Clamping to 1e-300 makes both engines produce exp(-690.77…)
# which rounds to exactly 0.0 at 6 decimals.
_LN_FLOOR = 1e-300


def binned_auc(
    df: DataFrame,
    score_col: str,
    label_col: Column,
    n_bins: int = 1000,
    lo: float = 0.0,
    hi: float = 500.0,
) -> DataFrame:
    """ROC AUC of ``score_col`` against a boolean label, computed on a
    fixed ``n_bins`` score grid (the standard distributed-AUC shape:
    histogram the scores, then one rank-sum pass over the bins).

    Ties inside a bin contribute half a concordant pair (trapezoidal /
    Mann-Whitney with mid-rank ties), so the estimate is deterministic
    and exactly reproducible by any engine that bins identically.  The
    corpus is reduced to ≤ ``n_bins`` rows by one map-side-combined
    aggregate; the cumulative-negatives window then runs over that
    constant-size table — bounded by construction, never by data size.

    Returns one row: ``auc, n_pos, n_neg``.
    """
    binned = score_bin_histogram(df, score_col, label_col, n_bins, lo, hi)
    return auc_from_bins(binned)


def score_bin_histogram(
    df: DataFrame,
    score_col: str,
    label_col: Column,
    n_bins: int = 1000,
    lo: float = 0.0,
    hi: float = 500.0,
) -> DataFrame:
    """(bin, pos, neg) histogram on the fixed score grid — ONE
    map-side-combined aggregate, and the mergeable artifact behind
    both AUC and AP: per-bin counts are associative sums, so a
    streaming aggregate or a union of per-shard histograms folds into
    the identical table (the t14 streaming twin relies on this)."""
    width = (hi - lo) / n_bins
    b = F.least(
        F.greatest(F.floor((F.col(score_col) - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    y = label_col.cast("int")
    # NULL scores must not score: Spark's greatest/least skip NULLs so
    # an unfiltered NULL would land in bin 0, while SQL engines keep a
    # NULL bin whose ORDER BY position differs (Spark NULLS FIRST vs
    # DuckDB NULLS LAST) — drop them here so every consumer (AUC,
    # DeLong, AP, stump, t14 stream) and every oracle agrees
    return (
        df.filter(F.col(score_col).isNotNull())
        .select(b.alias("bin"), y.alias("y"))
        .groupBy("bin")
        .agg(
            F.sum("y").alias("pos"),
            (F.count("*") - F.sum("y")).alias("neg"),
        )
    )


def auc_from_bins(binned: DataFrame) -> DataFrame:
    """Rank-sum AUC finale over a (bin, pos, neg) histogram (from
    :func:`score_bin_histogram`, a streaming snapshot, or a merge of
    shard histograms — the math only sees ≤ n_bins rows)."""
    w_prev = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = binned.withColumn(
        "cumneg", F.coalesce(F.sum("neg").over(w_prev), F.lit(0))
    )
    # a single-class input has no ranking to score: AUC is NULL, not a
    # division-by-zero crash (nullif mirrors the oracle's guard)
    return cum.agg(
        F.round(
            F.sum(F.col("pos") * (F.col("cumneg") + F.col("neg") / 2.0))
            / F.expr("nullif(CAST(sum(pos) AS DOUBLE) * sum(neg), 0.0)"),
            6,
        ).alias("auc"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
    )


def kaplan_meier(
    per_subject: DataFrame,
    duration_col: str = "duration",
    observed_col: str = "observed",
) -> DataFrame:
    """Kaplan-Meier survival curve from per-subject (duration,
    observed) rows — ``observed`` true means the terminal event
    happened at ``duration``; false means censored there.

    One aggregate folds subjects to per-duration (events, censored)
    counts; the at-risk series and the survival product S(t) =
    Π (1 − d_i/n_i) then run as ordered windows over the
    distinct-duration table, whose cardinality is the *time domain*
    (days of history), not the subject count.  The product is computed
    as exp(Σ ln(factor)) so it partial-combines; factor is clamped at
    1e-300 so a 0 factor survives both engines' ln identically.

    Returns ``duration, n_at_risk, n_events, n_censored, survival``
    ordered by duration.
    """
    obs = F.col(observed_col).cast("int")
    grp = per_subject.groupBy(F.col(duration_col).alias("duration")).agg(
        F.sum(obs).alias("n_events"),
        (F.count("*") - F.sum(obs)).alias("n_censored"),
    )
    w_prev = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_cur = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    at_risk = F.sum(F.col("n_events") + F.col("n_censored")).over(w_all) - F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(w_prev), F.lit(0)
    )
    curve = grp.withColumn("n_at_risk", at_risk.cast("long")).withColumn(
        "_lf",
        F.log(
            F.greatest(
                F.lit(1.0) - F.col("n_events") / F.col("n_at_risk"),
                F.lit(_LN_FLOOR),
            )
        ),
    )
    return (
        curve.withColumn(
            "survival", F.round(F.exp(F.sum("_lf").over(w_cur)), 6)
        )
        .select(
            "duration",
            "n_at_risk",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_censored").cast("long").alias("n_censored"),
            "survival",
        )
        .orderBy("duration")
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Welch's unequal-variance t-test between two groups, in ONE
    partial-combinable aggregate (conditional count + exact lattice
    moments — no shuffle beyond the single global agg).

    Exactness (the cohen_d lattice-moments convention, ported r9):
    values micro-quantize to the 1e-6 grid BEFORE any sum —
    round(avg)/round(var_samp) are summation-order-dependent across
    engines and events.value sits on a 2-dp grid, so their means land
    ON 6-dp half-up boundaries at real rates — then mean and variance
    are single divisions of exact integers, floor-quantized at 6 dp.
    The t / degrees-of-freedom doubles derive from those identical
    lattice inputs with the op order mirrored token-for-token in the
    oracle. NaN values drop on both engines (see wasserstein_1d).
    Envelope: n·Σq² exact in DECIMAL(38,0) — valid to ~1e10 rows at
    |value| ≤ 100.

    Returns one row: ``n_a, n_b, mean_a, mean_b, t_stat, df``.
    """
    v = F.col(value_col).cast("double")
    q = F.when(~F.isnan(v), F.floor(v * 1000000)).cast("long")
    qa = F.when(F.col(group_col) == group_a, q)
    qb = F.when(F.col(group_col) == group_b, q)
    qad = qa.cast("decimal(38,0)")
    qbd = qb.cast("decimal(38,0)")

    def _lat_mean(s, n):
        return F.floor(s.cast("double") / n) / 1e6 + 0.0

    def _lat_var(ss, s, n):
        # sample variance of the micro-quantized values, floor-q6:
        # (n·Σq² − (Σq)²) exact in decimal; ONE double division by
        # n(n−1)·1e6 (int product first, ×1e6 in double — mirrored)
        return F.when(
            n >= 2,
            F.floor(
                (n.cast("decimal(38,0)") * ss - s * s).cast("double")
                / ((n * (n - 1)).cast("double") * 1e6)
            )
            / 1e6
            + 0.0,
        )

    agg = df.agg(
        F.count(qa).alias("n_a"),
        F.count(qb).alias("n_b"),
        F.sum(qad).alias("_sa"),
        F.sum(qbd).alias("_sb"),
        F.sum(qad * qad).alias("_ssa"),
        F.sum(qbd * qbd).alias("_ssb"),
    ).select(
        "n_a",
        "n_b",
        _lat_mean(F.col("_sa"), F.col("n_a")).alias("mean_a"),
        _lat_mean(F.col("_sb"), F.col("n_b")).alias("mean_b"),
        _lat_var(F.col("_ssa"), F.col("_sa"), F.col("n_a")).alias("var_a"),
        _lat_var(F.col("_ssb"), F.col("_sb"), F.col("n_b")).alias("var_b"),
    )
    sa = F.col("var_a") / F.col("n_a")
    sb = F.col("var_b") / F.col("n_b")
    se2 = sa + sb
    t = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (sa * sa) / (F.col("n_a") - 1) + (sb * sb) / (F.col("n_b") - 1)
    )
    return agg.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        F.round(t, 4).alias("t_stat"),
        F.round(dof, 2).alias("df"),
    )


def calibration_bins(
    scored: DataFrame,
    prob_col: str,
    label_col: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + per-bin Brier score for a probabilistic
    classifier: bucket predicted probability into ``n_bins`` equal-width
    bins, compare mean prediction with observed positive rate.  One
    map-side-combined aggregate; output is ``n_bins`` rows.

    Exactness (r9 lattice port): callers pass probabilities that are
    already 6-dp-rounded (grid-aligned), so round(avg(p), 6) lands ON
    half-up boundaries at real rates and is summation-order-dependent
    — the exact residual class the seed-randomized gate rolls. p
    micro-quantizes to the 1e-6 grid (exact for 6-dp-valued doubles
    via floor(p·1e6 + 0.5) — the _cents recovery), the squared brier
    residual is an exact integer in 1e-12 units, and every mean is one
    exact-integer division floor-quantized at 6 dp on both engines.

    Returns ``bin, n, mean_prob, pos_rate, brier`` ordered by bin.
    """
    y = label_col.cast("int")
    b = F.least(
        F.floor(F.col(prob_col) * n_bins), F.lit(n_bins - 1)
    ).cast("int")
    # p is 6-dp-valued: floor(p*1e6 + 0.5) recovers the grid integer
    # exactly (the _cents lesson — floor(p*1e6) alone can land one
    # below when the nearest double sits under the grid point)
    pq = F.floor(F.col(prob_col) * 1000000 + F.lit(0.5)).cast("long")
    d = pq - y.cast("long") * 1000000  # exact brier residual, 1e-6
    return (
        scored.select(b.alias("bin"), pq.alias("pq"), y.alias("y"),
                      (d * d).alias("d2"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("pq").alias("_sp"),
            F.sum("y").cast("long").alias("_sy"),
            F.sum(F.col("d2").cast("decimal(38,0)")).alias("_sd2"),
        )
        .select(
            "bin",
            "n",
            (F.floor(F.col("_sp").cast("double") / F.col("n")) / 1e6 + 0.0)
            .alias("mean_prob"),
            (
                F.floor(F.col("_sy").cast("double") * 1e6 / F.col("n"))
                / 1e6
                + 0.0
            ).alias("pos_rate"),
            (
                F.floor(
                    F.col("_sd2").cast("double")
                    / (F.col("n").cast("double") * 1e6)
                )
                / 1e6
                + 0.0
            ).alias("brier"),
        )
        .orderBy("bin")
    )


def silhouette_by_cluster(
    df: DataFrame,
    vec_col: str = "embedding",
    cluster_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """Simplified (centroid-based) silhouette per cluster: a(i) is the
    euclidean distance to the OWN cluster centroid, b(i) the minimum
    distance to any OTHER centroid, s(i) = (b−a)/max(a,b); the classic
    O(n²) pairwise silhouette is replaced by the O(n·k) medoid-free
    form every large-scale evaluation uses.

    Shape: centroids come from one explode-once hash aggregate (k·dim
    rows, rounded to 6 dp so they are engine-reproducible), fold back
    to k rows, broadcast; each point then scores k centroid rows via a
    zip_with dot — the corpus never shuffles on content, and the
    a/b reduction map-side combines on the point id (crossJoin output
    is partition-local per point).

    Returns ``{cluster_col}, n, mean_silhouette`` ordered by cluster.
    """
    pts = df.select(
        F.col(id_col).alias("_id"),
        F.col(cluster_col).alias("_own"),
        F.col(vec_col).alias("_v"),
    )
    # centroid means on the exact micro lattice (r9 port — round(avg)
    # is summation-order-dependent; the _centroid_means template)
    cent = (
        pts.select("_own", F.posexplode("_v").alias("_pos", "_x"))
        .groupBy("_own", "_pos")
        .agg(
            F.sum(
                F.floor(F.col("_x").cast("double") * 1000000).cast("long")
            ).alias("_sm"),
            F.count("*").alias("_nm"),
        )
        .select(
            "_own",
            "_pos",
            (
                F.floor(F.col("_sm").cast("double") / F.col("_nm")) / 1e6
                + 0.0
            ).alias("_c"),
        )
        .groupBy(F.col("_own").alias("_clu"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_pos", "_c"))
            ).alias("_pc")
        )
        .select("_clu", F.col("_pc._c").alias("_centroid"))
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("_v").cast("array<double>"),
            F.col("_centroid"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = pts.crossJoin(F.broadcast(cent)).select(
        "_id", "_own", "_clu", F.sqrt(d2).alias("_d")
    )
    per_point = scored.groupBy("_id", "_own").agg(
        F.min(F.when(F.col("_clu") == F.col("_own"), F.col("_d"))).alias("_a"),
        F.min(F.when(F.col("_clu") != F.col("_own"), F.col("_d"))).alias("_b"),
    )
    s = (F.col("_b") - F.col("_a")) / F.greatest(F.col("_a"), F.col("_b"))
    # s is bit-identical cross-engine (sqrt/div of identical lattice
    # centroids), so its micro floor is too; the mean is one exact
    # integer division — no float summation order anywhere
    sq = F.floor(s * 1000000).cast("long")
    return (
        per_point.groupBy(F.col("_own").alias(cluster_col))
        .agg(
            F.count("*").alias("n"),
            (
                F.floor(F.sum(sq).cast("double") / F.count(sq)) / 1e6
                + 0.0
            ).alias("mean_silhouette"),
        )
        .orderBy(cluster_col)
    )


def gini_by_group(
    df: DataFrame,
    group_col: str,
    x_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Gini concentration coefficient of ``x_col`` within each group
    (how unevenly token mass / value mass is spread over members),
    via the rank formula G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n over the
    ascending sort — a per-group window (partitioned, parallel across
    groups) plus one aggregate.  ``tiebreak_col`` pins the sort so
    equal x values rank deterministically (their contribution to G is
    order-invariant anyway, but the plan stays reproducible).

    Returns ``{group_col}, n, gini`` ordered by group.
    """
    w = Window.partitionBy(group_col).orderBy("_x", tiebreak_col)
    ranked = df.select(
        F.col(group_col),
        F.col(tiebreak_col),
        F.col(x_col).cast("double").alias("_x"),
    ).withColumn("_i", F.row_number().over(w))
    # zero total mass (every member 0) is perfect equality by
    # convention — and an ANSI division-by-zero without the guard
    gini = F.when(
        F.sum("_x") > 0,
        2.0 * F.sum(F.col("_i") * F.col("_x"))
        / (F.count("*") * F.sum("_x"))
        - (F.count("*") + 1.0) / F.count("*"),
    ).otherwise(F.lit(0.0))
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(gini, 6).alias("gini"),
        )
        .orderBy(group_col)
    )


def binned_average_precision(
    df: DataFrame,
    score_col: str,
    label_col: Column,
    n_bins: int = 1000,
    lo: float = 0.0,
    hi: float = 500.0,
) -> DataFrame:
    """Average precision (PR-AUC) on the same fixed score grid as
    :func:`binned_auc`: AP = Σ_b ΔR_b · P_b walking bins from the
    highest score down, with precision measured at each bin's
    threshold (the sklearn step-wise definition, binned).  Identical
    scale shape to the AUC: corpus → ≤ n_bins rows, then one
    bounded descending window + one aggregate.

    Returns one row: ``ap, n_pos, n_neg``.
    """
    binned = score_bin_histogram(df, score_col, label_col, n_bins, lo, hi)
    w_desc = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = binned.withColumn("cumtp", F.sum("pos").over(w_desc)).withColumn(
        "cumfp", F.sum("neg").over(w_desc)
    )
    prec = F.col("cumtp") / (F.col("cumtp") + F.col("cumfp"))
    # no positives -> AP undefined (NULL), never a /0 crash
    return cum.agg(
        F.round(
            F.sum(F.col("pos") * prec)
            / F.expr("nullif(CAST(sum(pos) AS DOUBLE), 0.0)"),
            6,
        ).alias("ap"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
    )


def cohens_kappa(df: DataFrame, pred_col: str, truth_col: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between a predicted
    and a true labeling.  The confusion matrix is one hash aggregate
    (cells ≤ classes², tiny); observed agreement and the chance term
    Σ p_pred(c)·p_true(c) then come from class-dimension joins of the
    cell table — nothing beyond the first aggregate ever sees a
    corpus-sized row set.

    Returns one row: ``n, po, pe, kappa``.
    """
    cm = df.groupBy(
        F.col(pred_col).alias("_p"), F.col(truth_col).alias("_t")
    ).agg(F.count("*").alias("_c"))
    tot = cm.agg(
        F.sum("_c").cast("long").alias("_n"),
        F.sum(F.when(F.col("_p") == F.col("_t"), F.col("_c")).otherwise(0))
        .cast("long")
        .alias("_agree"),
    )
    mp = cm.groupBy(F.col("_p").alias("_cls")).agg(F.sum("_c").alias("_mp"))
    mt = cm.groupBy(F.col("_t").alias("_cls")).agg(F.sum("_c").alias("_mt"))
    pe_num = (
        mp.join(mt, "_cls")
        .agg(F.sum(F.col("_mp").cast("double") * F.col("_mt")).alias("_pe_num"))
    )
    j = tot.crossJoin(pe_num)
    po = F.col("_agree") / F.col("_n")
    pe = F.col("_pe_num") / (F.col("_n").cast("double") * F.col("_n"))
    return j.select(
        F.col("_n").alias("n"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        # pe = 1 (single-class matrix) makes kappa 0/0; report NULL
        # like every other degenerate ratio in this module
        F.round(F.when(pe < 1.0, (po - pe) / (1.0 - pe)), 6).alias("kappa"),
    )


def confusion_stats(df: DataFrame, pred_col: str, truth_col: str) -> DataFrame:
    """Per-class confusion-matrix statistics: tp / fp / fn, precision,
    recall, F1 — over the UNION of predicted and true class sets (a
    class never predicted still reports recall; a class never true
    still reports its false-positive volume).  One corpus aggregate;
    everything after is class-dimension-sized.

    Returns ``class, tp, fp, fn, precision, recall, f1`` ordered by
    class; undefined ratios (0 denominators) report 0.0.
    """
    cm = df.groupBy(
        F.col(pred_col).alias("_p"), F.col(truth_col).alias("_t")
    ).agg(F.count("*").alias("_c"))
    tp = (
        cm.filter(F.col("_p") == F.col("_t"))
        .select(F.col("_p").alias("_cls"), F.col("_c").alias("_tp"))
    )
    mp = cm.groupBy(F.col("_p").alias("_cls")).agg(F.sum("_c").alias("_mp"))
    mt = cm.groupBy(F.col("_t").alias("_cls")).agg(F.sum("_c").alias("_mt"))
    base = (
        mp.join(mt, "_cls", "full_outer")
        .join(tp, "_cls", "left")
        .select(
            F.col("_cls").alias("class"),
            F.coalesce("_tp", F.lit(0)).cast("long").alias("tp"),
            (F.coalesce("_mp", F.lit(0)) - F.coalesce("_tp", F.lit(0)))
            .cast("long")
            .alias("fp"),
            (F.coalesce("_mt", F.lit(0)) - F.coalesce("_tp", F.lit(0)))
            .cast("long")
            .alias("fn"),
        )
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")),
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")),
    ).otherwise(F.lit(0.0))
    out = base.withColumn("_prec", prec).withColumn("_rec", rec)
    f1 = F.when(
        F.col("_prec") + F.col("_rec") > 0,
        2.0 * F.col("_prec") * F.col("_rec") / (F.col("_prec") + F.col("_rec")),
    ).otherwise(F.lit(0.0))
    return out.select(
        "class",
        "tp",
        "fp",
        "fn",
        F.round("_prec", 6).alias("precision"),
        F.round("_rec", 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    ).orderBy("class")


def contingency_independence(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Chi-squared test of independence + Cramér's V + mutual
    information for two categorical columns, all from ONE corpus
    aggregate (the contingency cells) followed by class-dimension
    joins.  χ² uses the zero-cell-free identity Σ o²/e − N (unobserved
    cells contribute nothing to Σ o²/e), so the cell cross-product is
    never materialized.

    Returns one row: ``n, dof, chi2, cramers_v, mi_nats``.
    """
    cm = df.groupBy(
        F.col(a_col).alias("_a"), F.col(b_col).alias("_b")
    ).agg(F.count("*").alias("_o"))
    ma = cm.groupBy("_a").agg(F.sum("_o").alias("_ma"))
    mb = cm.groupBy("_b").agg(F.sum("_o").alias("_mb"))
    tot = cm.agg(
        F.sum("_o").cast("double").alias("_n"),
        F.countDistinct("_a").alias("_r"),
        F.countDistinct("_b").alias("_c"),
    )
    cells = cm.join(ma, "_a").join(mb, "_b").crossJoin(F.broadcast(tot))
    e = F.col("_ma").cast("double") * F.col("_mb") / F.col("_n")
    o = F.col("_o").cast("double")
    agg = cells.agg(
        F.first("_n").alias("_n"),
        F.first("_r").alias("_r"),
        F.first("_c").alias("_c"),
        F.sum(o * o / e).alias("_sum_o2e"),
        F.sum(
            (o / F.col("_n"))
            * F.log(
                o * F.col("_n") / (F.col("_ma").cast("double") * F.col("_mb"))
            )
        ).alias("_mi"),
    )
    chi2 = F.col("_sum_o2e") - F.col("_n")
    # a 1×k table has dof 0: V is undefined (NULL), never a /0 crash
    v = F.sqrt(
        chi2
        / F.expr("nullif(_n * least(_r - 1, _c - 1), 0.0)")
    )
    return agg.select(
        F.col("_n").cast("long").alias("n"),
        ((F.col("_r") - 1) * (F.col("_c") - 1)).cast("long").alias("dof"),
        F.round(chi2, 4).alias("chi2"),
        F.round(v, 6).alias("cramers_v"),
        F.round(F.col("_mi"), 6).alias("mi_nats"),
    )


# cumulative Poisson(1) CDF, inverse-transform thresholds for the
# bootstrap weights; literals (not scipy) so the DuckDB oracle uses the
# exact same constants.  P(X > 7) ~= 1e-5 — the tail is capped at 8.
_POIS1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
)


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_boot: int = 100,
    alpha: float = 0.05,
) -> DataFrame:
    """Bootstrap confidence interval for the mean, via the POISSON
    bootstrap (Chamandy et al., public) — the resampling scheme that
    actually distributes: instead of drawing n-with-replacement (which
    needs global coordination), every row independently receives a
    Poisson(1) multiplicity per replicate, derived deterministically
    from md5(id, replicate) by inverse-CDF lookup.  One explode
    (×``n_boot``) feeds a per-replicate weighted-mean aggregate that
    map-side combines to ``n_boot`` rows per partition, so the shuffle
    moves n_boot×partitions rows — never the corpus.  The interval is
    the (α/2, 1−α/2) exact percentile over the n_boot replicate means.

    Exactness (r9 lattice port): values micro-quantize to the 1e-6
    grid before any sum — the base mean and every replicate's weighted
    mean are single divisions of exact integers, bit-identical across
    engines regardless of summation order (round(avg) and the double
    Σw·x were both order-dependent, and events.value's 2-dp grid
    lands their means ON 6-dp boundaries at real rates). NaN values
    drop on both engines (the wasserstein convention).

    Returns one row: ``mean, ci_lo, ci_hi, n_boot``.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws("|", F.col(id_col).cast("string"),
                                F.col("_rep").cast("string"))
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(float(1 << 48))
    w = F.lit(8)
    for i in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS1_CDF[i]), F.lit(i)).otherwise(w)
    v = F.col(value_col).cast("double")
    q = F.when(~F.isnan(v), F.floor(v * 1000000)).cast("long")
    reps = (
        df.select(
            F.col(id_col),
            q.alias("_q"),
            F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("_rep"),
        )
        .withColumn("_w", w)
        .groupBy("_rep")
        .agg(
            # a replicate can draw all-zero weights (p ≈ e^-n); it has
            # no resample mean — NULL, skipped by the percentile.
            # ONE double division of exact integer operands:
            # bit-identical in any engine and any partitioning
            (
                F.sum(F.col("_w") * F.col("_q")).cast("double")
                / F.expr("nullif(CAST(sum(CASE WHEN _q IS NOT NULL"
                         " THEN _w END) AS DOUBLE), 0.0)")
                / 1e6
            ).alias("_m")
        )
    )
    base = df.agg(
        (F.floor(F.sum(q).cast("double") / F.count(q)) / 1e6 + 0.0)
        .alias("mean")
    )
    ci = reps.agg(
        F.round(F.expr(f"percentile(_m, {alpha / 2})"), 6).alias("ci_lo"),
        F.round(F.expr(f"percentile(_m, {1 - alpha / 2})"), 6).alias("ci_hi"),
        F.count("*").cast("long").alias("n_boot"),
    )
    return base.crossJoin(ci).select("mean", "ci_lo", "ci_hi", "n_boot")


def conformal_interval(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Split-conformal prediction interval per group: hold out a
    deterministic md5 half as the calibration set, predict with the
    calibration mean, take the (1−α) exact quantile of absolute
    calibration residuals as the interval half-width, and report the
    empirical coverage on the other half — the distribution-free
    uncertainty wrapper (Vovk et al., public) every point predictor
    can wear.

    One conditional aggregate per group computes calibration n / mean
    (rounded 6 dp so both engines share the predictor), a second pass
    folds residual quantile + test coverage.  The exact per-group
    percentile sorts only within a group's calibration residuals;
    at corpus scale swap in percentile_approx — same contract.
    (Uses the fixed 1−α quantile; the finite-sample ⌈(n+1)(1−α)⌉/n
    correction shifts coverage by O(1/n), negligible beyond small
    groups.)

    Returns ``{group_col}, n_calib, n_test, qhat, coverage`` ordered
    by group.
    """
    is_calib = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1) < "8"
    base = df.select(
        F.col(group_col),
        F.col(value_col).cast("double").alias("_v"),
        is_calib.alias("_cal"),
    )
    # calibration mean on the exact micro lattice (r9 port): one
    # division of exact integers, floor-q6 — round(avg) was
    # summation-order-dependent and events.value's 2-dp grid lands
    # its means ON 6-dp boundaries; NaN calibration rows drop
    qcal = F.when(
        F.col("_cal") & ~F.isnan(F.col("_v")),
        F.floor(F.col("_v") * 1000000),
    ).cast("long")
    pred = base.groupBy(group_col).agg(
        F.sum(F.col("_cal").cast("int")).cast("long").alias("n_calib"),
        (F.count("*") - F.sum(F.col("_cal").cast("int")))
        .cast("long")
        .alias("n_test"),
        (
            F.floor(F.sum(qcal).cast("double") / F.count(qcal)) / 1e6
            + 0.0
        ).alias("_mu"),
    )
    scored = base.join(pred, group_col).withColumn(
        "_resid", F.abs(F.col("_v") - F.col("_mu"))
    )
    q = 1.0 - alpha
    stats = scored.groupBy(group_col).agg(
        F.first("n_calib").alias("n_calib"),
        F.first("n_test").alias("n_test"),
        F.expr(f"percentile(CASE WHEN _cal THEN _resid END, {q!r})")
        .alias("_q"),
    )
    cov = (
        scored.filter(~F.col("_cal"))
        .join(F.broadcast(stats.select(group_col, "_q")), group_col)
        .groupBy(group_col)
        .agg(
            # hit-rate k/n lands on 6-dp boundaries whenever n divides
            # nicely — exact integer division, floor-q6 (r9 port)
            (
                F.floor(
                    F.sum((F.col("_resid") <= F.col("_q")).cast("int"))
                    .cast("double")
                    * 1e6
                    / F.count((F.col("_resid") <= F.col("_q")).cast("int"))
                )
                / 1e6
                + 0.0
            ).alias("coverage")
        )
    )
    # LEFT join: a group the md5 split leaves with zero test rows
    # still reports its n_calib/qhat row (coverage NULL), instead of
    # silently vanishing from the per-group contract
    return (
        stats.join(cov, group_col, "left")
        .select(
            group_col,
            "n_calib",
            "n_test",
            F.round("_q", 6).alias("qhat"),
            "coverage",
        )
        .orderBy(group_col)
    )


def permutation_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    group_a: str,
    group_b: str,
    n_perm: int = 200,
) -> DataFrame:
    """Randomization test for a difference in means: re-assign every
    row to a pseudo-arm by a deterministic md5 coin per replicate
    (the binomial-split variant of the permutation test — valid under
    the same exchangeability null, and the version that distributes:
    no global shuffle of labels, just a per-row hash), rebuild the
    mean difference ``n_perm`` times, and report the two-sided
    p-value (1 + #{|diff_r| ≥ |observed|}) / (n_perm + 1).

    Shapes like the Poisson bootstrap: one ×n_perm explode whose
    per-replicate conditional means fold map-side to n_perm rows per
    partition; the final comparison is an aggregate over the
    n_perm-row replicate table against a broadcast 1-row observed
    diff.

    Exactness (r9 lattice port): values micro-quantize to the 1e-6
    grid, each arm mean is ONE division of exact integers floor-
    quantized at 6 dp, every replicate diff and the |diff| ≥ |obs|
    comparison are arithmetic on those identical lattice doubles, and
    the p-value k-out-of-(n+1) rational is one exact integer division
    — round(avg−avg) of 2-dp-grid values was both summation-order-
    dependent and boundary-prone. NaN values drop on both engines.

    Returns one row: ``obs_diff, p_value, n_perm``.
    """
    v = F.col(value_col).cast("double")
    qv = F.when(~F.isnan(v), F.floor(v * 1000000)).cast("long")
    two = df.filter(F.col(group_col).isin(group_a, group_b)).select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_g"),
        qv.alias("_q"),
    )

    def _latm(cond):
        qq = F.when(cond, F.col("_q"))
        return F.floor(F.sum(qq).cast("double") / F.count(qq)) / 1e6

    obs = two.agg(
        (
            _latm(F.col("_g") == group_a)
            - _latm(F.col("_g") == group_b)
            + 0.0
        ).alias("obs_diff")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws("|", F.col("_id").cast("string"),
                                F.col("_rep").cast("string"))
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(float(1 << 48))
    reps = (
        two.select(
            "_id",
            "_q",
            F.explode(F.sequence(F.lit(0), F.lit(n_perm - 1))).alias("_rep"),
        )
        .withColumn("_a", u < 0.5)
        .groupBy("_rep")
        .agg(
            # diff of exact lattice means — bit-identical in any
            # engine, so the |diff| >= |observed| comparison can't flip
            (_latm(F.col("_a")) - _latm(~F.col("_a")) + 0.0).alias("_d")
        )
    )
    extreme = reps.crossJoin(F.broadcast(obs)).agg(
        (
            F.floor(
                (
                    1
                    + F.sum(
                        (
                            F.abs(F.col("_d")) >= F.abs(F.col("obs_diff"))
                        ).cast("int")
                    )
                ).cast("double")
                * 1e6
                / F.lit(float(n_perm + 1))
            )
            / 1e6
            + 0.0
        ).alias("p_value"),
        F.count("*").cast("long").alias("n_perm"),
    )
    return obs.crossJoin(extreme).select("obs_diff", "p_value", "n_perm")


def isotonic_calibration(
    scored: DataFrame,
    score_col: str,
    label_col: Column,
    n_bins: int = 50,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Weighted isotonic regression of the positive rate against the
    score (PAVA semantics), the standard monotone re-calibration for a
    quality/classifier score before thresholding a 100 TB corpus on it.

    Shape: one map-side-combined aggregate folds the corpus to
    ``n_bins`` (bin, weight, positives) rows — the ONLY pass that sees
    data-cardinality rows.  The fit itself uses the closed-form minimax
    characterization of isotonic regression (Robertson-Wright-Dykstra;
    public):  iso(i) = max_{j<=i} min_{k>=i} wavg(y over bins j..k) —
    no iterative pool merging, no convergence loop, no global window:
    cumulative sums and the (j,i,k) triangle are bounded self-joins on
    the <= ``n_bins``-row relation (B^3/6 intermediate rows; ~20k at
    B=50).  Arithmetic is integer-sum ratios in doubles — bit-identical
    across engines — with a single terminal round(6).

    Returns ``bin, n, pos_rate, iso`` ordered by bin; ``iso`` is
    non-decreasing by construction.
    """
    y = label_col.cast("int")
    width = (hi - lo) / n_bins
    b = F.greatest(
        F.lit(0),
        F.least(
            F.floor((F.col(score_col) - F.lit(lo)) / F.lit(width)),
            F.lit(n_bins - 1),
        ),
    ).cast("int")
    bins = (
        scored.filter(F.col(score_col).isNotNull())
        .select(b.alias("bin"), y.alias("y"))
        .groupBy("bin")
        .agg(F.count("*").alias("w"), F.sum("y").cast("long").alias("s"))
    )
    # cumulative (W, S) up to each bin via a triangular self-join —
    # bounded B^2 work, avoids a single-partition window entirely
    cum = (
        bins.alias("a")
        .join(bins.alias("c"), F.col("c.bin") <= F.col("a.bin"))
        .groupBy(F.col("a.bin").alias("bin"), F.col("a.w").alias("w"),
                 F.col("a.s").alias("s"))
        .agg(F.sum("c.w").alias("cw"), F.sum("c.s").alias("cs"))
    )
    # interval mean A(j,k) for every j <= k: (S_k - S_{j-1}) / (W_k -
    # W_{j-1}) with S_{j-1} = S_j - s_j (same trick in the oracle)
    jj = cum.select(
        F.col("bin").alias("jbin"),
        (F.col("cs") - F.col("s")).alias("Sjm1"),
        (F.col("cw") - F.col("w")).alias("Wjm1"),
    )
    kk = cum.select(
        F.col("bin").alias("kbin"), F.col("cs").alias("Sk"),
        F.col("cw").alias("Wk"),
    )
    pairs = jj.join(kk, F.col("jbin") <= F.col("kbin")).select(
        "jbin", "kbin",
        (
            (F.col("Sk") - F.col("Sjm1")).cast("double")
            / (F.col("Wk") - F.col("Wjm1")).cast("double")
        ).alias("avg"),
    )
    idx = bins.select(F.col("bin").alias("ibin"), "w", "s")
    inner = (
        pairs.join(
            idx,
            (F.col("jbin") <= F.col("ibin")) & (F.col("kbin") >= F.col("ibin")),
        )
        .groupBy("ibin", "w", "s", "jbin")
        .agg(F.min("avg").alias("m"))
    )
    return (
        inner.groupBy("ibin", "w", "s")
        .agg(F.max("m").alias("_iso"))
        .select(
            F.col("ibin").alias("bin"),
            F.col("w").alias("n"),
            F.round(F.col("s").cast("double") / F.col("w"), 6).alias("pos_rate"),
            F.round("_iso", 6).alias("iso"),
        )
        .orderBy("bin")
    )


def woe_iv(
    df: DataFrame,
    bucket_col: Column,
    label_col: Column,
) -> DataFrame:
    """Weight-of-evidence / information-value screening of a candidate
    feature bucketing against a binary target — the standard scorecard
    question "does this feature separate the classes, and how much?"
    asked of corpus metadata (source, length bucket, hour) before
    training a quality classifier on it.

    WoE_i = ln((pos_i/P) / (neg_i/N));  IV_i = (pos_i/P − neg_i/N)·WoE_i.
    One map-side-combined aggregate to bucket cardinality, one
    broadcast single-row totals join.  Buckets with a zero class count
    yield NULL WoE/IV (undefined log-odds), matching this module's
    degenerate-ratio convention.

    Returns ``bucket, n, n_pos, woe, iv_contrib`` ordered by bucket.
    """
    y = label_col.cast("int")
    per = (
        df.select(bucket_col.alias("bucket"), y.alias("y"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
        )
    )
    return woe_from_counts(per)


def woe_from_counts(per: DataFrame) -> DataFrame:
    """WoE/IV finale over a ``(bucket, n, n_pos)`` counts relation —
    the mergeable artifact behind :func:`woe_iv`: per-bucket counts
    are associative sums, so a streaming aggregate snapshot (the T18
    twin) or a union of shard counts folds into the identical input
    and this finale produces the identical report."""
    per = per.withColumn("n_neg", F.col("n") - F.col("n_pos"))
    tot = per.agg(
        F.sum("n_pos").cast("long").alias("tp"),
        F.sum("n_neg").cast("long").alias("tn"),
    )
    pr = F.col("n_pos").cast("double") / F.col("tp").cast("double")
    nr = F.col("n_neg").cast("double") / F.col("tn").cast("double")
    ok = (
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
        & (F.col("tp") > 0) & (F.col("tn") > 0)
    )
    woe = F.log(pr / nr)
    return (
        per.join(F.broadcast(tot))
        .select(
            "bucket", "n", "n_pos",
            F.round(F.when(ok, woe), 6).alias("woe"),
            F.round(F.when(ok, (pr - nr) * woe), 6).alias("iv_contrib"),
        )
        .orderBy("bucket")
    )


def auc_delong_ci(
    df: DataFrame,
    score_col: str,
    label_col: Column,
    n_bins: int = 1000,
    lo: float = 0.0,
    hi: float = 500.0,
) -> DataFrame:
    """ROC AUC with its DeLong standard error and 95% CI (DeLong,
    DeLong & Clarke-Pearson 1988, public), on the same fixed
    ``n_bins`` score grid as :func:`binned_auc` — the question "is
    this quality score's separation real or noise" answered without a
    second pass over the corpus.

    Positives in a bin share the placement value V10 = (#neg below +
    ½·#neg tied)/n0 (and symmetrically V01 for negatives), so the
    per-observation DeLong variances collapse to pos/neg-weighted
    moments over the ≤ ``n_bins``-row bin table.  The AUC entering
    (V−auc)² is the unrounded exact ratio (its numerator sums
    .5-granular values — exact in doubles), and each weighted squared
    deviation is floor-quantized to 1e-12 and summed as integers, so
    the whole statistic is order-free and engine-identical.

    Returns one row: ``auc, se, ci_lo, ci_hi, n_pos, n_neg`` (se/CI
    NULL when either class has < 2 observations).
    """
    binned = score_bin_histogram(df, score_col, label_col, n_bins, lo, hi)
    w_prev = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    w_after = Window.orderBy("bin").rowsBetween(1, Window.unboundedFollowing)
    cum = binned.select(
        "bin", "pos", "neg",
        F.coalesce(F.sum("neg").over(w_prev), F.lit(0)).alias("negb"),
        F.coalesce(F.sum("pos").over(w_after), F.lit(0)).alias("posa"),
    )
    tot = binned.agg(
        F.sum("pos").cast("long").alias("n1"),
        F.sum("neg").cast("long").alias("n0"),
    )
    both = cum.join(F.broadcast(tot))
    # exact AUC numerator: Σ pos·(negb + neg/2) is a sum of values on
    # the 0.5 grid — exact in doubles at any summation order
    num = F.sum(F.col("pos") * (F.col("negb") + F.col("neg") / 2.0))
    auc_exact = num / F.expr("nullif(CAST(max(n1) AS DOUBLE) * max(n0), 0.0)")
    stats = both.agg(
        F.max("n1").alias("n1"),
        F.max("n0").alias("n0"),
        auc_exact.alias("_auc"),
    )
    withauc = both.join(F.broadcast(stats.select("_auc")))
    v10 = (F.col("negb") + F.col("neg") / 2.0) / F.col("n0").cast("double")
    v01 = (F.col("posa") + F.col("pos") / 2.0) / F.col("n1").cast("double")
    d10 = v10 - F.col("_auc")
    d01 = v01 - F.col("_auc")
    q10 = F.floor(F.col("pos") * d10 * d10 * F.lit(1e12)).cast("long")
    q01 = F.floor(F.col("neg") * d01 * d01 * F.lit(1e12)).cast("long")
    fin = withauc.agg(
        F.max("n1").alias("n1"),
        F.max("n0").alias("n0"),
        F.max("_auc").alias("_auc"),
        F.sum(F.when((F.col("n0") > 0) & (F.col("n1") > 0), q10)).alias("s10q"),
        F.sum(F.when((F.col("n0") > 0) & (F.col("n1") > 0), q01)).alias("s01q"),
    )
    ok = (F.col("n1") > 1) & (F.col("n0") > 1)
    s10 = F.col("s10q").cast("double") / 1e12 / (F.col("n1") - 1)
    s01 = F.col("s01q").cast("double") / 1e12 / (F.col("n0") - 1)
    se = F.sqrt(s10 / F.col("n1") + s01 / F.col("n0"))
    return fin.select(
        F.round("_auc", 6).alias("auc"),
        F.round(F.when(ok, se), 6).alias("se"),
        F.round(F.when(ok, F.col("_auc") - 1.96 * se), 6).alias("ci_lo"),
        F.round(F.when(ok, F.col("_auc") + 1.96 * se), 6).alias("ci_hi"),
        F.col("n1").alias("n_pos"),
        F.col("n0").alias("n_neg"),
    )


def expected_calibration_error(
    scored: DataFrame,
    prob_col: str,
    label_col: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Expected calibration error (ECE) and max calibration gap — the
    one-number summary of the reliability diagram
    (:func:`calibration_bins`): Σ (n_i/n)·|mean_prob_i − pos_rate_i|
    over equal-width probability bins.

    The per-bin means live DIRECTLY on the exact 1e-6 integer grid
    (r9 lattice port — the previous round(avg)·1e6 lift was
    summation-order-dependent before the grid): p micro-quantizes via
    floor(p·1e6 + 0.5) (exact for the 6-dp-rounded probabilities
    callers pass), per-bin means are exact-integer floor-divisions,
    and the weighted gap sum is exact integer arithmetic end to end —
    the final ece is ONE floor-quantized division.

    Returns one row: ``ece, max_ce, n_bins_used, n``.
    """
    y = label_col.cast("int")
    b = F.least(
        F.floor(F.col(prob_col) * n_bins), F.lit(n_bins - 1)
    ).cast("int")
    pqv = F.floor(F.col(prob_col) * 1000000 + F.lit(0.5)).cast("long")
    bins = (
        scored.select(b.alias("bin"), pqv.alias("pq"), y.alias("y"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("pq").alias("_sp"),
            F.sum("y").cast("long").alias("_sy"),
        )
    )
    mq = F.floor(F.col("_sp").cast("double") / F.col("n")).cast("long")
    pq = F.floor(
        F.col("_sy").cast("double") * 1e6 / F.col("n")
    ).cast("long")
    gap = F.abs(mq - pq)
    return bins.agg(
        (
            F.floor(
                F.sum(F.col("n") * gap).cast("double")
                / F.expr("nullif(CAST(sum(n) AS DOUBLE), 0.0)")
            )
            / 1e6
            + 0.0
        ).alias("ece"),
        (F.max(gap).cast("double") / 1e6 + 0.0).alias("max_ce"),
        F.count("*").cast("long").alias("n_bins_used"),
        F.sum("n").cast("long").alias("n"),
    )


def _word_ngrams(ws: Column, max_n: int) -> Column:
    """All 1..max_n word n-grams of a (materialized) words-array column
    as ``array<struct<n:int, g:string>>`` with g = md5 of the
    space-joined gram (32-char portable key — grams never shuffle as
    raw text).  The inner ``sequence(1, size-n+1)`` is guarded by
    ``size >= n`` because a descending Spark sequence would fabricate
    windows on short inputs (the exact_substring_dedup trap)."""
    empty = F.array().cast("array<struct<n:int,g:string>>")
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(max_n)),
            lambda n: F.when(
                F.size(ws) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(ws) - n + 1),
                    lambda i: F.struct(
                        n.cast("int").alias("n"),
                        F.md5(
                            F.concat_ws(" ", F.slice(ws, i, n))
                        ).alias("g"),
                    ),
                ),
            ).otherwise(empty),
        )
    )


def bleu_rouge_corpus(
    pairs: DataFrame,
    cand_col: str = "cand",
    ref_col: str = "ref",
    id_col: str = "id",
    max_n: int = 4,
) -> DataFrame:
    """Corpus-level BLEU (Papineni et al. 2002) + ROUGE-1/2 recall
    (Lin 2004) over (candidate, reference) text pairs — the standard
    generation-quality metrics, as ONE distributed n-gram aggregation.

    Shape: one projection tokenizes both sides (lowercase, whitespace
    collapse), one explode emits every 1..max_n-gram of both sides as
    (pair, n, md5(gram), c, r) counter rows, one hash agg per
    (pair, n, gram) computes the clipped overlap min(count_cand,
    count_ref) — clipping is per-pair, per the definition — and a
    second agg folds everything to ONE row per n, then one final row.
    All counters are exact integers until the finale; modified
    precisions and ROUGE recalls are floor-quantized integer ratios
    (floor(clip*1e6/total) — no float division dice).  The geometric
    mean and brevity penalty use exp/ln on identical exact-integer-
    derived doubles on both engines (the hyperball ln precedent), with
    the single bleu_q6 value floor-quantized at 1e-6.

    BLEU = BP * exp(mean_n ln p_n), BP = min(1, exp(1 - r/c)); the
    corpus-BLEU convention (sum counts over pairs, then one ratio), not
    the sentence-BLEU average.  bleu_q6 is 0.0 when any clip_n = 0
    (standard smoothing-free corpus BLEU) and NULL when the candidate
    side is empty.

    Returns one row: n_pairs, c_len, r_len, clip{1..max_n},
    tot{1..max_n} (candidate n-gram totals), rtot1, rtot2,
    p{1..max_n}_q6, rouge1_q6, rouge2_q6, bp_q6, bleu_q6."""
    if max_n < 2:
        raise ValueError("max_n >= 2 required (ROUGE-2 is reported)")

    def _words(c: Column) -> Column:
        t = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
        return F.when(F.length(t) > 0, F.split(t, " ")).otherwise(
            F.array().cast("array<string>")
        )

    toks = pairs.select(
        F.col(id_col).alias("_id"),
        _words(F.col(cand_col)).alias("cw"),
        _words(F.col(ref_col)).alias("rw"),
    )
    # materialize the gram arrays in their own projection, then explode
    # a single concat — each array expression is referenced exactly
    # once below its build (the CollapseProject bind-once rule)
    gr = toks.select(
        "_id",
        _word_ngrams(F.col("cw"), max_n).alias("cg"),
        _word_ngrams(F.col("rw"), max_n).alias("rg"),
    )
    rows = gr.select(
        "_id",
        F.explode(
            F.concat(
                F.transform(
                    F.col("cg"),
                    lambda s: F.struct(
                        s["n"].alias("n"), s["g"].alias("g"),
                        F.lit(1).alias("c"), F.lit(0).alias("r"),
                    ),
                ),
                F.transform(
                    F.col("rg"),
                    lambda s: F.struct(
                        s["n"].alias("n"), s["g"].alias("g"),
                        F.lit(0).alias("c"), F.lit(1).alias("r"),
                    ),
                ),
            )
        ).alias("e"),
    )
    per_gram = rows.groupBy("_id", "e.n", "e.g").agg(
        F.sum("e.c").alias("cc"), F.sum("e.r").alias("rc")
    )
    per_n = per_gram.groupBy("n").agg(
        F.sum(F.least("cc", "rc")).cast("long").alias("clip"),
        F.sum("cc").cast("long").alias("tc"),
        F.sum("rc").cast("long").alias("tr"),
    )

    def pick(n: int, c: str) -> Column:
        # coalesce: an all-empty corpus leaves per_n with zero rows and
        # sum() NULL — fold to exact-integer 0 so the finale's guards
        # (den > 0, c_len <= 0) stay three-valued-logic-free
        return F.coalesce(
            F.sum(F.when(F.col("n") == n, F.col(c)).otherwise(0)), F.lit(0)
        ).cast("long")

    agg_cols = []
    for n in range(1, max_n + 1):
        agg_cols += [pick(n, "clip").alias(f"clip{n}"), pick(n, "tc").alias(f"tot{n}")]
    agg_cols += [pick(1, "tr").alias("rtot1"), pick(2, "tr").alias("rtot2")]
    flat = per_n.agg(*agg_cols)
    n_pairs = pairs.agg(F.count("*").cast("long").alias("n_pairs"))
    row = n_pairs.crossJoin(flat)

    def q6ratio(num: str, den: str) -> Column:
        return F.when(
            F.col(den) > 0,
            F.floor(F.col(num) * 1000000 / F.col(den)) / 1e6,
        )

    c_len, r_len = F.col("tot1"), F.col("rtot1")
    log_sum = None
    all_pos = F.lit(True)
    for n in range(1, max_n + 1):
        term = F.log(F.col(f"clip{n}").cast("double") / F.col(f"tot{n}"))
        log_sum = term if log_sum is None else log_sum + term
        all_pos = all_pos & (F.col(f"clip{n}") > 0)
    bp = F.when(c_len >= r_len, F.lit(1.0)).otherwise(
        F.exp(F.lit(1.0) - r_len.cast("double") / c_len)
    )
    bleu = F.when(c_len <= 0, F.lit(None).cast("double")).otherwise(
        F.when(
            all_pos,
            F.floor(bp * F.exp(log_sum / max_n) * 1e6) / 1e6,
        ).otherwise(F.lit(0.0))
    )
    out = row.select(
        "n_pairs",
        c_len.alias("c_len"),
        r_len.alias("r_len"),
        *[F.col(f"clip{n}") for n in range(1, max_n + 1)],
        *[F.col(f"tot{n}") for n in range(1, max_n + 1)],
        "rtot1",
        "rtot2",
        *[q6ratio(f"clip{n}", f"tot{n}").alias(f"p{n}_q6") for n in range(1, max_n + 1)],
        q6ratio("clip1", "rtot1").alias("rouge1_q6"),
        q6ratio("clip2", "rtot2").alias("rouge2_q6"),
        F.when(c_len > 0, F.floor(bp * 1e6) / 1e6).alias("bp_q6"),
        bleu.alias("bleu_q6"),
    )
    return out


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test — the standard
    nonparametric two-sample location test (Mann & Whitney 1947): does
    ``value_col`` stochastically dominate between the two groups?

    Distributed shape: NO global sort of the corpus.  One hash agg
    reduces the rows to per-distinct-value counts (n_a, total), then
    :func:`~..suffixes.global_prefix_sum` computes each value's exact
    exclusive rank offset (range partition + per-partition running sums
    + one scalar per partition on the driver), and one final agg folds
    the rank-sum.  Tie-corrected normal approximation.

    All counters are exact integers: with ties, the average rank of a
    value v is before(v) + (tot(v)+1)/2, so 2·R1 = Σ n_a·(2·before +
    tot + 1) stays integral.  The variance/z finale is double math on
    those exact integers (documented int64 bound: n1·n2 and the
    tie-cube sum must fit 2^63 — beyond ~3e9 rows per side switch the
    two products to DECIMAL(38,0)); z_q6 is 1e-6 floor-quantized.

    Returns one row: n1, n2, two_r1 (=2·R1), two_u1 (=2·U1), tie_sum
    (Σ t³−t over tie groups), z_q6 (NULL when either side is empty or
    the variance is 0 — all values tied)."""
    f = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin([group_a, group_b])
    )
    t = f.groupBy(value_col).agg(
        F.sum(
            F.when(F.col(group_col) == group_a, 1).otherwise(0)
        ).cast("long").alias("na"),
        F.count("*").cast("long").alias("tot"),
    )
    from . import suffixes

    c = suffixes.global_prefix_sum(t, [value_col], "tot", "before")
    s = c.agg(
        F.coalesce(
            F.sum(
                F.col("na")
                * (2 * F.col("before") + F.col("tot") + 1)
            ),
            F.lit(0),
        ).cast("long").alias("two_r1"),
        F.coalesce(F.sum("na"), F.lit(0)).cast("long").alias("n1"),
        F.coalesce(F.sum(F.col("tot") - F.col("na")), F.lit(0))
        .cast("long")
        .alias("n2"),
        F.coalesce(
            F.sum(F.col("tot") * F.col("tot") * F.col("tot") - F.col("tot")),
            F.lit(0),
        ).cast("long").alias("tie_sum"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    big_n = n1 + n2
    two_u1 = (F.col("two_r1") - n1 * (n1 + 1)).alias("two_u1")
    var = (
        (n1 * n2).cast("double")
        / 12.0
        * (
            (big_n + 1).cast("double")
            - F.col("tie_sum").cast("double")
            / (big_n * (big_n - 1)).cast("double")
        )
    )
    z = (F.col("two_u1") - n1 * n2).cast("double") / 2.0 / F.sqrt(var)
    return s.select("n1", "n2", "two_r1", two_u1, "tie_sum").select(
        "*",
        F.when(
            (n1 > 0) & (n2 > 0) & (var > 0),
            F.floor(z * 1e6) / 1e6,
        ).alias("z_q6"),
    )


def mutual_information(
    df: DataFrame,
    x_col: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Mutual information (nats) between a categorical column and a
    fixed-width binning of a numeric column, plus both marginal
    entropies and the normalized MI — the standard feature-relevance /
    dependence screen (Cover & Thomas ch. 2).

    Fixed-width bins on [lo, hi] (clamped at the edges) — NO quantile
    estimation, so the contingency table is exact integer counts from
    ONE corpus-wide hash agg into <= |X|*n_bins cells.  Marginals and
    the grand total are hash aggs of that bounded cell table plus
    broadcast joins — no Windows anywhere, global or otherwise.  Every
    per-cell term (n_xy/N)*ln(N*n_xy/(n_x*n_y)) is computed on exact-
    integer-derived doubles and 1e-9 floor-quantized BEFORE the
    exact-integer cell sum (the hyperball convention: quantize each
    summand, sum on the integer grid, divide once at the end), so
    partition order can never move the total; the marginal entropies
    get the same treatment.

    Returns one row: n, n_cells, mi_q (MI, 6dp off the 1e-9 grid),
    h_x_q, h_y_q (marginal entropies), nmi_q (MI/sqrt(Hx*Hy), NULL
    when either entropy is 0)."""
    if n_bins < 1 or not hi > lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    f = df.filter(F.col(value_col).isNotNull() & F.col(x_col).isNotNull())
    binned = f.select(
        F.col(x_col).alias("x"),
        F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(value_col) - lo) / ((hi - lo) / n_bins)),
            ),
        ).cast("int").alias("b"),
    )
    cells = binned.groupBy("x", "b").agg(
        F.count("*").cast("long").alias("nxy")
    )
    mx = cells.groupBy("x").agg(F.sum("nxy").cast("long").alias("nx"))
    mb = cells.groupBy("b").agg(F.sum("nxy").cast("long").alias("nb"))
    tot = cells.agg(
        F.coalesce(F.sum("nxy"), F.lit(0)).cast("long").alias("n")
    )

    def q9(c):
        return F.floor(c * 1e9).cast("long")

    nn = F.col("n").cast("double")
    mi_term = (
        F.col("nxy").cast("double")
        / nn
        * F.log(
            nn
            * F.col("nxy").cast("double")
            / (F.col("nx").cast("double") * F.col("nb").cast("double"))
        )
    )
    mi9 = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.coalesce(F.sum(q9(mi_term)), F.lit(0)).alias("_mi9"),
            F.count("*").cast("long").alias("n_cells"),
        )
    )

    def ent9(marg, cnt):
        p = F.col(cnt).cast("double") / nn
        return (
            marg.crossJoin(F.broadcast(tot))
            .agg(F.coalesce(F.sum(q9(-p * F.log(p))), F.lit(0)))
            .toDF("_e9")
        )

    row = (
        tot.crossJoin(mi9)
        .crossJoin(ent9(mx, "nx").withColumnRenamed("_e9", "_hx9"))
        .crossJoin(ent9(mb, "nb").withColumnRenamed("_e9", "_hy9"))
    )
    mi = F.col("_mi9") / 1e9
    hx = F.col("_hx9") / 1e9
    hy = F.col("_hy9") / 1e9
    return row.select(
        "n",
        "n_cells",
        (F.floor(mi * 1e6) / 1e6).alias("mi_q"),
        (F.floor(hx * 1e6) / 1e6).alias("h_x_q"),
        (F.floor(hy * 1e6) / 1e6).alias("h_y_q"),
        F.when(
            (F.col("_hx9") > 0) & (F.col("_hy9") > 0),
            F.floor(mi / F.sqrt(hx * hy) * 1e6) / 1e6,
        ).alias("nmi_q"),
    )


def spearman_rho(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Spearman rank correlation with exact tie handling (average
    ranks) — the standard monotone-association measure, robust to the
    outliers that break Pearson.

    Distributed shape: NO global sort.  For each variable, one hash
    agg to per-distinct-value counts, :func:`~..suffixes.
    global_prefix_sum` for exact exclusive rank offsets, and one
    broadcast-scale join back onto the rows (the join keys are the
    distinct-value tables, corpus-sized only in the worst all-unique
    case — an equi-join either way).  Doubled centered ranks
    a = 2·rank − (N+1) make Σa exactly 0, so Pearson collapses to
    ρ = Σab / sqrt(Σa²·Σb²) — three exact int64 sums (bound: N³ must
    fit 2^63, i.e. N ≲ 2·10⁶ rows; beyond that promote the three sums
    to DECIMAL(38,0)) and one deterministic double finale, 1e-6
    floor-quantized.

    Returns one row: n, sab, saa, sbb (the exact sums), rho_q6 (NULL
    when n < 2 or either variable is constant)."""
    from . import suffixes

    rows = df.select(
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())

    def two_ranks(col: str) -> DataFrame:
        t = rows.groupBy(col).agg(F.count("*").cast("long").alias("_t"))
        c = suffixes.global_prefix_sum(t, [col], "_t", "_b")
        # 2·avg_rank = 2·before + tot + 1 (integral even under ties)
        return c.select(
            col, (2 * F.col("_b") + F.col("_t") + 1).alias(f"_r{col}")
        )

    n1 = rows.agg(F.count("*").cast("long").alias("_n"))
    ranked = (
        rows.join(two_ranks("_x"), "_x")
        .join(two_ranks("_y"), "_y")
        .crossJoin(F.broadcast(n1))
        .select(
            "_n",
            (F.col("_r_x") - (F.col("_n") + 1)).alias("_a"),
            (F.col("_r_y") - (F.col("_n") + 1)).alias("_b2"),
        )
    )
    s = ranked.agg(
        F.coalesce(F.max("_n"), F.lit(0)).alias("n"),
        F.coalesce(F.sum(F.col("_a") * F.col("_b2")), F.lit(0))
        .cast("long")
        .alias("sab"),
        F.coalesce(F.sum(F.col("_a") * F.col("_a")), F.lit(0))
        .cast("long")
        .alias("saa"),
        F.coalesce(F.sum(F.col("_b2") * F.col("_b2")), F.lit(0))
        .cast("long")
        .alias("sbb"),
    )
    rho = F.col("sab").cast("double") / (
        F.sqrt(F.col("saa").cast("double"))
        * F.sqrt(F.col("sbb").cast("double"))
    )
    return s.select(
        "n",
        "sab",
        "saa",
        "sbb",
        F.when(
            (F.col("n") >= 2) & (F.col("saa") > 0) & (F.col("sbb") > 0),
            F.floor(rho * 1e6) / 1e6,
        ).alias("rho_q6"),
    )


def anova_oneway(
    df: DataFrame,
    value_col: str,
    group_col: str,
    scale: int = 100,
) -> DataFrame:
    """One-way ANOVA F-test across groups — the k-sample mean
    comparison behind every "does this metric differ by segment"
    question.

    Values are floor-quantized onto an integer grid (``scale`` units
    per 1.0) so every sufficient statistic (per-group n, Σx, Σx²) is
    an exact int64 (bound: corpus Σx² must fit 2^63 — coarsen
    ``scale`` at bigger magnitudes).  SSB's per-group s_g²/n_g terms
    are deterministic doubles OF those exact integers, 1e-3
    floor-quantized BEFORE the cross-group sum (the hyperball
    convention at a grid sized for LARGE summands: s_g²/n_g·1e3 must
    fit int64 — group count is unbounded in principle, so the sum
    must be partition-order-proof).  One corpus hash agg + one
    ≤k-row agg; closed-form finale, 1e-6 floors.

    Returns one row: k, n, ssb_q (between-group SS on the grid²
    scale, 3dp), sst_q, f_q6, eta2_q6 (SSB/SST); F/eta NULL when k < 2,
    n ≤ k, or SSW/SST degenerate."""
    g = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
        )
        .select(
            F.col(group_col).alias("_g"),
            F.floor(F.col(value_col) * scale).cast("long").alias("_x"),
        )
        .groupBy("_g")
        .agg(
            F.count("*").cast("long").alias("_n"),
            F.sum("_x").cast("long").alias("_s"),
            F.sum(F.col("_x") * F.col("_x")).cast("long").alias("_ss"),
        )
    )
    # the per-group s²/n summands are LARGE (~grid²·n), so the
    # partition-order-proof grid is 1e-3, not the 1e-9 used for O(1)
    # summands — s²/n·1e3 must fit int64 (documented bound)
    q3 = lambda c: F.floor(c * 1e3).cast("long")  # noqa: E731
    s = g.agg(
        F.count("*").cast("long").alias("k"),
        F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.sum("_s"), F.lit(0)).cast("long").alias("s"),
        F.coalesce(F.sum("_ss"), F.lit(0)).cast("long").alias("ss"),
        F.coalesce(
            F.sum(
                q3(
                    F.col("_s").cast("double")
                    * F.col("_s").cast("double")
                    / F.col("_n").cast("double")
                )
            ),
            F.lit(0),
        ).alias("_gq3"),
    )
    nn = F.col("n").cast("double")
    grand = F.col("s").cast("double") * F.col("s").cast("double") / nn
    ssb = F.col("_gq3") / 1e3 - grand
    sst = F.col("ss").cast("double") - grand
    ssw = F.col("ss").cast("double") - F.col("_gq3") / 1e3
    k = F.col("k")
    fstat = (ssb / (k - 1).cast("double")) / (
        ssw / (F.col("n") - k).cast("double")
    )
    return s.select(
        "k",
        "n",
        (F.floor(ssb * 1e3) / 1e3).alias("ssb_q"),
        (F.floor(sst * 1e3) / 1e3).alias("sst_q"),
        F.when(
            (k >= 2) & (F.col("n") > k) & (ssw > 0),
            F.floor(fstat * 1e6) / 1e6,
        ).alias("f_q6"),
        F.when(sst > 0, F.floor(ssb / sst * 1e6) / 1e6).alias("eta2_q6"),
    )


def chi_square_cramers_v(
    df: DataFrame,
    x_col: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Pearson chi-square test of independence + Cramér's V effect
    size over the same fixed-width contingency table as
    :func:`mutual_information` — the categorical-association
    companion to the information-theoretic screen.

    Per-cell statistic computed scale-free as N·(n_xy·N − n_x·n_b)² /
    (N²·n_x·n_b) = (n_xy·N − n_x·n_b)²/(N·n_x·n_b) on exact-integer-
    derived doubles (int64 bound: n_xy·N — fine to ~3e9 rows), 1e-9
    floor-quantized per cell BEFORE the exact-integer sum; absent
    cells (n_xy = 0) contribute their expected count, folded in
    closed form as N − Σ_present(n_x·n_b)/N so the sparse cell table
    never densifies.  V = sqrt(chi2 / (N·min(r−1, c−1))).

    Returns one row: n, r_levels, c_levels, chi2_q (3dp), v_q6."""
    if n_bins < 1 or not hi > lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    f = df.filter(F.col(value_col).isNotNull() & F.col(x_col).isNotNull())
    binned = f.select(
        F.col(x_col).alias("x"),
        F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(value_col) - lo) / ((hi - lo) / n_bins)),
            ),
        ).cast("int").alias("b"),
    )
    cells = binned.groupBy("x", "b").agg(
        F.count("*").cast("long").alias("nxy")
    )
    mx = cells.groupBy("x").agg(F.sum("nxy").cast("long").alias("nx"))
    mb = cells.groupBy("b").agg(F.sum("nxy").cast("long").alias("nb"))
    tot = cells.agg(
        F.coalesce(F.sum("nxy"), F.lit(0)).cast("long").alias("n")
    )
    q9 = lambda c: F.floor(c * 1e9).cast("long")  # noqa: E731
    nn = F.col("n").cast("double")
    dev = (
        F.col("nxy").cast("double") * nn
        - F.col("nx").cast("double") * F.col("nb").cast("double")
    )
    present = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.coalesce(
                F.sum(
                    q9(
                        dev
                        * dev
                        / (
                            nn
                            * F.col("nx").cast("double")
                            * F.col("nb").cast("double")
                        )
                    )
                ),
                F.lit(0),
            ).alias("_p9"),
            # Σ_present E_xy = Σ nx·nb/N over the observed cells; the
            # absent cells' (0−E)²/E fold to N − this (exact identity)
            F.coalesce(
                F.sum(
                    q9(
                        F.col("nx").cast("double")
                        * F.col("nb").cast("double")
                        / nn
                    )
                ),
                F.lit(0),
            ).alias("_e9"),
        )
    )
    rlev = mx.agg(F.count("*").cast("long").alias("r_levels"))
    clev = mb.agg(F.count("*").cast("long").alias("c_levels"))
    row = (
        tot.crossJoin(present)
        .crossJoin(F.broadcast(rlev))
        .crossJoin(F.broadcast(clev))
    )
    chi2 = F.col("_p9") / 1e9 + (nn - F.col("_e9") / 1e9)
    mind = F.least(F.col("r_levels") - 1, F.col("c_levels") - 1)
    v = F.sqrt(chi2 / (nn * mind.cast("double")))
    return row.select(
        "n",
        "r_levels",
        "c_levels",
        F.when(F.col("n") > 0, F.floor(chi2 * 1e3) / 1e3).alias("chi2_q"),
        F.when(
            (F.col("n") > 0) & (mind >= 1), F.floor(v * 1e6) / 1e6
        ).alias("v_q6"),
    )


def rouge_l_corpus(
    pairs: DataFrame,
    cand_col: str = "cand",
    ref_col: str = "ref",
    id_col: str = "id",
    max_words: int = 256,
    hof_max_cells: int = 48 * 48,
) -> DataFrame:
    """Corpus ROUGE-L (Lin 2004 §3): longest-common-subsequence
    precision/recall/F between candidate and reference word
    sequences — the order-sensitive companion to the n-gram ROUGE
    variants (a shuffled candidate scores high on ROUGE-1 but low
    here).

    TWO exact tiers, routed per pair by DP size (r6: the old flat
    48-word cap silently truncated real eval references):

    - m·n <= ``hof_max_cells``: the ANTI-DIAGONAL wavefront DP inside
      array HOFs — cells on diagonal d = i+j depend only on diagonals
      d−1 and d−2, so each step of the bounded
      ``aggregate(sequence(2, m+n))`` loop builds the whole next
      diagonal with one parallel ``transform``. Zero Python, but the
      lambdas run interpreted, so cost per cell is ~100× a numpy op.
    - larger pairs: the SAME wavefront recurrence vectorized in numpy
      inside an Arrow-batched pandas UDF (one np.where per diagonal).
      Exact integers either way — the union is seam-free, pinned by
      the tests’ cross-tier equality sweep.

    Both sides still truncate at ``max_words`` (cost ceiling
    2·max_words² numpy cells ≈ 128k — microseconds per pair), but the
    cap is now 256 and REPORTED: ``truncated_pairs`` counts pairs
    where either side hit it, so a silent-cap reading is impossible.
    The HOF tier binds its word arrays ONCE as lambda variables via
    the single-element-transform trick (the cdc_chunks CollapseProject
    lesson); out-of-range probes use null-safe ``get``; the
    ``m,n >= 1`` guard dodges Spark’s descending-``sequence`` trap.

    Corpus aggregation is the summary-level convention: exact-integer
    sums of (lcs, m, n), then P = Σlcs/Σm, R = Σlcs/Σn,
    F = 2PR/(P+R), all 1e-6 floor-quantized.

    Returns one row: n_pairs, lcs_sum, c_words, r_words,
    truncated_pairs, rl_p_q6, rl_r_q6, rl_f_q6."""

    def _full_words(c: Column) -> Column:
        t = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
        return F.when(F.length(t) > 0, F.split(t, " ")).otherwise(
            F.array().cast("array<string>")
        )

    def _lcs(p: Column) -> Column:
        cw, rw = p["cw"], p["rw"]
        m, n = F.size(cw), F.size(rw)
        zeros = F.array_repeat(F.lit(0), m + 1)

        def step(acc: Column, d: Column) -> Column:
            new = F.transform(
                F.sequence(F.lit(0), m),
                lambda i: F.when(
                    (i >= 1) & (d - i >= 1) & (d - i <= n),
                    F.when(
                        F.get(cw, i - 1) == F.get(rw, d - i - 1),
                        F.coalesce(F.get(acc["p2"], i - 1), F.lit(0))
                        + 1,
                    ).otherwise(
                        F.greatest(
                            F.coalesce(
                                F.get(acc["p1"], i - 1), F.lit(0)
                            ),
                            F.coalesce(F.get(acc["p1"], i), F.lit(0)),
                        )
                    ),
                ).otherwise(F.lit(0)),
            )
            return F.struct(new.alias("p1"), acc["p1"].alias("p2"))

        return F.when(
            (m >= 1) & (n >= 1),
            F.aggregate(
                F.sequence(F.lit(2), m + n),
                F.struct(zeros.alias("p1"), zeros.alias("p2")),
                step,
                lambda acc: F.coalesce(F.get(acc["p1"], m), F.lit(0)),
            ),
        ).otherwise(F.lit(0))

    @F.pandas_udf("integer")
    def _lcs_np(cands: pd.Series, refs: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for a, b in zip(cands, refs):
            m, n = len(a), len(b)
            if m == 0 or n == 0:
                out.append(0)
                continue
            A = np.asarray(a, dtype=object)
            B = np.asarray(b, dtype=object)
            p1 = np.zeros(m + 1, np.int64)
            p2 = np.zeros(m + 1, np.int64)
            for d in range(2, m + n + 1):
                i_lo, i_hi = max(1, d - n), min(m, d - 1)
                new = np.zeros(m + 1, np.int64)
                if i_lo <= i_hi:
                    i = np.arange(i_lo, i_hi + 1)
                    eq = A[i - 1] == B[d - i - 1]
                    new[i] = np.where(
                        eq, p2[i - 1] + 1, np.maximum(p1[i - 1], p1[i])
                    )
                p2, p1 = p1, new
            out.append(int(p1[m]))
        return pd.Series(out, dtype="int32")

    toks = pairs.select(
        F.col(id_col).alias("_id"),
        _full_words(F.col(cand_col)).alias("cf"),
        _full_words(F.col(ref_col)).alias("rf"),
    ).select(
        "_id",
        F.slice("cf", 1, max_words).alias("cw"),
        F.slice("rf", 1, max_words).alias("rw"),
        (
            (F.size("cf") > max_words) | (F.size("rf") > max_words)
        ).cast("int").alias("trunc"),
    )
    sized = toks.withColumns(
        {"m": F.size("cw"), "n": F.size("rw")}
    )
    small = sized.filter(F.col("m") * F.col("n") <= hof_max_cells).select(
        "_id",
        "m",
        "n",
        "trunc",
        # bind (cw, rw) once as a lambda variable: the DP references
        # them ~m·(m+n) times and must never inline their builders
        F.element_at(
            F.transform(
                F.array(F.struct(F.col("cw"), F.col("rw"))),
                lambda p: _lcs(p),
            ),
            1,
        ).alias("lcs"),
    )
    large = sized.filter(F.col("m") * F.col("n") > hof_max_cells).select(
        "_id",
        "m",
        "n",
        "trunc",
        _lcs_np(F.col("cw"), F.col("rw")).alias("lcs"),
    )
    per = small.unionByName(large)
    s = per.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.coalesce(F.sum("lcs"), F.lit(0)).cast("long").alias("lcs_sum"),
        F.coalesce(F.sum("m"), F.lit(0)).cast("long").alias("c_words"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("r_words"),
        F.coalesce(F.sum("trunc"), F.lit(0)).cast("long").alias(
            "truncated_pairs"
        ),
    )

    def q6(num: Column, den: Column) -> Column:
        return F.when(den > 0, F.floor(num * 1000000 / den) / 1e6)

    lc = F.col("lcs_sum")
    cm, rn = F.col("c_words"), F.col("r_words")
    p = lc.cast("double") / cm
    r = lc.cast("double") / rn
    return s.select(
        "*",
        q6(lc, cm).alias("rl_p_q6"),
        q6(lc, rn).alias("rl_r_q6"),
        F.when(
            (cm > 0) & (rn > 0) & (lc > 0),
            F.floor(2 * p * r / (p + r) * 1e6) / 1e6,
        ).otherwise(
            F.when((cm > 0) & (rn > 0), F.lit(0.0))
        ).alias("rl_f_q6"),
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    arm_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic, exactly: D = max over
    the pooled distinct values of |F1(x) − F2(x)|, computed as the
    INTEGER max of |cum1·n2 − cum2·n1| over the value-ordered CDF walk
    and divided once at the end (1e-6 floor) — the same
    exact-integer-rank design as Mann-Whitney/Spearman (valid while
    n1·n2 < 2^63, i.e. to ~3e9 rows per arm).

    Tighter CROSS-ENGINE bound on the quantized outputs: d_q6 divides
    the exact integer d_num by n1·n2 in DOUBLE, so once d_num exceeds
    2^53 (~9e15 pairs — n1≈n2≈10^8) the long→double conversion itself
    rounds and an oracle that converts in a different order can land
    1 ulp away at the floor grid. d_num stays exact far beyond that;
    only the q6 floors carry the 2^53 caveat.

    Distributed shape: one hash agg collapses the corpus to per-
    distinct-value arm counts (vocabulary-sized), then ONE
    ``global_prefix_sum`` pass (range partition + broadcast offsets —
    the sanctioned global-order primitive, no single-partition window)
    computes both CDFs simultaneously: the two counts pack into a
    single long measure ``c1·(n2+1) + c2`` and the cumulative value
    unpacks with div/mod — the Kendall doubled-count trick applied to
    prefix sums. ``arm_col`` is BOOLEAN (True = sample 1).

    Returns one row: (n1, n2, d_num, d_q6, ks_lambda_q6) where d_num
    is the exact integer max and ks_lambda is the asymptotic
    D·sqrt(n1·n2/(n1+n2)) (sqrt is IEEE-correctly-rounded — identical
    in any engine, unlike ln/exp). NULL D when either arm is empty."""
    from .suffixes import global_prefix_sum

    arm = F.col(arm_col)
    per = df.groupBy(F.col(value_col).alias("v")).agg(
        F.sum(arm.cast("int")).cast("long").alias("c1"),
        F.sum((~arm).cast("int")).cast("long").alias("c2"),
    )
    tot = per.agg(
        F.coalesce(F.sum("c1"), F.lit(0)).cast("long").alias("n1"),
        F.coalesce(F.sum("c2"), F.lit(0)).cast("long").alias("n2"),
    ).first()
    n1, n2 = tot["n1"], tot["n2"]
    spark = df.sparkSession
    if n1 == 0 or n2 == 0:
        return spark.createDataFrame(
            [(n1, n2, None, None, None)],
            "n1 long, n2 long, d_num long, d_q6 double, ks_lambda_q6 double",
        )
    packed = per.withColumn("m", F.col("c1") * (n2 + 1) + F.col("c2"))
    walked = global_prefix_sum(packed, ["v"], "m", out_col="before")
    # exact integer unpack — long `/` would go through double
    cum = walked.selectExpr(
        f"(before + m) div {n2 + 1} AS cum1",
        f"(before + m) % {n2 + 1} AS cum2",
    )
    d_num = cum.agg(
        F.max(F.abs(F.col("cum1") * n2 - F.col("cum2") * n1)).alias("d")
    ).first()["d"]
    d = d_num / (n1 * n2)
    lam = d * ((n1 * n2 / (n1 + n2)) ** 0.5)
    import math

    return spark.createDataFrame(
        [
            (
                n1,
                n2,
                d_num,
                math.floor(d * 1e6) / 1e6,
                math.floor(lam * 1e6) / 1e6,
            )
        ],
        "n1 long, n2 long, d_num long, d_q6 double, ks_lambda_q6 double",
    )


def pass_at_k(
    trials: DataFrame,
    group_col: str,
    success_col: str,
    ks: tuple[int, ...] = (1, 3, 5),
) -> DataFrame:
    """Unbiased pass@k (Chen et al. 2021 "Evaluating LLMs Trained on
    Code", public): per problem with n trials and c successes,
    pass@k = 1 − C(n−c, k)/C(n, k) — the probability that a uniform
    sample of k trials contains at least one success — averaged over
    problems with n ≥ k.

    Exactness: the binomial ratio collapses to the falling-factorial
    product Π_{i=0..k-1} (n−c−i)/(n−i); numerator and denominator are
    computed as exact DECIMAL(38,0) integer products (n^k < 10^38 —
    far past any real trial count), one division at the end, 1e-6
    floor-quantized into integer micro-units so the cross-problem
    mean is an exact integer sum (no float accumulation order to
    diverge across engines).

    One hash agg to (group, n, c) — corpus-scale safe — then a
    k-term generated projection. Returns one row per k:
    (k, n_problems, pass_rate_q6)."""
    per = trials.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(success_col).cast("int")).cast("long").alias("c"),
    )
    prods = []
    for k in ks:
        num = F.lit(1).cast("decimal(38,0)")
        den = F.lit(1).cast("decimal(38,0)")
        for i in range(k):
            num = num * F.greatest(
                (F.col("n") - F.col("c") - i).cast("decimal(38,0)"),
                F.lit(0).cast("decimal(38,0)"),
            )
            den = den * (F.col("n") - i).cast("decimal(38,0)")
        prods += [num.alias(f"_num{k}"), den.alias(f"_den{k}")]
    # micro-units: floor((1 − num/den)·1e6) = 1e6 − ceil(num·1e6/den),
    # with the ceil as EXACT integer division (num·1e6 + den − 1)
    # div den — decimal `/` rounds to the result scale (HALF_UP),
    # so it can never be trusted next to a floor/ceil; `div`'s
    # BIGINT quotient is exact and ≤ 1e6 here. num·1e6 stays inside
    # DECIMAL(38,0) for n^k < 1e32 — any real trial count. The n ≥ k
    # CASE guards den > 0 (CaseWhen short-circuits under ANSI).
    # Everything folds into ONE aggregate over the per-problem table —
    # conditional sums per k, not one re-aggregation per k — then
    # unpivots with stack(): exactly two exchanges end to end.
    p2 = per.select("n", *prods).selectExpr(
        "n",
        *[
            f"CASE WHEN n >= {k} THEN CAST(1000000 AS BIGINT)"
            f" - ((_num{k} * 1000000 + _den{k} - 1) div _den{k})"
            f" END AS _micro{k}"
            for k in ks
        ],
    )
    one = p2.agg(
        *[
            a
            for k in ks
            for a in (
                F.count(F.when(F.col("n") >= k, 1)).cast("long").alias(
                    f"_np{k}"
                ),
                F.coalesce(F.sum(f"_micro{k}"), F.lit(0)).alias(f"_sm{k}"),
            )
        ]
    )
    stack_args = ", ".join(f"{k}, _np{k}, _sm{k}" for k in ks)
    res = one.selectExpr(
        f"stack({len(ks)}, {stack_args})"
        " AS (k, n_problems, _sum_micro)"
    )
    # mean in micro-units via exact integer division — no float sum or
    # float division anywhere in the estimator
    return res.select(
        F.col("k").cast("int").alias("k"),
        "n_problems",
        F.when(
            F.col("n_problems") > 0,
            F.expr("_sum_micro div n_problems") / 1e6,
        ).otherwise(F.lit(None).cast("double")).alias("pass_rate_q6"),
    )


def cuped_adjusted(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    split_ts: int,
    arm_expr: Column,
) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al. WSDM 2013) —
    the industry-standard experiment analysis: adjust each arm's
    post-period mean by θ·(pre-period covariate − pool mean), with θ
    = cov(pre, post)/var(pre) estimated on the pooled users, cutting
    metric variance by the pre/post correlation ρ².

    Distributed shape: ONE hash agg folds the corpus to per-user
    (pre, post) integer totals (values floor-quantized to the 1.0
    grid — per-user sums get SQUARED in the moment products, so the
    grid is sized for Σy² to fit int64; users with no pre-period
    activity carry x = 0, documented choice), a second agg folds the
    users to exact int64 moment sums with the n·Σ cross products in
    DECIMAL(38,0) (the autocorr precedent), and the per-arm finale is
    closed-form doubles of those exact integers, 1e-6 floor-quantized.

    Returns one row per arm: arm, n_users, y_mean_q6, y_adj_q6,
    theta_q6, rho2_q6 (the variance-reduction fraction; NULL when
    var(pre) or var(post) is 0)."""
    users = cuped_user_totals(
        events, user_col, ts_col, value_col, split_ts, arm_expr
    )
    return cuped_finale(users)


def cuped_user_totals(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    split_ts: int,
    arm_expr: Column,
) -> DataFrame:
    """Per-user (arm, pre, post) integer totals — the CUPED state
    relation.  Per-row floors before associative sums, so it runs
    identically as a batch agg or a streaming complete-mode agg (the
    T-twin shared-finale contract; state is user-cardinality, the
    t4_stateful_totals shape)."""
    base = events.filter(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        arm_expr.alias("_arm"),
        F.when(F.col(ts_col) < split_ts, F.floor(F.col(value_col)))
        .otherwise(0)
        .cast("long")
        .alias("_xv"),
        F.when(F.col(ts_col) >= split_ts, F.floor(F.col(value_col)))
        .otherwise(0)
        .cast("long")
        .alias("_yv"),
    )
    return base.groupBy("_u", "_arm").agg(
        F.sum("_xv").cast("long").alias("x"),
        F.sum("_yv").cast("long").alias("y"),
    )


def cuped_finale(users: DataFrame) -> DataFrame:
    """Pooled-θ per-arm CUPED readout from the (user, arm, x, y)
    totals relation — shared by the batch operator and the T25
    streaming twin."""
    pool = users.agg(
        F.count("*").cast("long").alias("n"),
        F.coalesce(F.sum("x"), F.lit(0)).cast("long").alias("sx"),
        F.coalesce(F.sum("y"), F.lit(0)).cast("long").alias("sy"),
        F.coalesce(F.sum(F.col("x") * F.col("x")), F.lit(0))
        .cast("long")
        .alias("sxx"),
        F.coalesce(F.sum(F.col("y") * F.col("y")), F.lit(0))
        .cast("long")
        .alias("syy"),
        F.coalesce(F.sum(F.col("x") * F.col("y")), F.lit(0))
        .cast("long")
        .alias("sxy"),
    )
    dec = "decimal(38,0)"

    def d(c):
        return c.cast(dec)

    n = F.col("n")
    vx = (d(n) * d(F.col("sxx")) - d(F.col("sx")) * d(F.col("sx"))).cast(
        "double"
    )
    vy = (d(n) * d(F.col("syy")) - d(F.col("sy")) * d(F.col("sy"))).cast(
        "double"
    )
    cv = (d(n) * d(F.col("sxy")) - d(F.col("sx")) * d(F.col("sy"))).cast(
        "double"
    )
    theta = cv / vx
    rho2 = cv * cv / (vx * vy)
    xbar = F.col("sx").cast("double") / F.col("n")
    arms = users.groupBy("_arm").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("ax"),
        F.sum("y").cast("long").alias("ay"),
    )
    row = arms.crossJoin(F.broadcast(pool))
    ymean = F.col("ay").cast("double") / F.col("n_users")
    xmean = F.col("ax").cast("double") / F.col("n_users")
    ok = (F.col("n") >= 2) & (vx > 0)
    adj = ymean - theta * (xmean - xbar)
    return row.select(
        F.col("_arm").alias("arm"),
        "n_users",
        (F.floor(ymean * 1e6) / 1e6).alias("y_mean_q6"),
        F.when(ok, F.floor(adj * 1e6) / 1e6).alias("y_adj_q6"),
        F.when(ok, F.floor(theta * 1e6) / 1e6).alias("theta_q6"),
        F.when(ok & (vy > 0), F.floor(rho2 * 1e6) / 1e6).alias(
            "rho2_q6"
        ),
    ).orderBy("arm")


def jackknife_ratio_se(
    events: DataFrame,
    bucket_expr: Column,
    num_expr: Column,
    den_expr: Column,
    n_buckets: int = 32,
) -> DataFrame:
    """Leave-one-bucket-out (delete-1 grouped jackknife) standard
    error for a RATIO metric — the standard error machinery for
    cluster-correlated experiment metrics like revenue-per-view,
    where the delta method's independence assumption fails (Efron
    1981; every large A/B platform ships this).

    Distributed shape: one corpus hash agg folds everything to
    ``n_buckets`` exact integer (num, den) partial sums (buckets are
    deterministic user shards, so replicates respect the clustering),
    then the ≤n_buckets-row finale computes each leave-one-out ratio
    (N−n_b)/(D−d_b) as a deterministic double, 1e-9 floor-quantized
    BEFORE the cross-bucket moment sums (partition-order-proof), and
    SE = sqrt((B−1)/B · Σ(LOO_b − mean)²) in closed form from those
    exact grid integers.  NULL when any leave-one-out denominator is
    ≤ 0 (the replicate set is undefined).

    Returns one row: b (buckets present), num, den, r_q6, se_q6."""
    per = jackknife_bucket_sums(
        events, bucket_expr, num_expr, den_expr, n_buckets
    )
    return jackknife_finale(per)


def jackknife_bucket_sums(
    events: DataFrame,
    bucket_expr: Column,
    num_expr: Column,
    den_expr: Column,
    n_buckets: int = 32,
) -> DataFrame:
    """(bk, nb, db) per-shard partial sums — the jackknife state
    relation.  Associative integer sums, so it runs identically as a
    batch agg or a streaming complete-mode agg (the T-twin
    shared-finale contract; state is ≤ n_buckets rows)."""
    return events.groupBy(
        (bucket_expr % n_buckets).cast("int").alias("bk")
    ).agg(
        F.coalesce(F.sum(num_expr), F.lit(0)).cast("long").alias("nb"),
        F.coalesce(F.sum(den_expr), F.lit(0)).cast("long").alias("db"),
    )


def jackknife_finale(per: DataFrame) -> DataFrame:
    """Delete-1 LOO ratio SE from the (bk, nb, db) shard table —
    shared by the batch operator and the T26 streaming twin."""
    tot = per.agg(
        F.count("*").cast("long").alias("b"),
        F.coalesce(F.sum("nb"), F.lit(0)).cast("long").alias("num"),
        F.coalesce(F.sum("db"), F.lit(0)).cast("long").alias("den"),
    )
    q9 = lambda c: F.floor(c * 1e9).cast("long")  # noqa: E731
    j = per.crossJoin(F.broadcast(tot))
    # ANSI raises on /0 even for doubles: undefined replicates are
    # NULL (skipped by the sums) and counted by _bad, which NULLs se
    loo = F.when(
        F.col("den") - F.col("db") > 0,
        (F.col("num") - F.col("nb")).cast("double")
        / (F.col("den") - F.col("db")).cast("double"),
    )
    moms = j.agg(
        F.coalesce(F.sum(q9(loo)), F.lit(0)).alias("_s1"),
        F.coalesce(F.sum(q9(loo * loo)), F.lit(0)).alias("_s2"),
        F.coalesce(
            F.sum(
                F.when(F.col("den") - F.col("db") <= 0, 1).otherwise(0)
            ),
            F.lit(0),
        ).cast("long").alias("_bad"),
    )
    row = tot.crossJoin(moms)
    b = F.col("b").cast("double")
    m1 = F.col("_s1") / 1e9 / b
    # greatest(·, 0): the two grids can leave an O(1e-9) negative
    # residue when every replicate is identical — that IS se = 0
    var = F.greatest(
        (b - 1) / b * (F.col("_s2") / 1e9 - b * m1 * m1), F.lit(0.0)
    )
    r = F.col("num").cast("double") / F.col("den").cast("double")
    return row.select(
        "b",
        "num",
        "den",
        F.when(F.col("den") > 0, F.floor(r * 1e6) / 1e6).alias("r_q6"),
        F.when(
            (F.col("b") >= 2)
            & (F.col("_bad") == 0)
            & (F.col("den") > 0),
            F.floor(F.sqrt(var) * 1e6) / 1e6,
        ).alias("se_q6"),
    )


def kendall_tau_b(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Kendall's tau-b rank correlation between two ORDINAL (low-
    cardinality integer) columns — the tie-corrected concordance
    measure for binned/graded data (Kendall 1945; the standard
    ordinal-association companion to Spearman).

    Contingency formulation: one corpus hash agg into the (x, y)
    cell table (caller contract: both columns are bounded ordinals —
    bins, grades, hours — so cells ≤ |X|·|Y|), then concordant /
    discordant pair counts via ONE bounded cell self-join (cells²
    pairs, corpus-independent).  Every count is an exact int64
    (C, D ≤ n²/2 — fine to ~4e9 rows); the denominator's two factors
    go through sqrt separately so nothing exceeds int64.  tau_b =
    (C − D)/(sqrt(n0−n1)·sqrt(n0−n2)), 1e-6 floor-quantized; NULL
    when either variable is constant.

    Returns one row: n, n_cells, conc, disc, tie_x_pairs2,
    tie_y_pairs2 (doubled tie-pair counts — exact ints), tau_b_q6."""
    cells = kendall_cells(df, x_col, y_col)
    return kendall_finale(cells)


def kendall_cells(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """(x, y, c) ordinal contingency cells — the tau-b state relation.
    Associative counts bounded by |X|·|Y| rows, so it runs identically
    as a batch agg or a streaming complete-mode agg (the T-twin
    shared-finale contract)."""
    f = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    return f.groupBy(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).agg(F.count("*").cast("long").alias("c"))


def kendall_finale(cells: DataFrame) -> DataFrame:
    """tau-b from the (x, y, c) cell table — shared by the batch
    operator and the T27 streaming twin."""
    a = cells.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"),
        F.col("c").alias("ac"),
    )
    b = cells.select(
        F.col("x").alias("bx"), F.col("y").alias("by"),
        F.col("c").alias("bc"),
    )
    pairs = a.join(F.broadcast(b), F.col("bx") > F.col("ax"))
    cd = pairs.agg(
        F.coalesce(
            F.sum(
                F.when(F.col("by") > F.col("ay"),
                       F.col("ac") * F.col("bc")).otherwise(0)
            ),
            F.lit(0),
        ).cast("long").alias("conc"),
        F.coalesce(
            F.sum(
                F.when(F.col("by") < F.col("ay"),
                       F.col("ac") * F.col("bc")).otherwise(0)
            ),
            F.lit(0),
        ).cast("long").alias("disc"),
    )
    mx = cells.groupBy("x").agg(F.sum("c").cast("long").alias("tx"))
    my = cells.groupBy("y").agg(F.sum("c").cast("long").alias("ty"))
    t1 = mx.agg(
        F.coalesce(F.sum(F.col("tx") * (F.col("tx") - 1)), F.lit(0))
        .cast("long")
        .alias("tie_x_pairs2")
    )
    t2 = my.agg(
        F.coalesce(F.sum(F.col("ty") * (F.col("ty") - 1)), F.lit(0))
        .cast("long")
        .alias("tie_y_pairs2")
    )
    tot = cells.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n"),
        F.count("*").cast("long").alias("n_cells"),
    )
    row = tot.crossJoin(cd).crossJoin(t1).crossJoin(t2)
    n = F.col("n")
    n0x2 = n * (n - 1)  # doubled pair counts stay integral
    dx = (n0x2 - F.col("tie_x_pairs2")).cast("double")
    dy = (n0x2 - F.col("tie_y_pairs2")).cast("double")
    tau = (
        2.0
        * (F.col("conc") - F.col("disc")).cast("double")
        / (F.sqrt(dx) * F.sqrt(dy))
    )
    return row.select(
        "n",
        "n_cells",
        "conc",
        "disc",
        "tie_x_pairs2",
        "tie_y_pairs2",
        F.when(
            (dx > 0) & (dy > 0), F.floor(tau * 1e6) / 1e6
        ).alias("tau_b_q6"),
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    category_col: str,
) -> DataFrame:
    """Fleiss' kappa multi-rater agreement (Fleiss 1971, public) over
    an (item, category) rating table — the standard chance-corrected
    agreement statistic for grading LLM-judge ensembles or crowd
    labels before trusting them as training signal. Generalized to
    variable raters-per-item (items need n_i >= 2; singletons carry
    no agreement information and are dropped, reported in n_dropped).

    Exactness: per-item agreement P_i = (S_i - n_i)/(n_i(n_i-1)) with
    S_i = sum_c n_ic^2 is quantized to an exact pico-unit integer via
    DECIMAL(38,0) products + `div` (quotient <= 1e12, BIGINT-safe; the
    pass_at_k convention — decimal `/` rounds half-up and is never
    trusted next to a floor). The cross-item mean is then an exact
    integer sum (DECIMAL(38,0) — no float accumulation order to
    diverge across engines, the eval_map_ann design), divided once.
    P_e = sum_c p_c^2 quantizes each category's square on the same
    pico grid (categories are a bounded domain). kappa's final
    division is double-over-exact-ints (< 2^53), 1e-6 floored.

    Distributed shape: ONE hash agg to the (item, category) cell
    table, one reagg per item, one bounded category rollup — no
    windows, no corpus-scale float math. Returns one row:
    (n_items, n_dropped, n_ratings, p_bar_q12, p_e_q12, kappa_q6);
    kappa is NULL when P_e == 1 (single category — chance agreement
    saturates) or no item has 2+ ratings."""
    cells = df.groupBy(
        F.col(item_col).alias("i"), F.col(category_col).alias("cat")
    ).agg(F.count(F.lit(1)).cast("long").alias("nic"))
    per_item = cells.groupBy("i").agg(
        F.sum("nic").cast("long").alias("ni"),
        F.sum(
            (F.col("nic") * F.lit(1).cast("decimal(38,0)")) * F.col("nic")
        ).alias("si"),
    )
    kept = per_item.filter(F.col("ni") >= 2)
    # exact pico-quantized P_i: ((S_i - n_i) * 1e12) div (n_i (n_i-1))
    pi = kept.select(
        "ni",
        F.expr(
            "((si - ni) * CAST(1000000000000 AS DECIMAL(38,0)))"
            " div (CAST(ni AS DECIMAL(38,0)) * (ni - 1))"
        ).alias("pi_pico"),
    )
    tot_items = pi.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.coalesce(
            F.sum(F.col("pi_pico").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("pi_sum"),
        F.coalesce(F.sum("ni"), F.lit(0)).cast("long").alias("n_ratings"),
    )
    dropped = per_item.filter(F.col("ni") < 2).agg(
        F.count(F.lit(1)).cast("long").alias("n_dropped")
    )
    # category marginals over the KEPT items only (the rated universe)
    cat_tot = (
        cells.join(kept.select("i"), "i")
        .groupBy("cat")
        .agg(F.sum("nic").cast("long").alias("cc"))
    )
    pe = cat_tot.crossJoin(
        cat_tot.agg(F.sum("cc").cast("long").alias("t"))
    ).select(
        F.expr(
            "(CAST(cc AS DECIMAL(38,0)) * cc"
            " * CAST(1000000000000 AS DECIMAL(38,0)))"
            " div (CAST(t AS DECIMAL(38,0)) * t)"
        ).alias("pe_term")
    ).agg(
        F.coalesce(F.sum(F.col("pe_term").cast("decimal(38,0)")), F.lit(0))
        .cast("long")
        .alias("pe_pico")
    )
    row = tot_items.crossJoin(dropped).crossJoin(pe)
    pbar = F.when(
        F.col("n_items") > 0,
        F.expr("pi_sum div n_items"),
    )  # exact pico BIGINT
    den = F.lit(10**12) - F.col("pe_pico")
    kappa = F.when(
        (F.col("n_items") > 0) & (den > 0),
        F.floor(
            (pbar - F.col("pe_pico")).cast("double")
            / den.cast("double")
            * 1e6
        )
        / 1e6,
    )
    return row.select(
        "n_items",
        "n_dropped",
        "n_ratings",
        F.when(F.col("n_items") > 0, pbar / F.lit(1e12)).alias("p_bar_q12"),
        F.when(F.col("n_items") > 0, F.col("pe_pico") / F.lit(1e12)).alias(
            "p_e_q12"
        ),
        kappa.alias("kappa_q6"),
    )


def brier_decomposition(
    df: DataFrame,
    pred_micro_col: str,
    label_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Murphy decomposition of the Brier score (Murphy 1973, public):
    BRIER = RELIABILITY - RESOLUTION + UNCERTAINTY over ``n_bins``
    equal-width forecast bins — the standard diagnostic for whether a
    learned quality/safety scorer is miscalibrated (high REL) or just
    uninformative (low RES) before its threshold gates a corpus.

    Contract: ``pred_micro_col`` is the forecast ALREADY quantized to
    integer micro-units in [0, 1e6] (callers floor(p*1e6) once at the
    boundary; keeping the grid in the data means every mean below is
    an exact integer sum — no float accumulation order to diverge
    across engines). ``label_col`` is boolean/0-1.

    Exactness: bin means lift to the pico grid via DECIMAL(38,0)
    products + `div` (quotients <= 1e12), squared deviations stay in
    DECIMAL(38,0) (<= n * 1e24 << 1e38), and each component divides
    once by (N * 1e12) via the subtract-modulo exact division
    ``(a - a % b) / b`` — decimal `/` is exact when the remainder is
    zero, so no half-up rounding can leak (Spark `div` returns BIGINT
    and res_sum div N could overflow it; the modulo form keeps the
    quotient decimal). Finals are double-over-<2^53-ints, 1e-6
    floored.

    One hash agg to <= n_bins cells, one bounded rollup. Returns one
    row: (n, n_bins, brier_q6, reliability_q6, resolution_q6,
    uncertainty_q6)."""
    return brier_finale(
        brier_cells(df, pred_micro_col, label_col, n_bins), n_bins
    )


def brier_cells(
    df: DataFrame,
    pred_micro_col: str,
    label_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """The <= n_bins associative state relation behind
    :func:`brier_decomposition` — per-bin (nk, sp, sy, ssq) integer
    sums, all partial-combinable, so it doubles as a streaming
    complete-mode aggregate (T32's live calibration monitor)."""
    b = F.lit(int(n_bins)).cast("long")
    p = F.col(pred_micro_col).cast("long")
    y = F.col(label_col).cast("int").cast("long")
    binned = df.select(
        F.least(F.expr(f"({pred_micro_col} * {int(n_bins)}) div 1000000"),
                b - 1).alias("bin"),
        p.alias("p_micro"),
        y.alias("y"),
        ((p - y * 1000000) * (p - y * 1000000)).cast("decimal(38,0)").alias(
            "sq"
        ),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("nk"),
        F.sum("p_micro").cast("decimal(38,0)").alias("sp"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("sq").alias("ssq"),
    )


def brier_finale(cells: DataFrame, n_bins: int = 20) -> DataFrame:
    """Murphy-decomposition finale over a (bin, nk, sp, sy, ssq) cell
    relation — shared verbatim by the batch operator and the T32
    streaming snapshot (the cells/finale recipe)."""
    pico_d = "CAST(1000000000000 AS DECIMAL(38,0))"
    lifted = cells.select(
        "nk",
        "sy",
        "ssq",
        F.expr(f"(sp * 1000000) div nk").alias("pbar12"),
        F.expr(
            f"(CAST(sy AS DECIMAL(38,0)) * {pico_d}) div nk"
        ).alias("ybar12"),
    )
    tot = lifted.agg(
        F.coalesce(F.sum("nk"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.sum("sy"), F.lit(0)).cast("long").alias("y_tot"),
        F.coalesce(F.sum("ssq"), F.lit(0).cast("decimal(38,0)")).alias(
            "ssq_tot"
        ),
    )
    with_g = lifted.crossJoin(tot.filter(F.col("n") > 0)).select(
        "nk",
        "pbar12",
        "ybar12",
        "n",
        "y_tot",
        "ssq_tot",
        F.expr(
            f"(CAST(y_tot AS DECIMAL(38,0)) * {pico_d}) div n"
        ).alias("gbar12"),
    )
    dev = with_g.select(
        "n",
        "y_tot",
        "ssq_tot",
        "gbar12",
        (
            F.col("nk")
            * (F.col("pbar12") - F.col("ybar12")).cast("decimal(38,0)")
            * (F.col("pbar12") - F.col("ybar12"))
        ).alias("rel_term"),
        (
            F.col("nk")
            * (F.col("ybar12") - F.col("gbar12")).cast("decimal(38,0)")
            * (F.col("ybar12") - F.col("gbar12"))
        ).alias("res_term"),
    )
    agg = dev.groupBy("n", "y_tot", "ssq_tot", "gbar12").agg(
        F.sum("rel_term").alias("rel_sum"),
        F.sum("res_term").alias("res_sum"),
    )
    # exact pico quotients via subtract-modulo division (stays decimal)
    den = f"(CAST(n AS DECIMAL(38,0)) * {pico_d})"
    out = agg.selectExpr(
        "n",
        "y_tot",
        "gbar12",
        f"CAST((rel_sum - rel_sum % {den}) / {den} AS BIGINT) AS rel12",
        f"CAST((res_sum - res_sum % {den}) / {den} AS BIGINT) AS res12",
        "(CAST(ssq_tot AS DECIMAL(38,0)) div n) AS brier12",
        f"(CAST(gbar12 AS DECIMAL(38,0)) * (1000000000000 - gbar12))"
        f" div {pico_d} AS unc12",
    )
    q6 = lambda c: (F.expr(f"{c} div 1000000")).cast("double") / 1e6  # noqa: E731
    return out.select(
        "n",
        F.lit(int(n_bins)).alias("n_bins"),
        q6("brier12").alias("brier_q6"),
        q6("rel12").alias("reliability_q6"),
        q6("res12").alias("resolution_q6"),
        q6("unc12").alias("uncertainty_q6"),
    )


def fdr_bh(
    df: DataFrame,
    p_col: str,
    key_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini–Hochberg FDR control (Benjamini & Hochberg 1995,
    public) over a (test key, p-value) relation — the standard
    correction when a pipeline screens MANY segments/metrics at once
    (per-domain A/B readouts, per-filter ablations) and raw p < alpha
    would drown in false discoveries.

    Procedure: rank p ascending (ties broken by key), find the largest
    k with p_(k) <= k*alpha/m, reject ranks 1..k. The comparison is
    evaluated as ``p * m <= rank * alpha`` — two single IEEE products
    on identical operands in either engine, no accumulation, so the
    reject set is bit-deterministic given deterministic p's.

    Ranks come from ONE :func:`~..suffixes.global_row_number` over
    (p, key) — range partition + offsets, no single-partition window;
    k* is one agg broadcast back. Returns the full per-key relation
    (key, p, rank, rejected) — output is test-count-sized, not
    corpus-sized."""
    from .suffixes import global_row_number

    base = df.select(
        F.col(key_col).alias("key"), F.col(p_col).cast("double").alias("p")
    ).filter(F.col("p").isNotNull())
    m = base.count()
    if m == 0:
        # plan-derived empty frame so the key column keeps the
        # caller's type (a hardcoded string schema would diverge from
        # the non-empty path on long/int keys)
        return base.select(
            "key",
            "p",
            F.lit(None).cast("long").alias("rank"),
            F.lit(None).cast("boolean").alias("rejected"),
        ).limit(0)
    rn = global_row_number(base, ["p", "key"], "rank")
    kstar_row = (
        rn.filter(F.col("p") * m <= F.col("rank") * alpha)
        .agg(F.max("rank").alias("k"))
        .first()
    )
    kstar = kstar_row["k"] or 0
    return rn.select(
        "key", "p", "rank", (F.col("rank") <= kstar).alias("rejected")
    )


def lift_table(
    df: DataFrame,
    pred_micro_col: str,
    label_col: str,
    id_col: str,
    n_tiles: int = 10,
) -> DataFrame:
    """Decile lift & cumulative-gains table — the classic model-triage
    readout (does the top-scored 10% actually concentrate the
    positives?) for a quality/conversion scorer before its threshold
    gates anything. ``pred_micro_col`` follows the micro-grid contract
    (see :func:`brier_decomposition`); ``id_col`` breaks score ties so
    tile assignment is total-order deterministic.

    Tiles come from ONE :func:`~..suffixes.global_ntile` over
    (-score, id) — range partition + offsets, exact ntile fill, no
    single-partition window. Per-tile stats are integer sums; lift and
    cumulative gain quantize once via DECIMAL(38,0) `div`:
    lift = (y_d*N*1e6) div (n_d*Y), gain = (cum_y*1e6) div Y. The
    cumulative prefix runs as a <= n_tiles^2-row conditional self-join
    (tiny by construction), NOT a window. NULL lift when the corpus
    has no positives. Returns one row per non-empty tile:
    (tile, n, responders, lift_q6, cum_gain_q6)."""
    from .suffixes import global_ntile

    base = df.select(
        F.col(id_col).alias("_id"),
        (-F.col(pred_micro_col).cast("long")).alias("_negp"),
        F.col(label_col).cast("int").cast("long").alias("_y"),
    )
    nt = global_ntile(base, ["_negp", "_id"], n_tiles, out_col="tile")
    per = nt.groupBy("tile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_y").cast("long").alias("responders"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("_nn"),
        F.sum("responders").cast("long").alias("_yy"),
    )
    cum = (
        per.selectExpr("tile AS _t1")
        .join(per.selectExpr("tile AS _t2", "responders AS _r2"),
              F.col("_t2") <= F.col("_t1"))
        .groupBy("_t1")
        .agg(F.sum("_r2").cast("long").alias("_cum_y"))
    )
    return (
        per.join(cum, per["tile"] == cum["_t1"])
        .crossJoin(tot)
        .selectExpr(
            "tile",
            "n",
            "responders",
            "CASE WHEN _yy > 0 THEN"
            " ((CAST(responders AS DECIMAL(38,0)) * _nn * 1000000)"
            "  div (CAST(n AS DECIMAL(38,0)) * _yy)) / 1e6 END AS lift_q6",
            "CASE WHEN _yy > 0 THEN"
            " ((CAST(_cum_y AS DECIMAL(38,0)) * 1000000) div _yy) / 1e6"
            " END AS cum_gain_q6",
        )
    )


def mcnemar_test(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """McNemar's paired test (McNemar 1947, public) for two binary
    classifiers scored on the SAME items — the standard way to decide
    whether filter B actually beats filter A on a shared eval set, as
    opposed to two unpaired proportions that ignore the pairing.

    Input: one row per item with boolean columns ``a_col``/``b_col``
    (NULL treated as False — an abstaining classifier predicts
    negative).  Only the discordant counts matter: b = (A and not B),
    c = (not A and B).

    Exactness: the statistic (b-c)^2/(b+c) and its continuity-corrected
    variant ((|b-c|-1)^2/(b+c)) are computed as exact micro-grid
    integer floor-divisions over DECIMAL(38,0) products (counts square
    past int64 at corpus scale), so both engines agree bit-for-bit;
    the 5%-level decision compares exact micro integers against the
    literal chi2(1df, 0.95) = 3.841459 micro grid — no float anywhere.

    Distributed shape: ONE partial-combinable aggregation over the
    item table.  Returns one row: (n_items, b_count, c_count,
    n_discordant, chi2_q6, chi2_cc_q6, reject_05)."""
    a = F.coalesce(F.col(a_col).cast("boolean"), F.lit(False))
    b = F.coalesce(F.col(b_col).cast("boolean"), F.lit(False))
    cells = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        # coalesce: an EMPTY frame sums to NULL in Spark but the oracle
        # coalesces to 0 — keep the engines aligned
        F.coalesce(F.sum((a & ~b).cast("long")), F.lit(0))
        .cast("long")
        .alias("b_count"),
        F.coalesce(F.sum((~a & b).cast("long")), F.lit(0))
        .cast("long")
        .alias("c_count"),
    )
    return cells.selectExpr(
        "n_items",
        "b_count",
        "c_count",
        "b_count + c_count AS n_discordant",
        # exact micro-grid statistic: diff^2 is nonneg, div truncates ==
        # floors on nonneg operands in BOTH engines
        "CASE WHEN b_count + c_count > 0 THEN"
        " ((CAST(b_count - c_count AS DECIMAL(38,0))"
        "   * (b_count - c_count) * 1000000)"
        "  div (b_count + c_count)) / 1e6 END AS chi2_q6",
        "CASE WHEN b_count + c_count > 0 THEN"
        " ((CAST(greatest(abs(b_count - c_count) - 1, 0) AS DECIMAL(38,0))"
        "   * greatest(abs(b_count - c_count) - 1, 0) * 1000000)"
        "  div (b_count + c_count)) / 1e6 END AS chi2_cc_q6",
        # decision on the exact micro integer vs the literal 3.841459
        "CASE WHEN b_count + c_count > 0 THEN"
        " ((CAST(greatest(abs(b_count - c_count) - 1, 0) AS DECIMAL(38,0))"
        "   * greatest(abs(b_count - c_count) - 1, 0) * 1000000)"
        "  div (b_count + c_count)) > 3841459 END AS reject_05",
    )


def cochran_q(
    df: DataFrame,
    item_col: str,
    treatment_col: str,
) -> DataFrame:
    """Cochran's Q (Cochran 1950, public): k paired binary treatments
    over the same items — the k-classifier generalization of McNemar.
    Input is the PRESENCE long form: a row (item, treatment) means the
    treatment fired on that item; absence means 0.  The treatment
    universe k is the distinct-treatment count of the whole frame, so
    every item is a complete block (absent marks are exact zeros, never
    NULLs to densify).

    Q = (k-1) * [k * sum_j T_j^2 - G^2] / (k * G - sum_i x_i^2) with
    T_j = items marked by treatment j, x_i = treatments marked on item
    i, G = total marks.  Every sum is an exact integer (DECIMAL(38,0)
    products past int64); Q lands on the micro grid via one nonneg
    floor-division.  Returns one row: (k_treatments, n_items, g_marks,
    q_q6) — q_q6 NULL when the denominator is 0 (every item marked by
    all or none, no information)."""
    marks = (
        df.select(
            F.col(item_col).alias("i"), F.col(treatment_col).alias("t")
        )
        .filter(F.col("i").isNotNull() & F.col("t").isNotNull())
        .distinct()
    )
    per_treat = marks.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("tj")
    )
    per_item = marks.groupBy("i").agg(
        F.count(F.lit(1)).cast("long").alias("xi")
    )
    tj = per_treat.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            F.col("tj").cast("decimal(38,0)") * F.col("tj")
        ).alias("sum_tj2"),
        F.sum("tj").cast("long").alias("g_marks"),
    )
    xi = per_item.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(
            F.col("xi").cast("decimal(38,0)") * F.col("xi")
        ).alias("sum_xi2"),
    )
    return tj.crossJoin(xi).selectExpr(
        "k AS k_treatments",
        "n_items",
        "g_marks",
        "CASE WHEN CAST(k AS DECIMAL(38,0)) * g_marks - sum_xi2 > 0 THEN"
        " ((CAST(k - 1 AS DECIMAL(38,0))"
        "   * (k * sum_tj2 - CAST(g_marks AS DECIMAL(38,0)) * g_marks)"
        "   * 1000000)"
        "  div (CAST(k AS DECIMAL(38,0)) * g_marks - sum_xi2)) / 1e6"
        " END AS q_q6",
    )


def krippendorff_alpha(
    df: DataFrame,
    item_col: str,
    category_col: str,
) -> DataFrame:
    """Krippendorff's alpha, nominal metric (Krippendorff 1970/2004,
    public) over an (item, category) rating table with VARIABLE raters
    per item — the agreement statistic that, unlike Fleiss' kappa,
    stays well-defined under missing ratings and corrects for small
    samples.  Items with a single rating are unpairable and dropped
    (reported in n_dropped), the standard treatment.

    alpha = 1 - D_o/D_e with
      D_o * n   = sum_i [ sum_c n_ic (n_i - n_ic) ] / (n_i - 1)
      D_e * n(n-1) = sum_c n_c (n - n_c),   n = sum of kept n_i.

    Exactness: each item's observed-disagreement term is pico-quantized
    via a nonneg DECIMAL(38,0) floor-division (the fleiss_kappa
    convention), summed exactly; alpha's final floor lands on the micro
    grid through integer arithmetic only — the numerator (B - A) can be
    negative (alpha < 0 = systematic disagreement), so the floor is
    emulated from NONNEG divisions on both engines (DuckDB // truncates
    toward zero on negatives while Python/Spark conventions differ —
    never divide a negative).  Returns one row: (n_items, n_dropped,
    n_ratings, d_o_q12, d_e_q12, alpha_q6)."""
    cells = df.groupBy(
        F.col(item_col).alias("i"), F.col(category_col).alias("cat")
    ).agg(F.count(F.lit(1)).cast("long").alias("nic"))
    return krippendorff_alpha_from_cells(cells)


def krippendorff_alpha_from_cells(cells: DataFrame) -> DataFrame:
    """Finale of :func:`krippendorff_alpha` over a pre-aggregated
    (i, cat, nic) cell table — the cells are the associative streaming
    state, so the T35 stream twin snapshots them and shares this exact
    code path (the cells/finale recipe)."""
    per_item = cells.groupBy("i").agg(
        F.sum("nic").cast("long").alias("ni"),
        F.sum(
            F.col("nic").cast("decimal(38,0)") * F.col("nic")
        ).alias("si"),
    )
    kept = per_item.filter(F.col("ni") >= 2)
    # sum_c n_ic (n_i - n_ic) = n_i^2 - S_i  (exact), pico-quantized.
    # Subtract-modulo exact decimal division (brier precedent): the
    # quotient is ~n_i * 1e12, which passes 2^63 for a hot item with
    # >= ~9.2M ratings — `div`'s BIGINT result would silently wrap
    # while the HUGEINT oracle stays exact.
    do_terms = kept.select(
        "ni",
        F.expr(
            "(((CAST(ni AS DECIMAL(38,0)) * ni - si)"
            " * CAST(1000000000000 AS DECIMAL(38,0)))"
            " - ((CAST(ni AS DECIMAL(38,0)) * ni - si)"
            "    * CAST(1000000000000 AS DECIMAL(38,0))) % (ni - 1))"
            " / (ni - 1)"
        ).cast("decimal(38,0)").alias("do_pico"),
    )
    tot = do_terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.coalesce(
            F.sum(F.col("do_pico").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("do_sum"),
        F.coalesce(F.sum("ni"), F.lit(0)).cast("long").alias("n_ratings"),
    )
    dropped = per_item.filter(F.col("ni") < 2).agg(
        F.count(F.lit(1)).cast("long").alias("n_dropped")
    )
    cat_tot = (
        cells.join(kept.select("i"), "i")
        .groupBy("cat")
        .agg(F.sum("nic").cast("long").alias("cc"))
    )
    e_sum = cat_tot.crossJoin(
        cat_tot.agg(F.sum("cc").cast("long").alias("nn"))
    ).agg(
        F.coalesce(
            F.sum(
                F.col("cc").cast("decimal(38,0)")
                * (F.col("nn") - F.col("cc"))
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("e_sum")
    )
    row = tot.crossJoin(dropped).crossJoin(e_sum)
    # alpha = 1 - (n-1) * do_sum / (e_sum * 1e12)  ==  (B - A) / B
    return row.selectExpr(
        "n_items",
        "n_dropped",
        "n_ratings",
        "CASE WHEN n_ratings >= 2 THEN"
        " CAST(do_sum div n_ratings AS BIGINT) / 1e12 END AS d_o_q12",
        "CASE WHEN e_sum > 0 THEN CAST("
        " (e_sum * CAST(1000000000000 AS DECIMAL(38,0)))"
        " div (CAST(n_ratings AS DECIMAL(38,0)) * (n_ratings - 1))"
        " AS BIGINT) / 1e12 END AS d_e_q12",
        # B = e_sum * 1e12, A = (n-1) * do_sum; floor((B-A)*1e6 / B)
        # via nonneg divisions only
        "CASE WHEN e_sum > 0 THEN CAST(CASE"
        " WHEN e_sum * CAST(1000000000000 AS DECIMAL(38,0))"
        "      >= (n_ratings - 1) * do_sum THEN"
        "  ((e_sum * CAST(1000000000000 AS DECIMAL(38,0))"
        "    - (n_ratings - 1) * do_sum) * 1000000)"
        "  div (e_sum * CAST(1000000000000 AS DECIMAL(38,0)))"
        " ELSE"
        "  -((((n_ratings - 1) * do_sum"
        "      - e_sum * CAST(1000000000000 AS DECIMAL(38,0))) * 1000000"
        "     + e_sum * CAST(1000000000000 AS DECIMAL(38,0)) - 1)"
        "    div (e_sum * CAST(1000000000000 AS DECIMAL(38,0))))"
        " END AS BIGINT) / 1e6 END AS alpha_q6",
    )


def fairness_report(
    df: DataFrame,
    group_col: str,
    pred_col: str,
    label_col: str,
) -> DataFrame:
    """Group-fairness audit of a binary gate (Hardt et al. 2016
    equalized odds / standard demographic parity, public): per-group
    selection rate, TPR and FPR against a reference label, plus the
    corpus-wide demographic-parity gap (max - min selection rate)
    stamped on every row — the report a curation pipeline owes before
    a quality filter silently drops one source or language.

    NULL pred/label read as False (an abstaining gate selects
    nothing). All rates are exact nonneg micro-grid floor-divisions
    over integer counts; the gap is an integer difference of those
    micro rates. One hash agg to the per-group cells + a broadcast
    1-row min/max rollup. Returns (group, n, n_selected, n_label_pos,
    sel_rate_q6, tpr_q6, fpr_q6, dp_gap_q6) — tpr/fpr NULL when the
    group lacks that label class."""
    p = F.coalesce(F.col(pred_col).cast("boolean"), F.lit(False))
    y = F.coalesce(F.col(label_col).cast("boolean"), F.lit(False))
    cells = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(p.cast("long")).cast("long").alias("n_sel"),
        F.sum(y.cast("long")).cast("long").alias("n_pos"),
        F.sum((p & y).cast("long")).cast("long").alias("n_tp"),
        F.sum((p & ~y).cast("long")).cast("long").alias("n_fp"),
    )
    return fairness_from_group_cells(cells, group_col)


def fairness_from_group_cells(
    cells: DataFrame, group_col: str = "group"
) -> DataFrame:
    """Finale of :func:`fairness_report` over the pre-aggregated
    per-group (grp, n, n_sel, n_pos, n_tp, n_fp) cell table — five
    associative sums, so the T38 stream twin snapshots them and shares
    this exact code path (the cells/finale recipe)."""
    # one row per group, consumed by both the rate projection and the
    # span rollup — checkpoint so the corpus scans ONCE
    cells = cells.localCheckpoint(eager=True)
    rated = cells.selectExpr(
        "grp",
        "n",
        "n_sel",
        "n_pos",
        "n_tp",
        "n_fp",
        "CASE WHEN n > 0 THEN"
        " (CAST(n_sel AS DECIMAL(38,0)) * 1000000) div n END AS sel_micro",
        "CASE WHEN n_pos > 0 THEN"
        " (CAST(n_tp AS DECIMAL(38,0)) * 1000000) div n_pos"
        " END AS tpr_micro",
        "CASE WHEN n - n_pos > 0 THEN"
        " (CAST(n_fp AS DECIMAL(38,0)) * 1000000) div (n - n_pos)"
        " END AS fpr_micro",
    )
    span = rated.agg(
        F.max("sel_micro").alias("sel_max"),
        F.min("sel_micro").alias("sel_min"),
    )
    return rated.crossJoin(F.broadcast(span)).selectExpr(
        f"grp AS {group_col}",
        "n",
        "n_sel AS n_selected",
        "n_pos AS n_label_pos",
        "CAST(sel_micro AS BIGINT) / 1e6 AS sel_rate_q6",
        "CAST(tpr_micro AS BIGINT) / 1e6 AS tpr_q6",
        "CAST(fpr_micro AS BIGINT) / 1e6 AS fpr_q6",
        "CAST(sel_max - sel_min AS BIGINT) / 1e6 AS dp_gap_q6",
    )


def mmd_linear_two_sample(
    df: DataFrame,
    split_col: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    c_scale: int = 10**12,
) -> DataFrame:
    """Linear-time MMD^2 two-sample test between two embedding cohorts
    (Gretton et al. 2012 JMLR sec. 6, public) — the drift detector
    that answers 'did this week's crawl move in embedding space?'
    without the quadratic kernel matrix: samples pair up in a
    deterministic order and each CONSECUTIVE pair contributes one
    unbiased h-statistic, so the estimator is one corpus pass.

    Kernel: inhomogeneous polynomial degree 2 over micro-quantized
    integer vectors, k(u, v) = (c + <u, v>)^2 with integer c =
    ``c_scale`` — every dot product, square and sum is EXACT integer
    arithmetic (h expands to 2c(a+b-e-f) + a^2+b^2-e^2-f^2, DECIMAL
    (38,0)-safe at corpus scale); the single signed division at the
    end is the symmetric nonneg floor-div emulation, reported in
    kernel units normalized by c^2 on the micro grid.

    Pairing: global_row_number over (split, id) + per-split offset
    join (the ccnet recipe — no per-group corpus window); the i-th A
    sample pairs with the i-th B sample, consecutive pairs form h.
    Returns one row: (n_a, n_b, n_pairs, mmd2_q6) — NULL when fewer
    than 2 aligned pairs exist. Under H0 (same distribution) mmd2
    concentrates at 0; positive values indicate drift."""
    from pdf_to_vectordb_etl_spark.operators.suffixes import (
        global_row_number,
    )

    from pdf_to_vectordb_etl_spark.operators.valuation import (
        _quantize_micro,
    )

    base = df.select(
        F.col(split_col).cast("boolean").alias("in_b"),
        F.col(id_col).alias("id"),
        _quantize_micro(vec_col).alias("qv"),
    ).filter(F.col("in_b").isNotNull() & F.col("qv").isNotNull())
    ranked = global_row_number(base, ["in_b", "id"], "grn")
    offs = ranked.groupBy("in_b").agg(
        F.min("grn").alias("rn0"), F.count(F.lit(1)).cast("long").alias("nn")
    )
    r = ranked.join(F.broadcast(offs), "in_b").select(
        "in_b", "qv", (F.col("grn") - F.col("rn0") + 1).alias("rank")
    )
    counts = offs.agg(
        F.coalesce(F.sum(F.when(~F.col("in_b"), F.col("nn"))), F.lit(0))
        .cast("long")
        .alias("n_a"),
        F.coalesce(F.sum(F.when(F.col("in_b"), F.col("nn"))), F.lit(0))
        .cast("long")
        .alias("n_b"),
    )
    # align the i-th A with the i-th B, then fold consecutive aligned
    # pairs (2j-1, 2j) into one h-statistic each
    a = r.filter(~F.col("in_b")).select(
        F.col("rank").alias("i"), F.col("qv").alias("x")
    )
    b = r.filter(F.col("in_b")).select(
        F.col("rank").alias("i"), F.col("qv").alias("y")
    )
    z = a.join(b, "i")
    odd = z.filter(F.col("i") % 2 == 1).select(
        ((F.col("i") + 1) / 2).cast("long").alias("j"),
        F.col("x").alias("x1"),
        F.col("y").alias("y1"),
    )
    even = z.filter(F.col("i") % 2 == 0).select(
        (F.col("i") / 2).cast("long").alias("j"),
        F.col("x").alias("x2"),
        F.col("y").alias("y2"),
    )

    def dot(u: str, v: str):
        return F.aggregate(
            F.zip_with(F.col(u), F.col(v), lambda p, q: p * q),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )

    pairs = odd.join(even, "j").select(
        dot("x1", "x2").alias("sa"),
        dot("y1", "y2").alias("sb"),
        dot("x1", "y2").alias("se"),
        dot("x2", "y1").alias("sf"),
    )
    C = f"CAST({c_scale} AS DECIMAL(38,0))"
    hsum = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.coalesce(
            F.sum(
                F.expr(
                    f"2 * {C} * (sa + sb - se - sf)"
                    f" + CAST(sa AS DECIMAL(38,0)) * sa"
                    f" + CAST(sb AS DECIMAL(38,0)) * sb"
                    f" - CAST(se AS DECIMAL(38,0)) * se"
                    f" - CAST(sf AS DECIMAL(38,0)) * sf"
                )
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("hs"),
    )
    c2 = c_scale * c_scale
    return hsum.crossJoin(F.broadcast(counts)).selectExpr(
        "n_a",
        "n_b",
        "n_pairs",
        # signed floor to the micro grid of hs / (n_pairs * c^2)
        "CASE WHEN n_pairs > 0 THEN CAST(CASE"
        " WHEN hs >= 0 THEN (hs * 1000000)"
        f"  div (CAST(n_pairs AS DECIMAL(38,0)) * {c2})"
        " ELSE -(((-hs) * 1000000"
        f"   + CAST(n_pairs AS DECIMAL(38,0)) * {c2} - 1)"
        f"  div (CAST(n_pairs AS DECIMAL(38,0)) * {c2}))"
        " END AS BIGINT) / 1e6 END AS mmd2_q6",
    )


def auc_by_group(
    df: DataFrame,
    score_col: str,
    label_col: Column,
    group_col: str,
    n_bins: int = 200,
    lo: float = 0.0,
    hi: float = 500.0,
) -> DataFrame:
    """Per-slice ROC AUC on the shared fixed score grid — the ranking
    companion of :func:`fairness_report`: a score can select equally
    often per group (parity) yet rank one group's positives worse;
    this reports each slice's AUC plus the corpus-wide AUC gap.

    Same exactness contract as :func:`binned_auc`: per-(group, bin)
    counts are one map-side-combined aggregate; the cumulative-
    negatives window is PARTITIONED by group over the ≤ n_bins-per-
    group cell table (bounded by construction); per-bin products are
    integer-or-half-valued doubles (exact under IEEE until 2^53), one
    guarded division, round 6. The gap subtracts two already-rounded
    values at the SAME precision (never re-rounded coarser).

    Returns (group, auc, n_pos, n_neg, auc_gap) — auc NULL for
    single-class slices, which the gap ignores."""
    width = (hi - lo) / n_bins
    b = F.least(
        F.greatest(
            F.floor((F.col(score_col) - F.lit(lo)) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    ).cast("int")
    # NULL labels count as negatives (the fairness_report coalesce
    # convention) — the oracle's CASE..ELSE 0 does the same; without
    # this a (group, bin) cell of all-NULL labels yields pos=neg=NULL
    # and the cumulative-negatives walk silently skips it.
    y = F.coalesce(label_col.cast("int"), F.lit(0))
    binned = (
        df.filter(F.col(score_col).isNotNull())
        .select(F.col(group_col).alias("grp"), b.alias("bin"), y.alias("y"))
        .groupBy("grp", "bin")
        .agg(
            F.sum("y").alias("pos"),
            (F.count("*") - F.sum("y")).alias("neg"),
        )
    )
    return auc_by_group_from_cells(binned, group_col)


def auc_by_group_from_cells(
    binned: DataFrame, group_col: str = "group"
) -> DataFrame:
    """Finale of :func:`auc_by_group` over a pre-aggregated
    (grp, bin, pos, neg) cell table — associative sums, so the T39
    stream twin snapshots them and shares this exact code path (the
    cells/finale recipe)."""
    w_prev = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = binned.withColumn(
        "cumneg", F.coalesce(F.sum("neg").over(w_prev), F.lit(0))
    )
    per = cum.groupBy("grp").agg(
        F.round(
            F.sum(F.col("pos") * (F.col("cumneg") + F.col("neg") / 2.0))
            / F.expr("nullif(CAST(sum(pos) AS DOUBLE) * sum(neg), 0.0)"),
            6,
        ).alias("auc"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
    )
    # per is one row per group, consumed twice (rows + span rollup) —
    # checkpoint so the corpus scans once
    per = per.localCheckpoint(eager=True)
    span = per.agg(
        (F.max("auc") - F.min("auc")).alias("auc_gap")
    )
    return per.crossJoin(F.broadcast(span)).select(
        F.col("grp").alias(group_col), "auc", "n_pos", "n_neg", "auc_gap"
    )


def cohen_d_effect(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    grid: int = 100,
) -> DataFrame:
    """Cohen's d and Hedges' g standardized effect sizes between two
    arms (Cohen 1988 / Hedges 1981, public) — the magnitude readout
    that belongs next to welch_ttest's significance: a p-value says a
    difference exists, d says whether anyone should care.

    Exactness: values floor onto the 1/``grid`` integer lattice once
    (the anova convention), every moment is then an exact integer sum
    (DECIMAL(38,0) squares), and the pooled-variance formula runs in
    doubles over those exact integers with an op order written
    IDENTICALLY in the oracle — same inputs, same IEEE sequence, same
    double, so the final floor cannot split (sqrt is correctly rounded
    everywhere; floor() — unlike integer division — agrees across
    engines on negatives). Finals floored at q4 (d, g) / q6 (means).

    Envelope: n * sum(q^2) exact in DECIMAL; the decimal->double
    conversions round-to-nearest identically in both engines.

    Returns one row: (n_a, n_b, mean_a_q6, mean_b_q6, cohen_d_q4,
    hedges_g_q4) — NULL effect sizes when either arm has < 2 rows or
    the pooled variance is 0."""
    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    q = F.floor(v * grid).cast("long")
    # NaN values drop on both engines (see wasserstein_1d note)
    base = df.filter(
        F.col(value_col).isNotNull() & ~F.isnan(v) & g.isin([group_a, group_b])
    ).select(g.alias("g2"), q.alias("q"))
    d1 = F.lit(1).cast("decimal(38,0)")
    agg = base.agg(
        # coalesce: an empty frame (neither arm present) sums to NULL
        # in Spark; the oracle reads 0
        F.coalesce(
            F.sum(F.when(F.col("g2") == group_a, 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_a"),
        F.coalesce(
            F.sum(F.when(F.col("g2") == group_b, 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_b"),
        F.coalesce(
            F.sum(F.when(F.col("g2") == group_a, F.col("q") * d1)),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("s1a"),
        F.coalesce(
            F.sum(F.when(F.col("g2") == group_b, F.col("q") * d1)),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("s1b"),
        F.coalesce(
            F.sum(
                F.when(F.col("g2") == group_a, F.col("q") * d1 * F.col("q"))
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("s2a"),
        F.coalesce(
            F.sum(
                F.when(F.col("g2") == group_b, F.col("q") * d1 * F.col("q"))
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("s2b"),
    )
    return agg.selectExpr(
        "n_a",
        "n_b",
        f"CASE WHEN n_a > 0 THEN floor(CAST(s1a AS DOUBLE)"
        f" / (n_a * {float(grid)}) * 1e6) / 1e6 END AS mean_a_q6",
        f"CASE WHEN n_b > 0 THEN floor(CAST(s1b AS DOUBLE)"
        f" / (n_b * {float(grid)}) * 1e6) / 1e6 END AS mean_b_q6",
        # pooled sd in q units (grid cancels in d); op order mirrored
        # verbatim in the oracle
        "CASE WHEN n_a >= 2 AND n_b >= 2 AND"
        " (CAST(n_a * s2a - s1a * s1a AS DOUBLE) / n_a"
        "  + CAST(n_b * s2b - s1b * s1b AS DOUBLE) / n_b)"
        " / (n_a + n_b - 2) > 0 THEN"
        " floor((CAST(s1a AS DOUBLE) / n_a - CAST(s1b AS DOUBLE) / n_b)"
        "  / sqrt((CAST(n_a * s2a - s1a * s1a AS DOUBLE) / n_a"
        "          + CAST(n_b * s2b - s1b * s1b AS DOUBLE) / n_b)"
        "         / (n_a + n_b - 2)) * 1e4) / 1e4"
        " END AS cohen_d_q4",
        "CASE WHEN n_a >= 2 AND n_b >= 2 AND"
        " (CAST(n_a * s2a - s1a * s1a AS DOUBLE) / n_a"
        "  + CAST(n_b * s2b - s1b * s1b AS DOUBLE) / n_b)"
        " / (n_a + n_b - 2) > 0 THEN"
        " floor((CAST(s1a AS DOUBLE) / n_a - CAST(s1b AS DOUBLE) / n_b)"
        "  / sqrt((CAST(n_a * s2a - s1a * s1a AS DOUBLE) / n_a"
        "          + CAST(n_b * s2b - s1b * s1b AS DOUBLE) / n_b)"
        "         / (n_a + n_b - 2))"
        "  * (1.0 - 3.0 / (4.0 * (n_a + n_b) - 9.0)) * 1e4) / 1e4"
        " END AS hedges_g_q4",
    )


def wasserstein_1d(
    df: DataFrame,
    split_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Empirical 1-D Wasserstein-1 (earth-mover) distance between two
    cohorts' value distributions (Villani 2003 / the standard
    quantile-coupling identity W1 = ∫|F_A^{-1} - F_B^{-1}|, public) —
    the drift metric that reports HOW FAR apart two distributions sit
    in value units, where KS reports only the sup gap and MMD a kernel
    score.

    Estimator: quantile-grid coupling at m = min(n_A, n_B) points —
    the smaller cohort's j-th order statistic pairs with the larger
    cohort's ceil(j * n_L / m)-th (exact integer target ranks, the
    quantile_normalize convention). Values quantize to the micro
    lattice once; the distance is then ONE exact integer |diff| sum
    and one nonneg floor-division. Ranks via global_row_number +
    per-cohort offsets (the mmd recipe); the coupling join is a
    rank equi-join.

    Returns one row: (n_a, n_b, m_points, w1_q6) in value units;
    NULL when either cohort is empty."""
    from pdf_to_vectordb_etl_spark.operators.suffixes import (
        global_row_number,
    )

    # NaN-guard BEFORE the lattice floor: Spark floor(NaN) is 0 while
    # the oracle's CAST(floor(NaN) AS BIGINT) errors — NaN rows drop
    # on both sides instead (the quantile_normalize convention)
    v = F.col(value_col).cast("double")
    base = df.select(
        F.col(split_col).cast("boolean").alias("in_b"),
        F.col(id_col).alias("id"),
        F.when(~F.isnan(v), F.floor(v * 1000000))
        .cast("long")
        .alias("q"),
    ).filter(F.col("in_b").isNotNull() & F.col("q").isNotNull())
    ranked = global_row_number(base, ["in_b", "q", "id"], "grn")
    offs = ranked.groupBy("in_b").agg(
        F.min("grn").alias("rn0"),
        F.count(F.lit(1)).cast("long").alias("nn"),
    )
    r = ranked.join(F.broadcast(offs), "in_b").select(
        "in_b", "q", (F.col("grn") - F.col("rn0") + 1).alias("rank")
    )
    counts = offs.agg(
        F.coalesce(F.sum(F.when(~F.col("in_b"), F.col("nn"))), F.lit(0))
        .cast("long")
        .alias("n_a"),
        F.coalesce(F.sum(F.when(F.col("in_b"), F.col("nn"))), F.lit(0))
        .cast("long")
        .alias("n_b"),
    )
    # smaller cohort drives the grid: j = its rank, target rank in the
    # larger = ceil(j * n_large / m)
    with_counts = r.crossJoin(F.broadcast(counts))
    small = with_counts.filter(
        F.when(F.col("n_a") <= F.col("n_b"), ~F.col("in_b")).otherwise(
            F.col("in_b")
        )
    ).select(
        F.col("rank").alias("j"),
        F.col("q").alias("q_small"),
        F.least(F.col("n_a"), F.col("n_b")).alias("m"),
        F.greatest(F.col("n_a"), F.col("n_b")).alias("n_large"),
    )
    large = with_counts.filter(
        F.when(F.col("n_a") <= F.col("n_b"), F.col("in_b")).otherwise(
            ~F.col("in_b")
        )
    ).select(F.col("rank").alias("target"), F.col("q").alias("q_large"))
    coupled = small.withColumn(
        "target",
        F.expr(
            "(CAST(j AS DECIMAL(38,0)) * n_large + m - 1) div m"
        ),
    ).join(large, "target")
    agg = coupled.agg(
        F.count(F.lit(1)).cast("long").alias("m_points"),
        F.coalesce(
            F.sum(
                F.abs(F.col("q_small") - F.col("q_large")).cast(
                    "decimal(38,0)"
                )
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("sum_abs"),
    )
    return agg.crossJoin(F.broadcast(counts)).selectExpr(
        "n_a",
        "n_b",
        "m_points",
        "CASE WHEN m_points > 0 THEN"
        " CAST(sum_abs div m_points AS BIGINT) / 1e6 END AS w1_q6",
    )


def did_estimator(
    df: DataFrame,
    treated_col: str,
    post_col: str,
    outcome_col: str,
) -> DataFrame:
    """Two-by-two difference-in-differences (Card-Krueger 1994 design,
    public): did = (treated_post - treated_pre) - (control_post -
    control_pre) over boolean treatment/period flags — the workhorse
    readout for 'did the pipeline change we shipped to half the
    corpus actually move the metric beyond the secular trend'.

    Outcomes floor to the micro lattice once; the four cell means are
    exact integer sums with ONE double division each, combined in an
    op order mirrored token-for-token in the oracle; finals floored
    q6. NULL when any of the four cells is empty (the design is
    undefined). One partial-combinable aggregate."""
    t = F.coalesce(F.col(treated_col).cast("boolean"), F.lit(False))
    p = F.coalesce(F.col(post_col).cast("boolean"), F.lit(False))
    # NaN outcomes drop on both engines (see wasserstein_1d note)
    v = F.col(outcome_col).cast("double")
    base = df.select(
        t.alias("t"),
        p.alias("p"),
        F.when(~F.isnan(v), F.floor(v * 1000000))
        .cast("long")
        .alias("r"),
    ).filter(F.col("r").isNotNull())
    d1 = F.lit(1).cast("decimal(38,0)")

    def cell(tt: bool, pp: bool, what: str):
        cond = (F.col("t") == tt) & (F.col("p") == pp)
        if what == "n":
            return F.coalesce(
                F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)
            ).cast("long")
        return F.coalesce(
            F.sum(F.when(cond, F.col("r") * d1)),
            F.lit(0).cast("decimal(38,0)"),
        )

    agg = base.agg(
        cell(True, False, "n").alias("n_t_pre"),
        cell(True, True, "n").alias("n_t_post"),
        cell(False, False, "n").alias("n_c_pre"),
        cell(False, True, "n").alias("n_c_post"),
        cell(True, False, "s").alias("s_t_pre"),
        cell(True, True, "s").alias("s_t_post"),
        cell(False, False, "s").alias("s_c_pre"),
        cell(False, True, "s").alias("s_c_post"),
    )
    mean = (
        lambda s, n: f"CAST({s} AS DOUBLE) / {n}"
    )  # micro units; op order mirrored in the oracle
    guard = "n_t_pre > 0 AND n_t_post > 0 AND n_c_pre > 0 AND n_c_post > 0"
    return agg.selectExpr(
        "n_t_pre",
        "n_t_post",
        "n_c_pre",
        "n_c_post",
        f"CASE WHEN n_t_pre > 0 THEN floor({mean('s_t_pre', 'n_t_pre')})"
        " / 1e6 END AS mean_t_pre_q6",
        f"CASE WHEN n_t_post > 0 THEN floor({mean('s_t_post', 'n_t_post')})"
        " / 1e6 END AS mean_t_post_q6",
        f"CASE WHEN n_c_pre > 0 THEN floor({mean('s_c_pre', 'n_c_pre')})"
        " / 1e6 END AS mean_c_pre_q6",
        f"CASE WHEN n_c_post > 0 THEN floor({mean('s_c_post', 'n_c_post')})"
        " / 1e6 END AS mean_c_post_q6",
        f"CASE WHEN {guard} THEN floor("
        f" (({mean('s_t_post', 'n_t_post')}) - ({mean('s_t_pre', 'n_t_pre')}))"
        f" - (({mean('s_c_post', 'n_c_post')}) - ({mean('s_c_pre', 'n_c_pre')}))"
        ") / 1e6 END AS did_q6",
    )
