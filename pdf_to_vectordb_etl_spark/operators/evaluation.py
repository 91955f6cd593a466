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
    width = (hi - lo) / n_bins
    b = F.least(
        F.greatest(F.floor((F.col(score_col) - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    y = label_col.cast("int")
    binned = (
        df.select(b.alias("bin"), y.alias("y"))
        .groupBy("bin")
        .agg(
            F.sum("y").alias("pos"),
            (F.count("*") - F.sum("y")).alias("neg"),
        )
    )
    w_prev = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = binned.withColumn(
        "cumneg", F.coalesce(F.sum("neg").over(w_prev), F.lit(0))
    )
    return cum.agg(
        F.round(
            F.sum(F.col("pos") * (F.col("cumneg") + F.col("neg") / 2.0))
            / (F.sum("pos").cast("double") * F.sum("neg").cast("double")),
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
    partial-combinable aggregate (conditional avg/var/count — no
    shuffle beyond the single global agg).  Variances round to 6
    decimals *before* entering the t / degrees-of-freedom formulas so
    both engines compute the derived statistics from identical inputs.

    Returns one row: ``n_a, n_b, mean_a, mean_b, t_stat, df``.
    """
    va = F.when(F.col(group_col) == group_a, F.col(value_col))
    vb = F.when(F.col(group_col) == group_b, F.col(value_col))
    agg = df.agg(
        F.count(va).alias("n_a"),
        F.count(vb).alias("n_b"),
        F.round(F.avg(va), 6).alias("mean_a"),
        F.round(F.avg(vb), 6).alias("mean_b"),
        F.round(F.var_samp(va), 6).alias("var_a"),
        F.round(F.var_samp(vb), 6).alias("var_b"),
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

    Returns ``bin, n, mean_prob, pos_rate, brier`` ordered by bin.
    """
    y = label_col.cast("int")
    b = F.least(
        F.floor(F.col(prob_col) * n_bins), F.lit(n_bins - 1)
    ).cast("int")
    return (
        scored.select(b.alias("bin"), F.col(prob_col).alias("p"), y.alias("y"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("p"), 6).alias("mean_prob"),
            F.round(F.avg("y"), 6).alias("pos_rate"),
            F.round(F.avg((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))), 6)
            .alias("brier"),
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
    cent = (
        pts.select("_own", F.posexplode("_v").alias("_pos", "_x"))
        .groupBy("_own", "_pos")
        .agg(F.round(F.avg("_x"), 6).alias("_c"))
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
    return (
        per_point.groupBy(F.col("_own").alias(cluster_col))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(s), 6).alias("mean_silhouette"),
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
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(
                2.0 * F.sum(F.col("_i") * F.col("_x"))
                / (F.count("*") * F.sum("_x"))
                - (F.count("*") + 1.0) / F.count("*"),
                6,
            ).alias("gini"),
        )
        .orderBy(group_col)
    )
