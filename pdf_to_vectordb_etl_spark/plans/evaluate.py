"""Composed corpus-evaluation plan (beyond-reference).

One call that grades a corpus build the way a training-data team
reviews a refresh: is the quality filter discriminating and calibrated
(AUC / AP / calibration-Brier), does the language labeling hold up
(kappa, macro-F1), is the embedding space retrievable (MRR@10,
recall@10), is provenance confounded with language (Cramér's V),
how concentrated is token mass (max per-source Gini), and how
Zipf-like is the token distribution (slope).  Every number comes from
an already-oracled operator in ``operators/evaluation.py`` /
``textanalysis.py``; the composition's only logic is shaping each
one-row result into a long-format ``(metric, value)`` report that a
dashboard or regression gate can diff between corpus versions.

Scale shape: each metric is one or two partial-combinable aggregates
(see the operator docstrings); the report union is a few dozen
one-row DataFrames — nothing here adds a corpus-sized stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators import evaluation as ev
from ..operators import textanalysis as ta


def _long(df: DataFrame, metrics: dict[str, str]) -> DataFrame:
    """Reshape a one-row DataFrame into (metric, value) rows —
    ``metrics`` maps output metric name -> source column."""
    pieces = [
        df.select(
            F.lit(name).alias("metric"),
            F.col(col).cast("double").alias("value"),
        )
        for name, col in metrics.items()
    ]
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def evaluate_corpus(
    spark: SparkSession,
    docs: DataFrame,
    embeddings: DataFrame,
) -> DataFrame:
    """Long-format evaluation report over a documents + embeddings
    corpus: one (metric, value) row per grade.  See module docstring
    for the metric set; thresholds/labels match the registry queries
    so every number is independently oracle-verified."""
    scored = ta.quality_logreg(docs).select("doc_id", "quality_prob").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    is_en = F.col("lang") == "en"

    auc = ev.binned_auc(scored, "quality_prob", is_en, n_bins=1000, lo=0.0, hi=1.0)
    ap = ev.binned_average_precision(
        scored, "quality_prob", is_en, n_bins=1000, lo=0.0, hi=1.0
    )
    cal = ev.calibration_bins(scored, "quality_prob", is_en, n_bins=10)
    brier = cal.agg(
        (F.sum(F.col("brier") * F.col("n")) / F.sum("n")).alias("brier")
    )

    labeled = docs.select(
        ta.detect_language(F.col("text")).alias("pred"),
        F.col("lang").alias("truth"),
    )
    kappa = ev.cohens_kappa(labeled, "pred", "truth")
    macro_f1 = ev.confusion_stats(labeled, "pred", "truth").agg(
        F.avg("f1").alias("macro_f1")
    )

    indep = ev.contingency_independence(docs, "lang", "source")

    gini = ev.gini_by_group(
        docs.select(
            "source", "doc_id", ta.token_count(F.col("text")).alias("n_tok")
        ),
        "source",
        "n_tok",
        "doc_id",
    ).agg(F.max("gini").alias("max_gini"))

    zipf = ta.zipf_fit(docs, "text", top_n=100)

    mrr = _mrr_recall(embeddings)

    report = (
        _long(auc, {"quality_auc": "auc"})
        .unionByName(_long(ap, {"quality_ap": "ap"}))
        .unionByName(_long(brier, {"quality_brier": "brier"}))
        .unionByName(_long(kappa, {"langid_kappa": "kappa"}))
        .unionByName(_long(macro_f1, {"langid_macro_f1": "macro_f1"}))
        .unionByName(_long(indep, {"lang_source_cramers_v": "cramers_v"}))
        .unionByName(_long(gini, {"token_gini_max": "max_gini"}))
        .unionByName(_long(zipf, {"zipf_slope": "slope"}))
        .unionByName(
            _long(mrr, {"ann_mrr": "mrr", "ann_recall_at_10": "recall_at_10"})
        )
    )
    return report.select("metric", F.round("value", 6).alias("value"))


def _mrr_recall(emb: DataFrame) -> DataFrame:
    """Fixed-panel brute-force MRR / recall@10 (the q_eval_mrr_ann
    shape: ≤500-query deterministic panel × corpus — linear)."""
    from ..functions.vector import cosine_similarity

    qs = emb.filter(
        (F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 5000)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("_qv"),
        F.col("label").alias("qlabel"),
    )
    pairs = (
        emb.select("vec_id", "embedding", "label")
        .crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            "vec_id",
            "label",
            F.round(
                cosine_similarity(F.col("embedding"), F.col("_qv")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.col("vec_id"))
    top = pairs.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 10
    )
    per_q = top.groupBy("qid").agg(
        F.min(
            F.when(F.col("label") == F.col("qlabel"), F.col("rank"))
        ).alias("first_hit")
    )
    return per_q.agg(
        F.avg(F.coalesce(1.0 / F.col("first_hit"), F.lit(0.0))).alias("mrr"),
        F.avg(F.col("first_hit").isNotNull().cast("int")).alias("recall_at_10"),
    )
