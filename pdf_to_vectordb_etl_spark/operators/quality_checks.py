"""Data-quality expectations (beyond-reference).

Delta-expectations / dbt-test class checks for a corpus pipeline: each
expectation is a boolean Column; ALL expectations evaluate in ONE pass
(a single aggregate over conditional counts — no per-check scan), and
enforcement either raises, drops violating rows, or just reports.

At 100 TB the one-pass property is the whole point: N checks cost one
scan, and the violation report is N tiny rows on the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    condition: Column  # True = row passes
    max_violation_rate: float = 0.0  # tolerated fraction of violating rows


class ExpectationError(AssertionError):
    """Raised when an expectation breaches its tolerated violation rate;
    carries the full report so the failure is actionable."""

    def __init__(self, report: list[dict]):
        self.report = report
        breached = [r["name"] for r in report if r["breached"]]
        super().__init__(f"expectations breached: {breached}; report={report}")


def check_report(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Violation report, one row per expectation, computed in ONE
    aggregate pass: (name, n_rows, n_violations, violation_rate,
    max_violation_rate, breached)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, e in enumerate(expectations):
        aggs.append(
            F.count_if(~F.coalesce(e.condition, F.lit(False))).alias(f"_v{i}")
        )
    row = df.agg(*aggs)
    reports = []
    for i, e in enumerate(expectations):
        rate = F.when(
            F.col("_n") > 0, F.col(f"_v{i}") / F.col("_n")
        ).otherwise(F.lit(0.0))
        reports.append(
            F.struct(
                F.lit(e.name).alias("name"),
                F.col("_n").alias("n_rows"),
                F.col(f"_v{i}").alias("n_violations"),
                F.round(rate, 6).alias("violation_rate"),
                F.lit(e.max_violation_rate).alias("max_violation_rate"),
                (rate > e.max_violation_rate).alias("breached"),
            )
        )
    return row.select(F.explode(F.array(*reports)).alias("r")).select("r.*")


def enforce(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Raise :class:`ExpectationError` if any expectation breaches its
    tolerance; otherwise return ``df`` unchanged. The report costs one
    aggregate job; the returned frame is untouched (no extra scan on
    the success path)."""
    report = [r.asDict() for r in check_report(df, expectations).collect()]
    if any(r["breached"] for r in report):
        raise ExpectationError(report)
    return df


def drop_violations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Row-level enforcement: keep only rows passing EVERY expectation
    (NULL condition = violation). One narrow filter, no aggregate."""
    cond = F.lit(True)
    for e in expectations:
        cond = cond & F.coalesce(e.condition, F.lit(False))
    return df.filter(cond)


def k_anonymity_report(
    df: DataFrame,
    quasi_identifiers: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity risk profile over quasi-identifier columns (Sweeney
    2002, public): every row whose QI combination is shared by fewer
    than ``k`` rows is re-identifiable; the standard pre-release check
    before a derived dataset ships. Returns one summary row:
    equivalence-class count, how many classes/rows fall under k, the
    minimum class size (the k the data actually satisfies), and the
    suppression fraction (share of rows to drop for k-anonymity).

    One hash agg over the QI tuple + one fold — partial-combinable,
    no windows; the per-class table never leaves the executors."""
    g = df.groupBy(*quasi_identifiers).agg(F.count("*").alias("_n"))
    return g.agg(
        F.count("*").alias("n_classes"),
        F.sum(F.when(F.col("_n") < k, 1).otherwise(0))
        .cast("long")
        .alias("classes_under_k"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
        .cast("long")
        .alias("rows_under_k"),
        F.min("_n").alias("min_class_size"),
        F.sum("_n").cast("long").alias("n_rows"),
    ).select(
        "n_classes",
        "classes_under_k",
        "rows_under_k",
        "min_class_size",
        (F.col("min_class_size") >= k).alias("k_anonymous"),
        F.round(F.col("rows_under_k") / F.col("n_rows"), 4).alias(
            "suppression_frac"
        ),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_identifiers: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """l-diversity risk profile (Machanavajjhala et al. 2007, public):
    k-anonymity's necessary companion — an equivalence class whose
    rows all share ONE sensitive value leaks it even when the class is
    large, so every class must carry at least ``l`` DISTINCT sensitive
    values. Returns one summary row mirroring k_anonymity_report:
    class count, classes/rows under l, the l the data actually
    satisfies, and the suppression fraction.

    One hash agg over (QI, sensitive) then one over QI (both
    partial-combinable, distinct folded into the first agg's key), one
    fold — the per-class table never leaves the executors."""
    per = (
        df.groupBy(*quasi_identifiers, F.col(sensitive_col).alias("_sv"))
        .agg(F.count("*").alias("_nv"))
        .groupBy(*quasi_identifiers)
        .agg(
            F.count("*").alias("_div"),
            F.sum("_nv").cast("long").alias("_n"),
        )
    )
    return per.agg(
        F.count("*").alias("n_classes"),
        F.sum(F.when(F.col("_div") < l, 1).otherwise(0))
        .cast("long")
        .alias("classes_under_l"),
        F.sum(F.when(F.col("_div") < l, F.col("_n")).otherwise(0))
        .cast("long")
        .alias("rows_under_l"),
        F.min("_div").cast("long").alias("min_diversity"),
        F.sum("_n").cast("long").alias("n_rows"),
    ).select(
        "n_classes",
        "classes_under_l",
        "rows_under_l",
        "min_diversity",
        (F.col("min_diversity") >= l).alias("l_diverse"),
        F.round(F.col("rows_under_l") / F.col("n_rows"), 4).alias(
            "suppression_frac"
        ),
    )
