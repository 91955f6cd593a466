"""Change-data-capture operators: snapshot reconciliation.

Complements aggregates.latest_per_key (changelog -> snapshot) with the
inverse direction: given two snapshots, derive the changelog. The
reference has no incremental semantics at all (it reprocesses whole
PDFs); at 100 TB, diffing snapshots is how incremental pipelines avoid
full recomputes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    keep_unchanged: bool = False,
) -> DataFrame:
    """Diff two snapshots of the same table into a changelog: one row
    per key classified ``added`` / ``removed`` / ``changed`` (payload
    differs) — ``unchanged`` rows are dropped unless asked for.

    ONE full-outer shuffle join on the key; payloads are compared as
    null-safe structs so NULL fields are handled without per-column
    logic. The output is O(churn), not O(table): at 100 TB with 0.1%
    daily churn the changelog is 1000x smaller than either input —
    downstream stages consume that, never the snapshots.
    """
    compare_cols = compare_cols or [c for c in new.columns if c not in key_cols]
    o = old.select(
        *key_cols, F.struct(*[F.col(c) for c in compare_cols]).alias("_old")
    )
    n = new.select(
        *key_cols, F.struct(*[F.col(c) for c in compare_cols]).alias("_new")
    )
    j = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_old").isNull(), F.lit("added"))
        .when(F.col("_new").isNull(), F.lit("removed"))
        .when(~F.col("_old").eqNullSafe(F.col("_new")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.withColumn("change_type", change)
    if not keep_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out.select(*key_cols, "change_type")
