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
