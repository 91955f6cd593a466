"""Composed metrics-monitoring plan (beyond-reference).

Production metric streams are seasonal; running a mean-shift detector
on the raw series either false-alarms on every weekly peak or needs a
threshold so high it misses real shifts. The standard decomposition-
then-detect chain (all public practice):

  1. aggregates.seasonal_decompose — classical MA trend/seasonal split
  2. aggregates.cusum_changepoints on the REMAINDER (deseasonalized,
     detrended) — the closed-form windowed CUSUM
  3. report: per key, first alarm time + alarm counts, joined with
     the seasonal amplitude so the reader sees what was removed

Everything is the two oracled operators plus one join; the
composition's value is pinned by a planted-shift test: on a strongly
weekly series with a mid-stream level shift, CUSUM on the REMAINDER
fires at the shift (within the MA half-window) while the identical
detector on the RAW series never fires — the seasonal swing inflates
the standardization sigma until the shift is sub-noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators import aggregates


def monitor_series(
    series: DataFrame,
    value_col: str = "v",
    time_col: str = "t",
    by: str = "key",
    period: int = 7,
    slack: float = 0.5,
    threshold: float = 4.0,
) -> DataFrame:
    """Per-key monitoring report over a regular series: seasonal
    amplitude, and the deseasonalized CUSUM's first alarm time +
    alarm counts (NULL first_alarm = in control). Interior rows only
    (the MA edge carries no remainder by design)."""
    dec = aggregates.seasonal_decompose(
        series, value_col=value_col, time_col=time_col, by=by, period=period
    )
    resid = dec.filter(F.col("remainder").isNotNull()).select(
        by, time_col, F.col("remainder").alias("v")
    )
    cs = aggregates.cusum_changepoints(
        resid, value_col="v", by=by, order_cols=(time_col,),
        slack=slack, threshold=threshold,
    )
    alarms = cs.groupBy(by).agg(
        F.min(F.when(F.col("alarm_up") | F.col("alarm_down"), F.col(time_col))).alias(
            "first_alarm"
        ),
        F.sum(F.col("alarm_up").cast("long")).alias("n_alarms_up"),
        F.sum(F.col("alarm_down").cast("long")).alias("n_alarms_down"),
    )
    season = dec.groupBy(by).agg(
        F.round(F.max("seasonal") - F.min("seasonal"), 6).alias(
            "seasonal_amplitude"
        )
    )
    return season.join(alarms, by)
