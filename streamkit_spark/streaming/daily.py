"""Streaming daily-series diagnostics — the stream twin of the
``analytics`` daily-total family (seasonal strength, ACF, cross-group
correlation).

Same split as the histogram-quantile and rank-stat twins
(``streaming/quantiles.py``, ``streaming/rankstats.py``):

* ``daily_totals_stream`` — a streaming per-(group, day) DECIMAL(18,2)
  value sum.  Decimal sums are MONOTONE and merge by ADDITION, so
  micro-batches, restarts, and replays all converge to the exact batch
  daily table; state is one decimal per observed (group, day) — bounded
  by GROUPS × DAYS, never by stream length.  The loud 1e12 overflow
  guard rides along (it is part of the shared aggregate).
* ``finalize_seasonal`` / ``finalize_acf`` / ``finalize_xcorr`` — the
  batch finishers over the daily table, delegated to the ONE shared
  definition (``analytics.seasonal_from_daily`` / ``acf_from_daily`` /
  ``xcorr_from_daily``) so batch and stream cannot drift; the parity
  test pins all three reports together.

One sketch, six reports: the same live daily table answers "is the
weekly rhythm strengthening?" (seasonal), "is the series trending or
cyclic?" (ACF), "which metrics co-move?" (xcorr), "where is the level
heading?" (Holt), "when did the level shift?" (CUSUM), and "which days
were anomalous after the weekly pattern?" (weekday outliers) without a
second pass over the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "daily_totals_stream",
    "finalize_seasonal",
    "finalize_acf",
    "finalize_xcorr",
    "finalize_holt",
    "finalize_cusum",
    "finalize_weekday_outliers",
]


def daily_totals_stream(
    events: DataFrame,
    group_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Streaming (grp, day, y) daily-total aggregate.  Works unchanged
    on a batch DataFrame — the aggregate IS ``analytics.daily_totals``
    (pure DataFrame ops Structured Streaming runs as a stateful agg),
    delegated so the two paths cannot drift."""
    from streamkit_spark.functions.analytics import daily_totals

    return daily_totals(events, group_col, day_col, value_col)


def finalize_seasonal(
    daily: DataFrame,
    group_col: str,
    period: int = 7,
    round_digits: int = 4,
) -> DataFrame:
    """Seasonal-strength report from a (grp, day, y) table maintained by
    ``daily_totals_stream`` — the shared batch finisher."""
    from streamkit_spark.functions.analytics import seasonal_from_daily

    return seasonal_from_daily(daily, group_col, period, round_digits)


def finalize_acf(
    daily: DataFrame,
    group_col: str,
    max_lag: int = 7,
    round_digits: int = 4,
) -> DataFrame:
    """Autocorrelation report from the SAME streaming daily table —
    the shared batch finisher."""
    from streamkit_spark.functions.analytics import acf_from_daily

    return acf_from_daily(daily, group_col, max_lag, round_digits)


def finalize_xcorr(
    daily: DataFrame,
    round_digits: int = 4,
) -> DataFrame:
    """Cross-group correlation report from the SAME streaming daily
    table — the shared batch finisher."""
    from streamkit_spark.functions.analytics import xcorr_from_daily

    return xcorr_from_daily(daily, round_digits)


def finalize_holt(
    daily: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    round_digits: int = 4,
) -> DataFrame:
    """Holt level/trend/forecast report from the SAME streaming daily
    table — the shared batch finisher (``analytics.holt_from_daily``):
    the fourth report off one sketch."""
    from streamkit_spark.functions.analytics import holt_from_daily

    return holt_from_daily(daily, group_col, alpha, beta, round_digits)


def finalize_cusum(
    daily: DataFrame,
    group_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """CUSUM changepoint report from the SAME streaming daily table —
    the shared batch finisher (``analytics.cusum_from_daily``): the
    fifth report off one sketch."""
    from pyspark.sql import functions as F

    from streamkit_spark.functions.analytics import cusum_from_daily

    return cusum_from_daily(
        daily.select("grp", "day", F.col("y").alias("sv")),
        group_col,
        round_digits,
    )


def finalize_weekday_outliers(
    daily: DataFrame,
    group_col: str,
    k: float = 3.0,
    round_digits: int = 4,
) -> DataFrame:
    """Seasonality-corrected daily anomaly report from the SAME
    streaming daily table — the shared batch finisher
    (``analytics.weekday_outliers_from_daily``): the sixth report off
    one sketch.  Which days were unusual AFTER the weekly pattern,
    live."""
    from streamkit_spark.functions.analytics import (
        weekday_outliers_from_daily,
    )

    return weekday_outliers_from_daily(
        daily, group_col, k=k, round_digits=round_digits
    )
