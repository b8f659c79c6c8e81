"""Streaming quantile estimation — the stream twin of
``analytics.histogram_quantiles``.

Same split as the HLL / KMV twins (``streaming/cardinality.py``):

* ``histogram_bucket_stream`` — a streaming per-(group, bucket) COUNT.
  Bucket counts are MONOTONE (a count only grows), so update-mode /
  latest-wins sinks converge to the exact batch bucket table with no
  watermark; state is one integer per occupied bucket — bounded by the
  value range over the bucket width per group, never by the stream
  length.
* ``finalize_quantiles`` — the batch finisher over the bucket table,
  delegated to the ONE shared definition
  (``analytics.quantiles_from_histogram``) so batch and stream cannot
  drift; the parity test pins them together.

This is what makes the histogram the right streaming quantile sketch:
counts merge by ADDITION, so micro-batches, restarts, and replays all
land on the same table — GK/approx_percentile state does not have that
property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["histogram_bucket_stream", "finalize_quantiles", "finalize_psi"]


def histogram_bucket_stream(
    events: DataFrame,
    group_col: str,
    value_col: str,
    bucket_cents: int = 2500,
) -> DataFrame:
    """Streaming (grp, b, c) bucket-count aggregate.  Works unchanged on
    a batch DataFrame — the aggregate IS ``analytics.histogram_buckets``
    (pure DataFrame ops Structured Streaming runs as a stateful agg),
    delegated so the two paths cannot drift."""
    from streamkit_spark.functions.analytics import histogram_buckets

    return histogram_buckets(events, group_col, value_col, bucket_cents)


def finalize_quantiles(
    buckets: DataFrame,
    group_col: str,
    quantiles: tuple[int, ...] = (50, 90, 99),
    bucket_cents: int = 2500,
) -> DataFrame:
    """Quantile report from a (grp, b, c) bucket table maintained by
    ``histogram_bucket_stream`` — the shared batch finisher."""
    from streamkit_spark.functions.analytics import quantiles_from_histogram

    return quantiles_from_histogram(
        buckets, group_col, quantiles, bucket_cents
    )


def finalize_psi(
    buckets: DataFrame,
    group_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Live drift monitoring from the SAME streaming bucket table that
    feeds :func:`finalize_quantiles`: PSI of each group vs its
    complement (``analytics.psi_from_histogram``, the shared finisher).
    One sketch, two reports — quantiles and drift."""
    from streamkit_spark.functions.analytics import psi_from_histogram

    return psi_from_histogram(buckets, group_col, round_digits)
