"""Streaming rank/CDF statistics — the stream twin of
``analytics.ranksum_by_group`` / ``analytics.ks_by_group``.

Same split as the histogram-quantile twin (``streaming/quantiles.py``):

* ``value_cells_stream`` — a streaming per-(group, value) COUNT.  Cell
  counts are MONOTONE and merge by ADDITION, so micro-batches, restarts,
  and replays all converge to the exact batch cell table; state is one
  integer per occupied (group, value) cell — bounded by GROUP × VALUE
  CARDINALITY, never by stream length.  For unbounded doubles, quantize
  upstream with ``analytics.floor_bucket`` / ``histogram_buckets``
  exactly as the batch contract requires.
* ``finalize_ranksum`` / ``finalize_ks`` — the batch finishers over the
  cell table, delegated to the ONE shared definition
  (``analytics.ranksum_from_cells`` / ``ks_from_cells``) so batch and
  stream cannot drift; the parity tests pin them together.

One sketch, two reports: the same live cell table answers "is this
segment's distribution SHIFTED?" (Mann-Whitney z) and "is its SHAPE
drifting?" (two-sample KS distance) without a second pass over the
stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["value_cells_stream", "finalize_ranksum", "finalize_ks"]


def value_cells_stream(
    events: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Streaming (grp, v, c) cell-count aggregate.  Works unchanged on a
    batch DataFrame — the aggregate IS ``analytics.value_cells`` (pure
    DataFrame ops Structured Streaming runs as a stateful agg),
    delegated so the two paths cannot drift."""
    from streamkit_spark.functions.analytics import value_cells

    return value_cells(events, group_col, value_col)


def finalize_ranksum(
    cells: DataFrame,
    group_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Mann-Whitney rank-sum report from a (grp, v, c) cell table
    maintained by ``value_cells_stream`` — the shared batch finisher."""
    from streamkit_spark.functions.analytics import ranksum_from_cells

    return ranksum_from_cells(cells, group_col, round_digits)


def finalize_ks(
    cells: DataFrame,
    group_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Two-sample KS drift report from the SAME streaming cell table
    that feeds :func:`finalize_ranksum` — the shared batch finisher."""
    from streamkit_spark.functions.analytics import ks_from_cells

    return ks_from_cells(cells, group_col, round_digits)
