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

One sketch, ten reports: the same live cell table answers "is this
segment's distribution SHIFTED?" (Mann-Whitney z), "is its SHAPE
drifting?" (two-sample KS max gap, Cramér-von Mises integral gap),
"including the TAILS?" (Anderson-Darling A²), "how STRONGLY does it
dominate?" (Cliff's delta), "how CONCENTRATED is it?" (Gini and
Theil), "what's its robust location?" (winsorized means), "does it
even look ORGANIC?" (Benford first-digit excess), and "has its tail
gone PARETO?" (Hill index) without a second pass over the stream —
the daily.py multi-report discipline applied to the value-cell
family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "value_cells_stream",
    "finalize_ranksum",
    "finalize_ks",
    "finalize_cliffs",
    "finalize_gini",
    "finalize_winsorized",
    "finalize_theil",
    "finalize_ad",
    "finalize_cvm",
    "finalize_benford",
    "finalize_hill",
    "finalize_jt",
]


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


def finalize_cliffs(
    cells: DataFrame,
    group_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Cliff's delta effect-size report from the shared cell table —
    the shared batch finisher (``analytics.cliffs_from_cells``)."""
    from streamkit_spark.functions.analytics import cliffs_from_cells

    return cliffs_from_cells(cells, group_col, round_digits)


def finalize_gini(
    cells: DataFrame,
    group_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Gini concentration report from the shared cell table — the
    shared batch finisher (``analytics.gini_from_cells``; negatives are
    filtered inside it, so the sketch needs no Lorenz-specific
    pre-filter)."""
    from streamkit_spark.functions.analytics import gini_from_cells

    return gini_from_cells(cells, group_col, round_digits)


def finalize_ad(
    cells: DataFrame,
    group_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Two-sample Anderson-Darling drift report from the shared cell
    table — the shared batch finisher (``analytics.ad_from_cells``):
    the tail-sensitive complement to :func:`finalize_ks`."""
    from streamkit_spark.functions.analytics import ad_from_cells

    return ad_from_cells(cells, group_col, round_digits)


def finalize_cvm(
    cells: DataFrame,
    group_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Two-sample Cramér-von Mises drift report from the shared cell
    table — the shared batch finisher (``analytics.cvm_from_cells``):
    the integral complement to :func:`finalize_ks`'s max and
    :func:`finalize_ad`'s tail weighting."""
    from streamkit_spark.functions.analytics import cvm_from_cells

    return cvm_from_cells(cells, group_col, round_digits)


def finalize_theil(
    cells: DataFrame,
    group_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Theil T inequality report from the shared cell table — the
    shared batch finisher (``analytics.theil_from_cells``; positivity
    filtering happens inside it, on cents)."""
    from streamkit_spark.functions.analytics import theil_from_cells

    return theil_from_cells(cells, group_col, round_digits)


def finalize_winsorized(
    cells: DataFrame,
    group_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
    round_digits: int = 4,
) -> DataFrame:
    """Winsorized-mean report from the shared cell table — the shared
    batch finisher (``analytics.winsorized_from_cells``)."""
    from streamkit_spark.functions.analytics import winsorized_from_cells

    return winsorized_from_cells(
        cells, group_col, lo_pct=lo_pct, hi_pct=hi_pct,
        round_digits=round_digits,
    )


def finalize_benford(
    cells: DataFrame,
    group_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Per-group Benford first-digit report from the shared cell table —
    the shared batch finisher (``analytics.benford_from_cells``;
    non-positive cents are filtered inside it, so the sketch needs no
    Benford-specific pre-filter): the synthetic-segment smell test,
    live."""
    from streamkit_spark.functions.analytics import benford_from_cells

    return benford_from_cells(cells, group_col, round_digits)


def finalize_hill(
    cells: DataFrame,
    group_col: str,
    k: int = 100,
    round_digits: int = 4,
) -> DataFrame:
    """Per-group Hill tail-index report from the shared cell table —
    the shared batch finisher (``analytics.hill_from_cells``;
    positivity filtering happens inside it): the live "has this
    segment's tail gone Pareto?" readout."""
    from streamkit_spark.functions.analytics import hill_from_cells

    return hill_from_cells(cells, group_col, k=k, round_digits=round_digits)


def finalize_jt(
    cells: DataFrame,
    groups: list,
    round_digits: int = 4,
) -> DataFrame:
    """Jonckheere-Terpstra ordered-trend report from the shared cell
    table — the shared batch finisher (``analytics.jt_from_cells``):
    the live "is this metric drifting monotonically across the ordered
    buckets?" readout.  ``groups`` must list the ordered group keys
    (the pivot contract)."""
    from streamkit_spark.functions.analytics import jt_from_cells

    return jt_from_cells(cells, groups, round_digits=round_digits)
