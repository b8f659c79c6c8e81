"""Streaming categorical-association statistics — the stream twin of
``analytics.chi2_independence`` / ``mutual_information`` /
``cramers_v``.

The value_cells/histogram discipline applied to the categorical
family: observed (r, c) contingency counts are MONOTONE and merge by
ADDITION, so one streaming count aggregate is the sketch, and every
report is a shared batch finisher over it.

* ``contingency_stream`` — streaming per-(row, col) COUNT; state is
  one integer per occupied contingency cell, bounded by CATEGORY
  CARDINALITIES (never stream length), converging to the exact batch
  table under replay/restart.  Delegated to
  ``analytics.contingency_cells`` so the paths cannot drift.
* ``finalize_chi2`` / ``finalize_mi`` / ``finalize_cramers`` — the
  batch finishers: live "is conversion still independent of variant?"
  (chi2), "how strongly are they associated?" (Cramér's V), "how many
  nats does one tell you about the other?" (MI/NMI).

* ``finalize_kappa`` — when the two columns are two RATERS of one item
  (rule gate vs classifier gate), the same table's Cohen's-kappa
  agreement report.

One sketch, four reports — live categorical drift monitoring with no
second pass over the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "contingency_stream",
    "finalize_chi2",
    "finalize_mi",
    "finalize_cramers",
    "finalize_kappa",
]


def contingency_stream(
    events: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """Streaming (r, c, o) contingency-count aggregate.  Works
    unchanged on a batch DataFrame — the aggregate IS
    ``analytics.contingency_cells``."""
    from streamkit_spark.functions.analytics import contingency_cells

    return contingency_cells(events, row_col, col_col)


def finalize_chi2(cells: DataFrame, round_digits: int = 4) -> DataFrame:
    """Chi-squared independence report from the maintained contingency
    table — the shared batch finisher (``analytics.chi2_from_cells``)."""
    from streamkit_spark.functions.analytics import chi2_from_cells

    return chi2_from_cells(cells, round_digits=round_digits)


def finalize_mi(cells: DataFrame, round_digits: int = 4) -> DataFrame:
    """Mutual-information report from the SAME contingency table —
    the shared batch finisher (``analytics.mi_from_cells``)."""
    from streamkit_spark.functions.analytics import mi_from_cells

    return mi_from_cells(cells, round_digits=round_digits)


def finalize_cramers(cells: DataFrame, round_digits: int = 4) -> DataFrame:
    """Cramér's V report from the SAME contingency table — the shared
    batch finisher (``analytics.cramers_from_cells``)."""
    from streamkit_spark.functions.analytics import cramers_from_cells

    return cramers_from_cells(cells, round_digits=round_digits)


def finalize_kappa(cells: DataFrame, round_digits: int = 4) -> DataFrame:
    """Cohen's kappa agreement report from the SAME contingency table —
    the shared batch finisher (``analytics.kappa_from_cells``): when
    the two columns are two RATERS of one item (rule gate vs classifier
    gate), the sketch's fourth report answers "do they still agree
    beyond chance?" live."""
    from streamkit_spark.functions.analytics import kappa_from_cells

    return kappa_from_cells(cells, round_digits=round_digits)
