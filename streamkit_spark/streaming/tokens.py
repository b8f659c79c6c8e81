"""Streaming token-distribution drift — the stream twin of the
``functions.text`` drift family (KL, pairwise JSD, Kendall profile
matrix, RBO matrix, OOV rates).

The value_cells/contingency/calibration discipline applied to the
token family: per-(group, token) counts are MONOTONE and merge by
ADDITION, so one streaming count aggregate is the sketch and every
report is a shared batch finisher over it.

* ``token_cells_stream`` — streaming per-(group, token) COUNT over the
  exploded whitespace tokens; state is one integer per occupied
  (group, token) cell, bounded by GROUPS × VOCABULARY (never stream
  length), converging to the exact batch table under replay/restart.
  Delegated to ``text.token_cells`` so the paths cannot drift.  For
  open vocabularies, shingle/df-cut upstream exactly as the batch
  contract requires.
* ``finalize_kl`` / ``finalize_jsd`` / ``finalize_kendall_profile`` /
  ``finalize_rbo`` / ``finalize_oov`` / ``finalize_burrows`` /
  ``finalize_coverage`` / ``finalize_log_odds`` /
  ``finalize_diversity`` — the batch finishers: live "which source
  drifted from the corpus mixture?" (KL), "which source PAIRS
  diverged, by mass / full-vocabulary ordering / what matters most /
  style?" (JSD, Kendall tau, RBO, Burrows' Delta), "does the head
  vocabulary still cover every source?" (OOV), "how many types cover
  each percent of a source's occurrences?" (coverage), "which tokens
  DEFINE each source?" (Monroe log-odds), and "is a source's
  effective vocabulary collapsing?" (Hill diversity).

One sketch, nine reports — live domain-mixture monitoring with no
second pass over the stream, the daily/rank-stats multi-report
discipline applied to text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "token_cells_stream",
    "finalize_kl",
    "finalize_jsd",
    "finalize_kendall_profile",
    "finalize_rbo",
    "finalize_oov",
    "finalize_burrows",
    "finalize_coverage",
    "finalize_log_odds",
    "finalize_diversity",
]


def token_cells_stream(
    stream: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Streaming (g, tk, c) token-count aggregate.  Works unchanged on
    a batch DataFrame — the aggregate IS ``text.token_cells``."""
    from streamkit_spark.functions.text import token_cells

    return token_cells(stream, group_col, text_col)


def finalize_kl(
    cells: DataFrame, group_col: str = "source", round_digits: int = 4
) -> DataFrame:
    """Per-group KL-from-corpus report from the maintained token cells
    — the shared batch finisher (``text.kl_from_cells``)."""
    from streamkit_spark.functions.text import kl_from_cells

    return kl_from_cells(cells, group_col, round_digits)


def finalize_jsd(
    cells: DataFrame, group_col: str = "source", round_digits: int = 4
) -> DataFrame:
    """Pairwise JSD matrix from the SAME token cells — the shared
    batch finisher (``text.jsd_from_cells``)."""
    from streamkit_spark.functions.text import jsd_from_cells

    return jsd_from_cells(cells, group_col, round_digits)


def finalize_kendall_profile(
    cells: DataFrame,
    group_col: str = "source",
    min_count: int = 0,
    round_digits: int = 4,
) -> DataFrame:
    """Pairwise Kendall tau-b profile matrix from the SAME token cells
    — the shared batch finisher (``text.kendall_profile_from_cells``)."""
    from streamkit_spark.functions.text import kendall_profile_from_cells

    return kendall_profile_from_cells(
        cells, group_col, min_count=min_count, round_digits=round_digits
    )


def finalize_rbo(
    cells: DataFrame,
    group_col: str = "source",
    k: int = 20,
    p: float = 0.9,
    round_digits: int = 4,
) -> DataFrame:
    """Pairwise top-k rank-biased-overlap matrix from the SAME token
    cells — the shared batch finisher (``text.rbo_from_cells``)."""
    from streamkit_spark.functions.text import rbo_from_cells

    return rbo_from_cells(
        cells, group_col, k=k, p=p, round_digits=round_digits
    )


def finalize_oov(
    cells: DataFrame,
    group_col: str = "source",
    vocab_k: int = 20,
    round_digits: int = 4,
) -> DataFrame:
    """Per-group OOV-rate report from the SAME token cells — the shared
    batch finisher (``text.oov_from_cells``)."""
    from streamkit_spark.functions.text import oov_from_cells

    return oov_from_cells(
        cells, group_col, vocab_k=vocab_k, round_digits=round_digits
    )


def finalize_burrows(
    cells: DataFrame,
    group_col: str = "source",
    vocab_k: int = 50,
    round_digits: int = 4,
) -> DataFrame:
    """Pairwise Burrows' Delta stylometry matrix from the SAME token
    cells — the shared batch finisher (``text.burrows_from_cells``)."""
    from streamkit_spark.functions.text import burrows_from_cells

    return burrows_from_cells(
        cells, group_col, vocab_k=vocab_k, round_digits=round_digits
    )


def finalize_coverage(
    cells: DataFrame,
    group_col: str = "source",
    percents: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Per-group vocabulary coverage curve from the SAME token cells —
    the shared batch finisher (``text.coverage_from_cells``): how many
    top token types cover each percent of a source's occurrences,
    live."""
    from streamkit_spark.functions.text import coverage_from_cells

    return coverage_from_cells(cells, group_col, percents)


def finalize_log_odds(
    cells: DataFrame,
    group_col: str = "source",
    alpha0: float = 100.0,
    top_k: int = 5,
) -> DataFrame:
    """Monroe "Fightin' Words" log-odds top-k from the SAME token
    cells — the shared batch finisher (``text.log_odds_from_cells``):
    the live "which tokens define each source right now?" readout."""
    from streamkit_spark.functions.text import log_odds_from_cells

    return log_odds_from_cells(
        cells, group_col=group_col, alpha0=alpha0, top_k=top_k
    )


def finalize_diversity(
    cells: DataFrame,
    group_col: str = "source",
) -> DataFrame:
    """Hill-number diversity spectrum from the SAME token cells — the
    shared batch finisher (``text.diversity_from_cells``): the live
    "is a source's effective vocabulary collapsing?" readout."""
    from streamkit_spark.functions.text import diversity_from_cells

    return diversity_from_cells(cells, group_col=group_col)
