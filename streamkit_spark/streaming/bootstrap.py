"""Streaming Poisson-bootstrap CI — the stream twin of
``analytics.poisson_bootstrap_ci``.

The value-cells/calibration discipline applied to resampling: the
replicate sketch ``(group, replicate, n_b, s_b)`` is MONOTONE — both
columns are exact sums that merge by ADDITION, and every weight is a
pure function of (salt, replicate, id), so disjoint micro-batches'
sketches sum to exactly the whole-corpus sketch.  One streaming
aggregate is the state (|groups| × (b + 1) rows, never stream length;
``b = -1`` is the unweighted point row) and the CI report is the shared
batch finisher.

Why this matters at 100 TB/day: a bootstrap CI normally needs the whole
corpus per resample; the Poisson form needs one pass and B counters per
group, so "is source A's mean doc length drifting outside source B's
CI?" becomes a live query over maintained state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "bootstrap_stream",
    "finalize_bootstrap_ci",
]


def bootstrap_stream(
    rows: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str = "doc_id",
    b: int = 200,
    salt: str = "boot",
) -> DataFrame:
    """Streaming (group, replicate, n_b, s_b) bootstrap sketch.  Works
    unchanged on a batch DataFrame — the aggregate IS
    ``analytics.bootstrap_replicates`` (update-mode output: each
    micro-batch re-emits the rows it touched; a latest-wins sink keeps
    the sketch)."""
    from streamkit_spark.functions.analytics import bootstrap_replicates

    return bootstrap_replicates(
        rows, group_col, value_col, id_col=id_col, b=b, salt=salt
    )


def finalize_bootstrap_ci(
    rep: DataFrame,
    group_col: str,
    alpha: float = 0.05,
    round_digits: int = 4,
) -> DataFrame:
    """Per-group CI report from the maintained replicate sketch — the
    shared batch finisher (``analytics.bootstrap_ci_from_replicates``)."""
    from streamkit_spark.functions.analytics import (
        bootstrap_ci_from_replicates,
    )

    return bootstrap_ci_from_replicates(
        rep, group_col, alpha=alpha, round_digits=round_digits
    )
