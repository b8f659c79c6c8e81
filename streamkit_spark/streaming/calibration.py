"""Streaming classifier-calibration drift — the stream twin of
``analytics.expected_calibration_error`` / ``brier_decomposition``.

The value_cells/contingency discipline applied to the calibration
family: fixed-width probability-bin cells ``(bucket, n, pos, psum)``
are MONOTONE (counts and the 4dp-quantized probability sum all merge by
ADDITION), so one streaming aggregate is the sketch and every report is
a shared batch finisher over it.

* ``calibration_stream`` — streaming per-bucket (count, positive count,
  exact DECIMAL(18,4) probability sum); state is one row per occupied
  bin, bounded by ``n_buckets`` — never stream length — and converges
  to the exact batch cell table under replay/restart.  Delegated to
  ``analytics.calibration_cells`` so the paths cannot drift.
* ``finalize_ece`` / ``finalize_brier`` — the batch finishers: live
  "have the classifier's scores stopped meaning what they say?" (ECE /
  MCE) and "is it miscalibrated, or just uninformative?" (Murphy
  reliability / resolution / uncertainty).

One sketch, two reports — online calibration drift with no second pass
over the stream, the last entry on the r7 candidate list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "calibration_stream",
    "finalize_ece",
    "finalize_brier",
    "finalize_ap",
]


def calibration_stream(
    events: DataFrame,
    prob_col: str,
    label_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Streaming (bucket, n, pos, psum) calibration-cell aggregate.
    Works unchanged on a batch DataFrame — the aggregate IS
    ``analytics.calibration_cells``."""
    from streamkit_spark.functions.analytics import calibration_cells

    return calibration_cells(events, prob_col, label_col, n_buckets)


def finalize_ece(cells: DataFrame, round_digits: int = 4) -> DataFrame:
    """ECE/MCE calibration report from the maintained cell table — the
    shared batch finisher (``analytics.ece_from_cells``)."""
    from streamkit_spark.functions.analytics import ece_from_cells

    return ece_from_cells(cells, round_digits=round_digits)


def finalize_brier(cells: DataFrame, round_digits: int = 4) -> DataFrame:
    """Murphy Brier-decomposition report from the SAME cell table — the
    shared batch finisher (``analytics.brier_from_cells``)."""
    from streamkit_spark.functions.analytics import brier_from_cells

    return brier_from_cells(cells, round_digits=round_digits)


def finalize_ap(cells: DataFrame, round_digits: int = 4) -> DataFrame:
    """Average precision of the BUCKET-QUANTIZED ranking from the SAME
    cell table — the third report (``analytics.ap_from_cells``): the
    live "is the gate's ranking power drifting?" readout next to ECE's
    "are its probabilities still honest?"."""
    from streamkit_spark.functions.analytics import ap_from_cells

    return ap_from_cells(
        cells.select(
            F.col("bucket").alias("s"), "pos", F.col("n").alias("tot")
        ),
        round_digits=round_digits,
    )
