"""Diagonal-Fréchet embedding drift matrix: hand-computed fixed points,
identical-population zero, mean-vs-spread sensitivity, and exact/plain
sum agreement."""

from __future__ import annotations

import math

from streamkit_spark.functions.similarity import embedding_drift


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, g, [float(x) for x in v]) for i, (g, v) in enumerate(rows)],
        "vec_id long, label long, embedding array<float>",
    )


def test_drift_hand_computed_two_groups(spark):
    # group 0: [(0,0), (2,0)] -> mu=(1,0), sd=(1,0)
    # group 1: [(4,3), (4,5)] -> mu=(4,4), sd=(0,1)
    df = _emb(
        spark,
        [(0, [0, 0]), (0, [2, 0]), (1, [4, 3]), (1, [4, 5])],
    )
    row = embedding_drift(df, exact_sums=True).collect()[0]
    assert (row["group_a"], row["group_b"]) == (0, 1)
    assert (row["n_a"], row["n_b"]) == (2, 2)
    # d2 = (1-4)^2 + (0-4)^2 + (1-0)^2 + (0-1)^2 = 9 + 16 + 1 + 1 = 27
    assert row["dist2"] == 27.0
    assert row["dist"] == round(math.sqrt(27.0), 6)


def test_drift_identical_populations_is_zero(spark):
    df = _emb(
        spark,
        [(0, [1, 2]), (0, [3, 4]), (1, [1, 2]), (1, [3, 4])],
    )
    row = embedding_drift(df, exact_sums=True).collect()[0]
    assert row["dist2"] == 0.0 and row["dist"] == 0.0


def test_drift_sees_spread_changes_at_equal_means(spark):
    # same means, different per-dim spread: a mean-only distance would
    # be blind to this — the sigma term must catch it
    df = _emb(
        spark,
        [(0, [0]), (0, [0]), (1, [-2]), (1, [2])],
    )
    row = embedding_drift(df, exact_sums=True).collect()[0]
    # mu equal (0 vs 0); sd 0 vs 2 -> d2 = 4
    assert row["dist2"] == 4.0


def test_drift_pair_count_and_symmetric_ordering(spark):
    df = _emb(
        spark,
        [(g, [float(g), 1.0]) for g in (0, 1, 2) for _ in range(2)],
    )
    rows = embedding_drift(df, exact_sums=True).collect()
    # 3 groups -> 3 unordered pairs, a < b everywhere, sorted output
    assert [(r["group_a"], r["group_b"]) for r in rows] == [
        (0, 1), (0, 2), (1, 2),
    ]
    # constant spread, unit mean gaps: d(0,2) spans twice the distance
    by = {(r["group_a"], r["group_b"]): r["dist2"] for r in rows}
    assert by[(0, 2)] == 4.0 and by[(0, 1)] == 1.0 and by[(1, 2)] == 1.0


def test_drift_exact_and_plain_sums_agree_at_4dp(spark):
    # the production (map-side) path and the oracle (fold) path may
    # differ by float summation order only — identical after rounding
    df = _emb(
        spark,
        [(i % 3, [0.1 * (i + 1), 0.01 * i, 1.0]) for i in range(30)],
    )
    exact = {
        (r["group_a"], r["group_b"]): round(r["dist2"], 4)
        for r in embedding_drift(df, exact_sums=True).collect()
    }
    plain = {
        (r["group_a"], r["group_b"]): round(r["dist2"], 4)
        for r in embedding_drift(df.repartition(8), exact_sums=False).collect()
    }
    assert exact == plain and len(exact) == 3
