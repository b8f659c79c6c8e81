"""Split-conformal threshold: rank-arithmetic pins + python replay.

Magnitude pins (the AD/chi2/Burrows discipline): the rank formula is
checked against the textbook ⌈(n+1)(1−α)⌉ recomputed with math.ceil,
and the threshold against the guarantee it exists to provide — the
calibration-set coverage rank/n is ≥ 1−α−1/n by construction and ≥ 1−α
whenever the rank is the strict ceiling."""

from __future__ import annotations

import math

import pytest


def _rank(n: int, keep_pm: int = 900) -> int:
    return ((n + 1) * keep_pm + 999) // 1000


def test_rank_formula_matches_textbook_ceiling():
    for n in list(range(1, 200)) + [999, 1000, 12345]:
        assert _rank(n) == math.ceil((n + 1) * 0.9), n
    # the guarantee point: rank <= n iff n >= (1-a)/a = 9 at alpha 0.1
    assert _rank(8) == 9 > 8          # too small: no finite threshold
    assert _rank(9) == 9              # exactly feasible: q-hat = max
    assert _rank(99) == 90
    assert _rank(19) == 18


def test_conformal_matches_python_replay(spark):
    from streamkit_spark.functions.analytics import conformal_threshold

    scores = {
        "a": [round(0.01 * ((i * 7) % 40), 4) for i in range(25)],
        "b": [round(0.05 * i, 4) for i in range(12)],
        "tiny": [0.5, 0.6, 0.7],  # n=3 < 9: no finite threshold
    }
    rows = []
    i = 0
    for g, ss in scores.items():
        for s in ss:
            rows.append((i, g, s))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, g string, s double")
    got = {
        r["g"]: r for r in conformal_threshold(df, "g", "s").collect()
    }
    for g, ss in scores.items():
        n = len(ss)
        rk = _rank(n)
        assert got[g]["n_cal"] == n and got[g]["rank"] == rk
        if rk <= n:
            want = sorted(ss)[rk - 1]
            assert got[g]["qhat"] == want
            # the guarantee the operator exists for: calibration-set
            # coverage of q-hat is >= 1 - alpha - 1/n, and equals rank/n
            cov = sum(1 for s in ss if s <= want) / n
            assert cov >= rk / n >= 0.9 - 1.0 / n
            assert got[g]["cal_coverage"] == round(rk / n, 4)
        else:
            assert got[g]["qhat"] is None
            assert got[g]["cal_coverage"] is None


def test_conformal_duplicate_scores_value_deterministic(spark):
    """With heavy ties the rank-th VALUE is sort-order independent."""
    from streamkit_spark.functions.analytics import conformal_threshold

    rows = [(i, "g", 0.5) for i in range(20)] + [
        (100 + i, "g", 0.9) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, g string, s double")
    r = conformal_threshold(df, "g", "s").collect()[0]
    # rank = ceil(26*0.9) = 24 -> within the 0.9 block
    assert r["rank"] == 24 and r["qhat"] == 0.9


def test_conformal_alpha_validation(spark):
    from streamkit_spark.functions.analytics import conformal_threshold

    df = spark.createDataFrame([(1, "g", 0.5)], "doc_id long, g string, s double")
    with pytest.raises(ValueError):
        conformal_threshold(df, "g", "s", alpha=0.0)
    with pytest.raises(ValueError):
        conformal_threshold(df, "g", "s", alpha=1.0)
