"""Jonckheere-Terpstra: brute-force mirrors + permutation magnitude pin.

The permutation pin is the strongest check in the family (the AD/chi2/
Burrows lesson): the tie-corrected Hollander-Wolfe variance is verified
against the EXACT permutation distribution of JT on small multisets —
engine==oracle==reference agreement alone cannot catch a mis-copied
textbook constant."""

from __future__ import annotations

import itertools
import math
from fractions import Fraction


def _jt_brute(samples: list[list[float]]) -> Fraction:
    """2·JT by pair enumeration (½ tie credit doubled to 1)."""
    jt2 = 0
    for i in range(len(samples)):
        for j in range(i + 1, len(samples)):
            for x in samples[i]:
                for y in samples[j]:
                    if x < y:
                        jt2 += 2
                    elif x == y:
                        jt2 += 1
    return Fraction(jt2, 1)


def _jt_moments(samples: list[list[float]]) -> tuple[Fraction, Fraction]:
    """Hollander-Wolfe eq. 6.19 mean and tie-corrected variance."""
    ns = [len(s) for s in samples]
    n = sum(ns)
    pooled: dict[float, int] = {}
    for s in samples:
        for x in s:
            pooled[x] = pooled.get(x, 0) + 1
    mean = Fraction(n * n - sum(x * x for x in ns), 4)
    a = (
        n * (n - 1) * (2 * n + 5)
        - sum(x * (x - 1) * (2 * x + 5) for x in ns)
        - sum(t * (t - 1) * (2 * t + 5) for t in pooled.values())
    )
    b = sum(x * (x - 1) * (x - 2) for x in ns) * sum(
        t * (t - 1) * (t - 2) for t in pooled.values()
    )
    c = sum(x * (x - 1) for x in ns) * sum(
        t * (t - 1) for t in pooled.values()
    )
    var = (
        Fraction(a, 72)
        + Fraction(b, 36 * n * (n - 1) * (n - 2))
        + Fraction(c, 8 * n * (n - 1))
    )
    return mean, var


def test_jt_variance_matches_exact_permutation_distribution():
    """The magnitude pin: over ALL assignments of a tied multiset to the
    group slots, the empirical JT mean and variance must equal the
    formulas EXACTLY (Fractions, no float tolerance)."""
    for values, sizes in [
        ([1, 1, 2, 2, 3], (2, 3)),
        ([1, 1, 1, 2, 3, 3], (2, 2, 2)),
        ([1, 2, 3, 4, 5, 6, 7], (3, 2, 2)),
    ]:
        n = len(values)
        assert sum(sizes) == n
        jts = []
        for perm in itertools.permutations(values):
            groups, at = [], 0
            for s in sizes:
                groups.append(list(perm[at:at + s]))
                at += s
            jts.append(_jt_brute(groups))
        m = sum(jts, Fraction(0)) / len(jts)
        v = sum((x - m) ** 2 for x in jts) / len(jts)
        # mean/var depend only on the sizes + pooled tie structure, so
        # any split of the multiset gives the same formula values
        split = [
            list(values[sum(sizes[:i]):sum(sizes[:i + 1])])
            for i in range(len(sizes))
        ]
        mean, var = _jt_moments(split)
        assert m == mean * 2, (m, mean)  # jts carry 2·JT
        assert v == var * 4, (v, var)


def _run_jt(spark, samples: list[list[float]], round_digits=6):
    from streamkit_spark.functions.analytics import jt_trend_by_group

    rows = [
        (g, float(v)) for g, s in enumerate(samples) for v in s
    ]
    df = spark.createDataFrame(rows, "g int, v double")
    return jt_trend_by_group(
        df, "g", "v", list(range(len(samples))), round_digits
    ).collect()[0]


def test_jt_engine_matches_brute_force(spark):
    samples = [
        [1.0, 2.0, 2.0, 5.0],
        [2.0, 3.0, 3.0, 4.0, 9.0],
        [3.0, 3.0, 7.0, 8.0],
        [1.0, 8.0, 8.0, 9.0, 9.0],
    ]
    row = _run_jt(spark, samples)
    jt2 = _jt_brute(samples)
    mean, var = _jt_moments(samples)
    z = float(jt2 / 2 - mean) / math.sqrt(float(var))
    assert row["jt2"] == int(jt2)
    assert row["n"] == sum(len(s) for s in samples)
    assert abs(row["z"] - z) < 1e-6
    assert row["n_groups"] == 4


def test_jt_monotone_trend_flags(spark):
    up = [[float(10 * g + i) for i in range(6)] for g in range(4)]
    assert _run_jt(spark, up)["z"] > 3
    assert _run_jt(spark, up[::-1])["z"] < -3


def test_jt_degenerate_null(spark):
    # constant values: every pair ties, variance 0 -> z NULL
    row = _run_jt(spark, [[5.0, 5.0], [5.0, 5.0], [5.0]])
    assert row["z"] is None
    assert row["jt2"] == int(_jt_brute([[5.0, 5.0], [5.0, 5.0], [5.0]]))


def test_jt_input_validation(spark):
    import pytest

    from streamkit_spark.functions.analytics import jt_from_cells

    cells = spark.createDataFrame([(0, 1.0, 1)], "grp int, v double, c long")
    with pytest.raises(ValueError):
        jt_from_cells(cells, [0])
    with pytest.raises(ValueError):
        jt_from_cells(cells, [0, 0, 1])


# ---------------------------------------------------------------------------
# Kaplan-Meier (shares this file's exact-reference discipline)
# ---------------------------------------------------------------------------

def _km_ref(rows: list[tuple[int, bool]]):
    """Textbook product-limit estimator, computed from a plain sort —
    independent of the engine's cell/window/fold shape."""
    times = sorted({t for t, _ in rows})
    out = []
    surv = 1.0
    for t in times:
        n_risk = sum(1 for u, _ in rows if u >= t)
        d = sum(1 for u, e in rows if u == t and e)
        c = sum(1 for u, e in rows if u == t and not e)
        if d > 0:
            surv *= 1.0 - d / n_risk
            out.append((t, n_risk, d, c, round(surv, 4)))
    return out


def _run_km(spark, rows):
    from streamkit_spark.functions.analytics import km_curve

    df = spark.createDataFrame(
        [(int(t), bool(e)) for t, e in rows], "dur long, obs boolean"
    )
    return [tuple(r) for r in km_curve(df, "dur", "obs").collect()]


def test_km_matches_reference_with_censoring(spark):
    rows = [(1, True), (2, True), (2, False), (3, True), (3, True),
            (4, False), (5, True), (6, False), (6, True), (7, False)]
    assert _run_km(spark, rows) == _km_ref(rows)


def test_km_no_censoring_is_empirical_survival(spark):
    """Closed-form pin: with zero censoring, S(t) is exactly the
    fraction of subjects with duration > t."""
    rows = [(t, True) for t in [1, 1, 2, 3, 3, 3, 5, 8]]
    got = _run_km(spark, rows)
    n = len(rows)
    for t, n_risk, d, c, surv in got:
        frac = sum(1 for u, _ in rows if u > t) / n
        assert surv == round(frac, 4), (t, surv, frac)
        assert c == 0
    assert got == _km_ref(rows)


def test_km_censored_only_emits_nothing_but_counts_at_risk(spark):
    # all censored -> no output rows
    assert _run_km(spark, [(3, False), (5, False)]) == []
    # censoring between deaths shrinks later at-risk counts
    rows = [(1, True), (2, False), (2, False), (4, True)]
    got = _run_km(spark, rows)
    assert got == _km_ref(rows)
    assert got[1][1] == 1  # only one subject still at risk at t=4
