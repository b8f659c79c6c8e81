"""Pairwise Jensen-Shannon divergence (text.jsd_by_group_pairs) and
cross-group daily correlation (analytics.xcorr_daily) — hand-built
frames plus independent pure-Python references."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from streamkit_spark.functions.analytics import xcorr_daily
from streamkit_spark.functions.text import jsd_by_group_pairs

LN2 = math.log(2.0)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def _py_jsd(text_a, text_b):
    ca, cb = Counter(text_a.split()), Counter(text_b.split())
    na, nb = sum(ca.values()), sum(cb.values())
    out = 0.0
    for tok in set(ca) | set(cb):
        p, q = ca[tok] / na, cb[tok] / nb
        m = (p + q) / 2
        if p:
            out += 0.5 * p * math.log(p / m)
        if q:
            out += 0.5 * q * math.log(q / m)
    return out


# -------------------------------------------------------------------- JSD

def test_jsd_identical_distributions_zero(spark):
    rows = [("a", "x y z x"), ("b", "x x y z")]  # same unigram dist
    out = jsd_by_group_pairs(_docs(spark, rows), "source", "text").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["group_a"], r["group_b"]) == ("a", "b")
    assert r["n_shared"] == 3
    assert r["jsd"] == 0.0


def test_jsd_matches_python_reference_and_bound(spark):
    texts = {
        "a": "the cat sat on the mat the cat",
        "b": "the dog ran on the hill",
        "c": "a completely different vocabulary here on display",
    }
    rows = [(g, t) for g, t in texts.items()]
    out = {
        (r["group_a"], r["group_b"]): r["jsd"]
        for r in jsd_by_group_pairs(
            _docs(spark, rows), "source", "text"
        ).collect()
    }
    for (ga, gb), jsd in out.items():
        assert jsd == pytest.approx(_py_jsd(texts[ga], texts[gb]), abs=1e-3)
        assert 0.0 <= jsd <= LN2 + 1e-9


def test_jsd_disjoint_vocab_pair_omitted(spark):
    rows = [("a", "alpha beta"), ("b", "gamma delta"), ("c", "alpha gamma")]
    got = {
        (r["group_a"], r["group_b"])
        for r in jsd_by_group_pairs(
            _docs(spark, rows), "source", "text"
        ).collect()
    }
    # (a, b) share nothing -> omitted (JSD exactly ln 2 by contract)
    assert got == {("a", "c"), ("b", "c")}


def test_jsd_multiple_docs_pool_into_one_distribution(spark):
    rows = [("a", "x y"), ("a", "x z"), ("b", "x y x z")]
    r = jsd_by_group_pairs(_docs(spark, rows), "source", "text").collect()[0]
    assert r["jsd"] == 0.0  # pooled a == b exactly


# ------------------------------------------------------------------ xcorr

def _daily(spark, rows):
    return spark.createDataFrame(rows, "g string, day long, value double")


def _py_pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    num = n * sum(x * y for x, y in zip(xs, ys)) - sx * sy
    dx = n * sum(x * x for x in xs) - sx * sx
    dy = n * sum(y * y for y in ys) - sy * sy
    if dx <= 0 or dy <= 0:
        return None
    return num / math.sqrt(dx * dy)


def test_xcorr_perfect_and_anti_correlation(spark):
    rows = []
    for d in range(6):
        v = float(d + 1)
        rows += [("up", d, v), ("up2", d, 2 * v), ("down", d, 7 - v)]
    out = {
        (r["group_a"], r["group_b"]): (r["n_days"], r["corr"])
        for r in xcorr_daily(_daily(spark, rows), "g", "day", "value").collect()
    }
    assert out[("up", "up2")] == (6, 1.0)
    assert out[("down", "up")] == (6, -1.0)
    assert out[("down", "up2")] == (6, -1.0)


def test_xcorr_matches_python_on_gap_filled_series(spark):
    # "a" misses days 1 and 3 -> zeros on the global span 0..4
    rows = [("a", 0, 3.5), ("a", 2, 1.25), ("a", 4, 9.0)] + [
        ("b", d, float(v)) for d, v in enumerate([2, 8, 5, 1, 7])
    ]
    r = xcorr_daily(_daily(spark, rows), "g", "day", "value").collect()[0]
    want = _py_pearson([3.5, 0, 1.25, 0, 9.0], [2, 8, 5, 1, 7])
    assert (r["group_a"], r["group_b"], r["n_days"]) == ("a", "b", 5)
    assert r["corr"] == pytest.approx(want, abs=1e-3)


def test_xcorr_constant_series_null(spark):
    rows = [("a", d, 5.0) for d in range(4)] + [
        ("b", d, float(d)) for d in range(4)
    ]
    r = xcorr_daily(_daily(spark, rows), "g", "day", "value").collect()[0]
    assert r["corr"] is None


def test_kendall_matrix_identical_profiles_tau_one(spark):
    """Two sources with the SAME token ranking tau = 1; a source whose
    frequency ordering INVERTS it scores tau < 0; zero-filled union
    vocabulary means a missing token counts as 0, not omitted."""
    from streamkit_spark.functions.text import kendall_profile_pairs

    mk = lambda words: " ".join(words)  # noqa: E731
    rows = [
        # a and b: same ranking (x:3, y:2, z:1), different sizes
        ("a", mk(["x"] * 3 + ["y"] * 2 + ["z"])),
        ("b", mk(["x"] * 6 + ["y"] * 4 + ["z"] * 2)),
        # c: inverted ranking (z:3, y:2, x:1)
        ("c", mk(["z"] * 3 + ["y"] * 2 + ["x"])),
        # d: uses only a subset (w appears nowhere else -> zero-filled)
        ("d", mk(["w"] * 4 + ["x"])),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        (r["group_a"], r["group_b"]): r
        for r in kendall_profile_pairs(df).collect()
    }
    assert len(out) == 6  # all 4C2 pairs, zero-filled spine
    # union vocab is {w, x, y, z} for every pair
    assert all(r["n_tokens"] == 4 for r in out.values())
    assert out[("a", "b")]["tau"] == 1.0
    # a vs c: the 3 (x,y,z) pairs all invert (D=3), but w=0 on BOTH
    # sides is concordant with every positive token (C=3) — tau is
    # exactly 0, demonstrating the zero-filled spine participates
    ac = out[("a", "c")]
    assert (ac["concordant"], ac["discordant"]) == (3, 3)
    assert ac["tau"] == 0.0 < out[("a", "b")]["tau"]
    # d shares only x with a; its w column is a's zero — still a row
    assert ("a", "d") in out
