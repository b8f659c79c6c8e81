"""Unit tests for the round-6 statistical-test block: ranksum_by_group
(Mann-Whitney U vs python reference), ks_by_group (exact two-sample KS),
gini_by_group, winsorized_stats (order-statistic bounds),
kendall_tau_binned (vs an O(n²) python pair loop), and text.kl_by_group
(vs python counts)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from streamkit_spark.functions.analytics import (
    gini_by_group,
    kendall_tau_binned,
    ks_by_group,
    ranksum_by_group,
    winsorized_stats,
)
from streamkit_spark.functions.text import kl_by_group


# ---------------------------------------------------------------------------
# python references
# ---------------------------------------------------------------------------

def _ranksum_ref(a, b):
    """Mann-Whitney U + tie-corrected z for sample a vs b, in python."""
    pooled = sorted(a + b)
    # fractional ranks
    first, cnt = {}, Counter(pooled)
    for i, x in enumerate(pooled):
        if x not in first:
            first[x] = i + 1
    rank = {x: first[x] + (cnt[x] - 1) / 2.0 for x in cnt}
    n1, n2, n = len(a), len(b), len(a) + len(b)
    r1 = sum(rank[x] for x in a)
    u = r1 - n1 * (n1 + 1) / 2.0
    tsum = sum(t**3 - t for t in cnt.values())
    var = (n1 * n2 / 12.0) * ((n + 1) - tsum / (n * (n - 1)))
    z = (u - n1 * n2 / 2.0) / math.sqrt(var) if var > 0 else None
    return u, z


def _ks_ref(a, b):
    """Exact two-sample KS distance in python."""
    pts = sorted(set(a + b))
    n1, n2 = len(a), len(b)
    best = 0.0
    for v in pts:
        fa = sum(1 for x in a if x <= v) / n1
        fb = sum(1 for x in b if x <= v) / n2
        best = max(best, abs(fa - fb))
    return best


def _gini_ref(xs):
    s = sorted(xs)
    n, tot = len(s), sum(s)
    if tot <= 0:
        return None
    return (2 * sum((i + 1) * x for i, x in enumerate(s)) - (n + 1) * tot) / (
        n * tot
    )


def _kendall_ref(pairs):
    """tau-b by the O(n²) definition."""
    n = len(pairs)
    cc = dd = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            (x1, y1), (x2, y2) = pairs[i], pairs[j]
            if x1 == x2 and y1 == y2:
                tx += 1
                ty += 1
            elif x1 == x2:
                tx += 1
            elif y1 == y2:
                ty += 1
            elif (x1 < x2) == (y1 < y2):
                cc += 1
            else:
                dd += 1
    n0 = n * (n - 1) // 2
    d1, d2 = n0 - tx, n0 - ty
    if d1 <= 0 or d2 <= 0:
        return cc, dd, None
    return cc, dd, (cc - dd) / math.sqrt(d1 * d2)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

A_VALS = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0, 13.0, 2.5]
B_VALS = [2.0, 4.0, 4.0, 6.0, 6.0, 9.0, 1.5, 7.0, 7.0]


@pytest.fixture()
def two_groups(spark):
    rows = [("a", v) for v in A_VALS] + [("b", v) for v in B_VALS]
    return spark.createDataFrame(rows, "grp string, v double")


# ---------------------------------------------------------------------------
# ranksum
# ---------------------------------------------------------------------------

class TestRanksum:
    def test_matches_python_reference(self, spark, two_groups):
        got = {r["grp"]: r for r in ranksum_by_group(two_groups, "grp", "v").collect()}
        u_a, z_a = _ranksum_ref(A_VALS, B_VALS)
        assert got["a"]["n"] == len(A_VALS)
        assert got["a"]["n_rest"] == len(B_VALS)
        assert got["a"]["u"] == pytest.approx(u_a, abs=1e-4)
        assert got["a"]["z"] == pytest.approx(z_a, abs=1e-4)
        # complement symmetry: z_b = -z_a (same pooled variance)
        assert got["b"]["z"] == pytest.approx(-z_a, abs=1e-4)

    def test_constant_values_null_z(self, spark):
        rows = [("a", 5.0)] * 4 + [("b", 5.0)] * 3
        df = spark.createDataFrame(rows, "grp string, v double")
        for r in ranksum_by_group(df, "grp", "v").collect():
            assert r["z"] is None

    def test_single_row_input_null_not_crash(self, spark):
        # ANSI mode would raise DIVIDE_BY_ZERO in the tie-correction's
        # n·(n−1) divisor without the outer n >= 2 guard
        df = spark.createDataFrame([("a", 1.0)], "grp string, v double")
        r = ranksum_by_group(df, "grp", "v").collect()[0]
        assert r["z"] is None and r["n_rest"] == 0

    def test_shifted_distribution_is_significant(self, spark):
        rows = [("lo", float(i)) for i in range(50)] + [
            ("hi", float(i + 40)) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "grp string, v double")
        got = {r["grp"]: r["z"] for r in ranksum_by_group(df, "grp", "v").collect()}
        assert got["hi"] > 5
        assert got["lo"] < -5


# ---------------------------------------------------------------------------
# ks
# ---------------------------------------------------------------------------

class TestKS:
    def test_matches_python_reference(self, spark, two_groups):
        got = {r["grp"]: r for r in ks_by_group(two_groups, "grp", "v").collect()}
        d_ref = _ks_ref(A_VALS, B_VALS)
        assert got["a"]["ks_d"] == pytest.approx(d_ref, abs=1e-4)
        # symmetric statistic
        assert got["b"]["ks_d"] == pytest.approx(d_ref, abs=1e-4)

    def test_identical_distributions_zero(self, spark):
        rows = [("a", float(v)) for v in (1, 2, 3)] * 2 + [
            ("b", float(v)) for v in (1, 2, 3)
        ] * 2
        df = spark.createDataFrame(rows, "grp string, v double")
        for r in ks_by_group(df, "grp", "v").collect():
            assert r["ks_d"] == 0.0

    def test_single_group_null_not_crash(self, spark):
        # empty complement → NULL ks_d, not an ANSI DIVIDE_BY_ZERO
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0)], "grp string, v double"
        )
        r = ks_by_group(df, "grp", "v").collect()[0]
        assert r["ks_d"] is None and r["n_rest"] == 0

    def test_disjoint_supports_one(self, spark):
        rows = [("a", float(i)) for i in range(5)] + [
            ("b", float(i + 100)) for i in range(5)
        ]
        df = spark.createDataFrame(rows, "grp string, v double")
        got = {r["grp"]: r for r in ks_by_group(df, "grp", "v").collect()}
        assert got["a"]["ks_d"] == 1.0
        # at_value = smallest value attaining the sup = max of group a
        assert got["a"]["at_value"] == 4.0


# ---------------------------------------------------------------------------
# gini
# ---------------------------------------------------------------------------

class TestGini:
    def test_matches_python_reference(self, spark, two_groups):
        got = {r["grp"]: r for r in gini_by_group(two_groups, "grp", "v").collect()}
        assert got["a"]["gini"] == pytest.approx(_gini_ref(A_VALS), abs=1e-4)
        assert got["b"]["gini"] == pytest.approx(_gini_ref(B_VALS), abs=1e-4)

    def test_uniform_is_zero_concentrated_is_high(self, spark):
        rows = [("even", 10.0)] * 10 + [("spike", 0.0)] * 9 + [("spike", 90.0)]
        df = spark.createDataFrame(rows, "grp string, v double")
        got = {r["grp"]: r["gini"] for r in gini_by_group(df, "grp", "v").collect()}
        assert got["even"] == 0.0
        assert got["spike"] == pytest.approx(0.9, abs=1e-4)

    def test_negative_rows_filtered(self, spark):
        rows = [("a", -5.0), ("a", 1.0), ("a", 1.0)]
        df = spark.createDataFrame(rows, "grp string, v double")
        r = gini_by_group(df, "grp", "v").collect()[0]
        assert r["n"] == 2 and r["gini"] == 0.0


# ---------------------------------------------------------------------------
# winsorized
# ---------------------------------------------------------------------------

class TestWinsorized:
    def test_bounds_are_order_statistics(self, spark):
        vals = [float(i) for i in range(1, 101)]  # 1..100
        df = spark.createDataFrame([("a", v) for v in vals], "grp string, v double")
        r = winsorized_stats(df, "grp", "v").collect()[0]
        # ceil(5*100/100)=5th smallest = 5; ceil(95*100/100)=95th = 95
        assert r["lo"] == 5.0 and r["hi"] == 95.0
        ref = sum(min(max(v, 5.0), 95.0) for v in vals) / len(vals)
        assert r["wins_mean"] == pytest.approx(ref, abs=1e-4)
        assert r["mean"] == pytest.approx(sum(vals) / len(vals), abs=1e-4)

    def test_outlier_resistance(self, spark):
        vals = [10.0] * 99 + [1e6]
        df = spark.createDataFrame([("a", v) for v in vals], "grp string, v double")
        r = winsorized_stats(df, "grp", "v").collect()[0]
        assert r["wins_mean"] == 10.0
        assert r["mean"] > 1000

    def test_tiny_group_clamps_to_sample(self, spark):
        df = spark.createDataFrame([("a", 7.0)], "grp string, v double")
        r = winsorized_stats(df, "grp", "v").collect()[0]
        assert r["lo"] == 7.0 and r["hi"] == 7.0 and r["wins_mean"] == 7.0


# ---------------------------------------------------------------------------
# kendall
# ---------------------------------------------------------------------------

class TestKendall:
    def test_matches_python_pair_loop(self, spark):
        pts = [
            (1, 3), (1, 1), (2, 2), (2, 2), (3, 1), (3, 5), (4, 4),
            (5, 2), (5, 5), (6, 6), (0, 0), (2, 6), (4, 1), (6, 3),
        ]
        df = spark.createDataFrame(
            [("g", x, y) for x, y in pts], "grp string, x long, y long"
        )
        r = kendall_tau_binned(df, "grp", "x", "y").collect()[0]
        cc, dd, tau = _kendall_ref(pts)
        assert (r["concordant"], r["discordant"]) == (cc, dd)
        assert r["tau"] == pytest.approx(tau, abs=1e-4)

    def test_perfect_concordance(self, spark):
        pts = [(i, i * 2) for i in range(10)]
        df = spark.createDataFrame(
            [("g", x, y) for x, y in pts], "grp string, x long, y long"
        )
        r = kendall_tau_binned(df, "grp", "x", "y").collect()[0]
        assert r["tau"] == 1.0 and r["discordant"] == 0

    def test_constant_axis_null(self, spark):
        df = spark.createDataFrame(
            [("g", 1, y) for y in range(5)], "grp string, x long, y long"
        )
        assert kendall_tau_binned(df, "grp", "x", "y").collect()[0]["tau"] is None


class TestCliffsDelta:
    @staticmethod
    def _ref_delta(xs, ys):
        gt = sum(1 for x in xs for y in ys if x > y)
        lt = sum(1 for x in xs for y in ys if x < y)
        return (gt - lt) / (len(xs) * len(ys))

    def test_matches_pairwise_reference_with_ties(self, spark):
        from streamkit_spark.functions.analytics import cliffs_delta_by_group

        rows = [("a", v) for v in A_VALS] + [("b", v) for v in B_VALS]
        df = spark.createDataFrame(rows, "grp string, v double")
        out = {
            r["grp"]: r for r in cliffs_delta_by_group(df, "grp", "v").collect()
        }
        ref_a = self._ref_delta(A_VALS, B_VALS)
        ref_b = self._ref_delta(B_VALS, A_VALS)
        assert out["a"]["delta"] == pytest.approx(ref_a, abs=1e-4)
        assert out["b"]["delta"] == pytest.approx(ref_b, abs=1e-4)
        assert out["a"]["n"] == len(A_VALS) and out["a"]["n_rest"] == len(B_VALS)
        # antisymmetry of the two-group case
        assert out["a"]["delta"] == pytest.approx(-out["b"]["delta"], abs=1e-4)

    def test_total_dominance_and_empty_complement(self, spark):
        from streamkit_spark.functions.analytics import cliffs_delta_by_group

        rows = [("hi", 100.0 + i) for i in range(5)] + [
            ("lo", 1.0 + i) for i in range(7)
        ]
        df = spark.createDataFrame(rows, "grp string, v double")
        out = {
            r["grp"]: r for r in cliffs_delta_by_group(df, "grp", "v").collect()
        }
        assert out["hi"]["delta"] == 1.0 and out["lo"]["delta"] == -1.0
        solo = spark.createDataFrame([("only", 2.0)], "grp string, v double")
        r = cliffs_delta_by_group(solo, "grp", "v").collect()[0]
        assert r["delta"] is None and r["n_rest"] == 0


class TestAndersonDarling:
    @staticmethod
    def _ref_a2akn(xs, ys):
        """Scholz-Stephens (1987) midrank A2akN for k=2, computed with
        BOTH samples' terms independently (not via the T2 = -T1
        shortcut the engine uses) — an algebra cross-check."""
        from collections import Counter

        cx, cy = Counter(xs), Counter(ys)
        n1, n2 = len(xs), len(ys)
        N = n1 + n2
        sx = sy = 0.0
        cumx = cumy = cump = 0
        for v in sorted(set(xs) | set(ys)):
            lx, ly = cx.get(v, 0), cy.get(v, 0)
            l = lx + ly
            mx = cumx + lx / 2
            my = cumy + ly / 2
            bj = cump + l / 2
            d = bj * (N - bj) - N * l / 4
            if d > 0:
                # Scholz-Stephens eq. 7 weight is l/N, not l (the r7
                # review fix: dropping /N made the statistic N× too big)
                sx += (l / N) * (N * mx - n1 * bj) ** 2 / d
                sy += (l / N) * (N * my - n2 * bj) ** 2 / d
            cumx += lx
            cumy += ly
            cump += l
        return (N - 1) / N * (sx / n1 + sy / n2)

    def test_matches_python_reference_with_ties(self, spark):
        from streamkit_spark.functions.analytics import ad_by_group

        rows = [("a", v) for v in A_VALS] + [("b", v) for v in B_VALS]
        df = spark.createDataFrame(rows, "grp string, v double")
        out = {r["grp"]: r for r in ad_by_group(df, "grp", "v").collect()}
        ref_a = self._ref_a2akn(A_VALS, B_VALS)
        ref_b = self._ref_a2akn(B_VALS, A_VALS)
        assert out["a"]["a2"] == pytest.approx(ref_a, abs=1e-3)
        assert out["b"]["a2"] == pytest.approx(ref_b, abs=1e-3)
        # two-sample symmetry: group-vs-rest == rest-vs-group
        assert out["a"]["a2"] == out["b"]["a2"]
        assert out["a"]["n"] == len(A_VALS) and out["a"]["n_rest"] == len(B_VALS)

    def test_identical_distributions_small_disjoint_large(self, spark):
        from streamkit_spark.functions.analytics import ad_by_group

        same = [("a", float(v % 5)) for v in range(50)] + [
            ("b", float(v % 5)) for v in range(50)
        ]
        out = {r["grp"]: r for r in ad_by_group(
            spark.createDataFrame(same, "grp string, v double"), "grp", "v"
        ).collect()}
        # EXACTLY identical samples: every T = 0, so a2 = 0 exactly
        assert out["a"]["a2"] == 0.0
        far = [("lo", float(i)) for i in range(30)] + [
            ("hi", float(1000 + i)) for i in range(30)
        ]
        out2 = {r["grp"]: r for r in ad_by_group(
            spark.createDataFrame(far, "grp string, v double"), "grp", "v"
        ).collect()}
        # full separation drives A2akN far above its H0 mean of 1
        # (scipy.anderson_ksamp on disjoint N=60 gives ~28)
        assert out2["lo"]["a2"] > 10.0
        # the H0-mean sanity: a genuinely null split stays near 1, not N
        import random

        rng = random.Random(11)
        pool = [float(rng.randint(0, 40)) for _ in range(400)]
        null_rows = [("x" if i % 2 else "y", v) for i, v in enumerate(pool)]
        out3 = {r["grp"]: r for r in ad_by_group(
            spark.createDataFrame(null_rows, "grp string, v double"),
            "grp", "v",
        ).collect()}
        assert abs(out3["x"]["a2"]) < 5.0  # would be ~hundreds if N-scaled

    def test_degenerate_single_value_null(self, spark):
        from streamkit_spark.functions.analytics import ad_by_group

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 1.0), ("b", 1.0)], "grp string, v double"
        )
        for r in ad_by_group(df, "grp", "v").collect():
            assert r["a2"] is None


class TestCramerVonMises:
    @staticmethod
    def _ref_w2(xs, ys):
        from collections import Counter

        cx, cy = Counter(xs), Counter(ys)
        n1, n2 = len(xs), len(ys)
        N = n1 + n2
        s = 0.0
        c1 = c2 = 0
        for v in sorted(set(xs) | set(ys)):
            c1 += cx.get(v, 0)
            c2 += cy.get(v, 0)
            l = cx.get(v, 0) + cy.get(v, 0)
            s += l * (c1 / n1 - c2 / n2) ** 2
        return (n1 * n2) / N**2 * s

    def test_matches_python_reference_with_ties(self, spark):
        from streamkit_spark.functions.analytics import cvm_by_group

        rows = [("a", v) for v in A_VALS] + [("b", v) for v in B_VALS]
        df = spark.createDataFrame(rows, "grp string, v double")
        out = {r["grp"]: r for r in cvm_by_group(df, "grp", "v").collect()}
        assert out["a"]["w2"] == pytest.approx(
            self._ref_w2(A_VALS, B_VALS), abs=1e-3
        )
        # two-sample symmetry
        assert out["a"]["w2"] == out["b"]["w2"]

    def test_identical_small_disjoint_large(self, spark):
        from streamkit_spark.functions.analytics import cvm_by_group

        same = [("a", float(v % 5)) for v in range(50)] + [
            ("b", float(v % 5)) for v in range(50)
        ]
        out = {r["grp"]: r for r in cvm_by_group(
            spark.createDataFrame(same, "grp string, v double"), "grp", "v"
        ).collect()}
        assert out["a"]["w2"] < 0.461  # under the 5% critical value
        far = [("lo", float(i)) for i in range(30)] + [
            ("hi", float(1000 + i)) for i in range(30)
        ]
        out2 = {r["grp"]: r for r in cvm_by_group(
            spark.createDataFrame(far, "grp string, v double"), "grp", "v"
        ).collect()}
        assert out2["lo"]["w2"] > 2.0

    def test_empty_complement_null(self, spark):
        from streamkit_spark.functions.analytics import cvm_by_group

        df = spark.createDataFrame([("only", 1.0)], "grp string, v double")
        assert cvm_by_group(df, "grp", "v").collect()[0]["w2"] is None


class TestCramersV:
    def test_matches_manual_2x2(self, spark):
        from streamkit_spark.functions.analytics import cramers_v

        # 2x2 table: a/x 30, a/y 10, b/x 10, b/y 30
        rows = (
            [("a", "x")] * 30 + [("a", "y")] * 10
            + [("b", "x")] * 10 + [("b", "y")] * 30
        )
        df = spark.createDataFrame(rows, "r string, c string")
        out = cramers_v(df, "r", "c").collect()[0]
        # chi2 for this table = 20.0 (phi^2 = 0.25), V = sqrt(0.25) = 0.5
        assert out["chi2"] == pytest.approx(20.0, abs=1e-6)
        assert out["v"] == pytest.approx(0.5, abs=1e-4)
        assert out["dof"] == 1 and out["n"] == 80

    def test_independent_table_near_zero(self, spark):
        from streamkit_spark.functions.analytics import cramers_v

        rows = [(r, c) for r in "ab" for c in "xy" for _ in range(25)]
        df = spark.createDataFrame(rows, "r string, c string")
        out = cramers_v(df, "r", "c").collect()[0]
        assert out["v"] == 0.0

    def test_degenerate_margin_null(self, spark):
        from streamkit_spark.functions.analytics import cramers_v

        df = spark.createDataFrame(
            [("a", "x"), ("b", "x"), ("a", "x")], "r string, c string"
        )
        out = cramers_v(df, "r", "c").collect()[0]
        assert out["n_cols"] == 1 and out["v"] is None


class TestTheil:
    @staticmethod
    def _ref_theil(xs):
        import math

        cents = [round(x * 100) / 100 for x in xs]
        cents = [x for x in cents if x > 0]
        n = len(cents)
        mu = sum(cents) / n
        return sum((x / mu) * math.log(x / mu) for x in cents) / n

    def test_matches_python_reference(self, spark):
        from streamkit_spark.functions.analytics import theil_by_group

        xs = [1.0, 2.0, 2.0, 5.0, 10.0, 0.5, 40.0]
        df = spark.createDataFrame(
            [("g", v) for v in xs], "grp string, v double"
        )
        r = theil_by_group(df, "grp", "v").collect()[0]
        assert r["n"] == len(xs)
        assert r["theil"] == pytest.approx(self._ref_theil(xs), abs=1e-4)

    def test_uniform_zero_and_spike_near_ln_n(self, spark):
        import math

        from streamkit_spark.functions.analytics import theil_by_group

        rows = [("even", 5.0)] * 20 + [("spike", 0.01)] * 99 + [
            ("spike", 1e6)
        ]
        df = spark.createDataFrame(rows, "grp string, v double")
        out = {r["grp"]: r for r in theil_by_group(df, "grp", "v").collect()}
        assert out["even"]["theil"] == 0.0
        # one row holds ~all mass: T approaches ln(n) = ln(100)
        assert out["spike"]["theil"] == pytest.approx(
            math.log(100), rel=0.01
        )

    def test_nonpositive_cents_excluded(self, spark):
        from streamkit_spark.functions.analytics import theil_by_group

        # 0.004 rounds to 0.00 cents -> excluded exactly like 0 and -1
        df = spark.createDataFrame(
            [("g", 0.004), ("g", 0.0), ("g", -1.0), ("g", 2.0), ("g", 4.0)],
            "grp string, v double",
        )
        r = theil_by_group(df, "grp", "v").collect()[0]
        assert r["n"] == 2
        assert r["theil"] == pytest.approx(
            self._ref_theil([2.0, 4.0]), abs=1e-4
        )


class TestMutualInformation:
    def test_perfect_dependence_mi_equals_entropy(self, spark):
        from streamkit_spark.functions.analytics import mutual_information

        # c is a bijection of r: MI = H(r) = H(c), NMI = 1
        rows = [("a", "x")] * 10 + [("b", "y")] * 30 + [("c", "z")] * 60
        df = spark.createDataFrame(rows, "r string, c string")
        out = mutual_information(df, "r", "c").collect()[0]
        import math

        h = -sum(p * math.log(p) for p in (0.1, 0.3, 0.6))
        assert out["mi"] == pytest.approx(h, abs=1e-4)
        assert out["h_row"] == out["h_col"] == pytest.approx(h, abs=1e-4)
        assert out["nmi"] == pytest.approx(1.0, abs=1e-4)

    def test_independent_zero(self, spark):
        from streamkit_spark.functions.analytics import mutual_information

        rows = [(r, c) for r in "ab" for c in "xyz" for _ in range(10)]
        df = spark.createDataFrame(rows, "r string, c string")
        out = mutual_information(df, "r", "c").collect()[0]
        assert out["mi"] == 0.0 and out["nmi"] == 0.0
        assert out["n"] == 60 and out["n_rows"] == 2 and out["n_cols"] == 3

    def test_degenerate_margin_nmi_null(self, spark):
        from streamkit_spark.functions.analytics import mutual_information

        df = spark.createDataFrame(
            [("a", "x"), ("b", "x")], "r string, c string"
        )
        out = mutual_information(df, "r", "c").collect()[0]
        assert out["mi"] == 0.0 and out["nmi"] is None

    def test_empty_input_one_null_row_like_chi2(self, spark):
        """Empty input yields ONE row of NULL statistics (the chi2 /
        SQL-oracle bare-aggregate discipline), never zero rows — a live
        MI dashboard must read NULL, not vanish (r7 review fix)."""
        from streamkit_spark.functions.analytics import (
            chi2_independence,
            mutual_information,
        )

        df = spark.createDataFrame([], "r string, c string")
        rows = mutual_information(df, "r", "c").collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["n"] is None and r["n_rows"] == 0 and r["n_cols"] == 0
        assert r["mi"] is None and r["nmi"] is None
        assert r["h_row"] is None and r["h_col"] is None
        # and the chi2 twin agrees on the shape contract
        assert len(chi2_independence(df, "r", "c").collect()) == 1


class TestKendallExact:
    def test_matches_python_pair_loop_with_ties(self, spark):
        from streamkit_spark.functions.analytics import kendall_tau_exact

        pts = [
            (1.5, 3.0), (1.5, 1.0), (2.0, 2.0), (2.0, 2.0), (3.0, 1.0),
            (3.0, 5.0), (4.5, 4.0), (5.0, 2.0), (5.0, 5.0), (6.0, 6.0),
            (0.0, 0.0), (2.0, 6.0), (4.5, 1.0), (6.0, 3.0), (2.0, 2.0),
        ]
        df = spark.createDataFrame(
            [("g", x, y) for x, y in pts], "grp string, x double, y double"
        )
        r = kendall_tau_exact(df, "grp", "x", "y").collect()[0]
        cc, dd, tau = _kendall_ref(pts)
        assert (r["n"], r["concordant"], r["discordant"]) == (len(pts), cc, dd)
        assert r["tau"] == pytest.approx(tau, abs=1e-4)

    def test_agrees_with_binned_on_integer_grid(self, spark):
        """On already-quantized data the exact and cell formulations
        are the same statistic — identical counts and tau."""
        from streamkit_spark.functions.analytics import kendall_tau_exact

        rng = [
            ("a", i % 7, (i * 3 + (i % 5)) % 11) for i in range(200)
        ] + [("b", i % 4, (13 - i) % 9) for i in range(150)]
        df = spark.createDataFrame(rng, "grp string, x long, y long")
        exact = {
            r["grp"]: r for r in kendall_tau_exact(df, "grp", "x", "y").collect()
        }
        binned = {
            r["grp"]: r for r in kendall_tau_binned(df, "grp", "x", "y").collect()
        }
        assert set(exact) == set(binned)
        for g in exact:
            assert exact[g]["concordant"] == binned[g]["concordant"]
            assert exact[g]["discordant"] == binned[g]["discordant"]
            assert exact[g]["tau"] == binned[g]["tau"]

    def test_null_nan_filtered_and_single_row_group(self, spark):
        from streamkit_spark.functions.analytics import kendall_tau_exact

        rows = [
            ("g", 1.0, 2.0), ("g", None, 3.0), ("g", float("nan"), 4.0),
            ("g", 2.0, None), ("g", 3.0, 6.0), (None, 4.0, 4.0),
            ("solo", 9.0, 9.0),
        ]
        df = spark.createDataFrame(rows, "grp string, x double, y double")
        out = {r["grp"]: r for r in kendall_tau_exact(df, "grp", "x", "y").collect()}
        assert set(out) == {"g", "solo"}
        assert out["g"]["n"] == 2 and out["g"]["concordant"] == 1
        assert out["solo"]["n"] == 1 and out["solo"]["tau"] is None
        assert out["solo"]["concordant"] == 0 and out["solo"]["discordant"] == 0

    def test_group_column_type_preserved(self, spark):
        from streamkit_spark.functions.analytics import kendall_tau_exact

        df = spark.createDataFrame(
            [(7, 1.0, 2.0), (7, 2.0, 1.0)], "grp int, x double, y double"
        )
        out = kendall_tau_exact(df, "grp", "x", "y")
        assert dict(out.dtypes)["grp"] == "int"
        assert out.collect()[0]["discordant"] == 1


# ---------------------------------------------------------------------------
# kl
# ---------------------------------------------------------------------------

class TestKL:
    def test_matches_python_reference(self, spark):
        rows = [
            ("s1", "apple banana apple cherry"),
            ("s1", "apple banana"),
            ("s2", "cherry cherry durian banana"),
        ]
        df = spark.createDataFrame(rows, "source string, text string")
        got = {r["source"]: r for r in kl_by_group(df, "source", "text").collect()}

        counts = defaultdict(Counter)
        for src, txt in rows:
            counts[src].update(txt.split())
        glob = Counter()
        for c in counts.values():
            glob.update(c)
        nn = sum(glob.values())
        for src, c in counts.items():
            ng = sum(c.values())
            ref = sum(
                (cv / ng) * math.log((cv / ng) / (glob[t] / nn))
                for t, cv in c.items()
            )
            assert got[src]["kl"] == pytest.approx(ref, abs=1e-4)
            assert got[src]["n_tokens"] == ng
            assert got[src]["n_distinct"] == len(c)

    def test_single_source_kl_zero(self, spark):
        df = spark.createDataFrame(
            [("only", "a b c a")], "source string, text string"
        )
        r = kl_by_group(df, "source", "text").collect()[0]
        assert r["kl"] == 0.0
