"""Unit tests for the robust/categorical statistics block and k-core:
spearman_by_group (fractional ranks, exact moments), chi2_independence
(fold determinism vs a python reference), mad_outliers (exact medians),
similarity.k_core (python peel reference + degree invariant)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from streamkit_spark.functions.analytics import (
    chi2_independence,
    cusum_changepoint,
    mad_outliers,
    ols_trend,
    spearman_by_group,
)
from streamkit_spark.functions.similarity import k_core


def _spearman_ref(xs, ys):
    """Textbook Spearman via fractional ranks + Pearson, in python."""

    def fr(v):
        s = sorted(v)
        first = {}
        cnt = defaultdict(int)
        for i, x in enumerate(s):
            cnt[x] += 1
            if x not in first:
                first[x] = i + 1
        return [first[x] + (cnt[x] - 1) / 2.0 for x in v]

    rx, ry = fr(xs), fr(ys)
    n = len(rx)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    dx = sum((a - mx) ** 2 for a in rx)
    dy = sum((b - my) ** 2 for b in ry)
    if dx <= 0 or dy <= 0:
        return None
    return num / math.sqrt(dx * dy)


class TestSpearman:
    def test_monotone_is_one(self, spark):
        rows = [("g", float(i), float(i * i)) for i in range(1, 20)]
        df = spark.createDataFrame(rows, "grp string, x double, y double")
        out = spearman_by_group(df, "grp", "x", "y").collect()
        assert out[0]["spearman_rho"] == 1.0
        assert out[0]["n"] == 19

    def test_reverse_is_minus_one(self, spark):
        rows = [("g", float(i), float(-i)) for i in range(10)]
        df = spark.createDataFrame(rows, "grp string, x double, y double")
        assert (
            spearman_by_group(df, "grp", "x", "y").collect()[0]["spearman_rho"]
            == -1.0
        )

    def test_ties_match_reference(self, spark):
        xs = [1.0, 2.0, 2.0, 3.0, 3.0, 3.0, 4.0, 5.0, 5.0, 6.0]
        ys = [2.0, 1.0, 3.0, 3.0, 5.0, 4.0, 4.0, 6.0, 7.0, 5.0]
        df = spark.createDataFrame(
            [("g", x, y) for x, y in zip(xs, ys)],
            "grp string, x double, y double",
        )
        got = spearman_by_group(df, "grp", "x", "y").collect()[0]["spearman_rho"]
        assert got == pytest.approx(_spearman_ref(xs, ys), abs=1e-4)

    def test_constant_column_is_null(self, spark):
        rows = [("g", 1.0, float(i)) for i in range(5)]
        df = spark.createDataFrame(rows, "grp string, x double, y double")
        assert (
            spearman_by_group(df, "grp", "x", "y").collect()[0]["spearman_rho"]
            is None
        )

    def test_groups_and_nulls(self, spark):
        rows = [
            ("a", 1.0, 1.0),
            ("a", 2.0, 2.0),
            ("a", 3.0, 3.0),
            ("a", None, 9.0),
            ("b", 1.0, 3.0),
            ("b", 2.0, 2.0),
            ("b", 3.0, 1.0),
            ("b", 4.0, None),
        ]
        df = spark.createDataFrame(rows, "grp string, x double, y double")
        out = {
            r["grp"]: (r["n"], r["spearman_rho"])
            for r in spearman_by_group(df, "grp", "x", "y").collect()
        }
        assert out == {"a": (3, 1.0), "b": (3, -1.0)}


def _chi2_ref(pairs):
    """FULL-table Pearson chi2: the sum runs over every r×c grid cell,
    including structural zeros (o=0 contributes e) — the textbook
    definition, independent of the engine's observed-cells-only fold."""
    cells = defaultdict(int)
    for r, c in pairs:
        cells[(r, c)] += 1
    rt = defaultdict(int)
    ct = defaultdict(int)
    for (r, c), o in cells.items():
        rt[r] += o
        ct[c] += o
    n = sum(cells.values())
    stat = 0.0
    for r in sorted(rt):
        for c in sorted(ct):
            o = cells.get((r, c), 0)
            e = rt[r] * ct[c] / n
            stat += (o - e) ** 2 / e
    return stat, (len(rt) - 1) * (len(ct) - 1), n


class TestChi2:
    def test_matches_reference(self, spark):
        pairs = [
            ("a", 0), ("a", 0), ("a", 1), ("a", 1), ("a", 1),
            ("b", 0), ("b", 1), ("b", 1), ("b", 2), ("b", 2),
            ("c", 0), ("c", 0), ("c", 0), ("c", 2),
        ]
        df = spark.createDataFrame(pairs, "r string, c long")
        row = chi2_independence(df, "r", "c").collect()[0]
        stat, dof, n = _chi2_ref(pairs)
        assert row["n"] == n
        assert row["dof"] == dof
        assert row["n_rows"] == 3 and row["n_cols"] == 3
        assert row["chi2"] == pytest.approx(stat, abs=1e-4)

    def test_structural_zero_cells_count(self, spark):
        """A diagonal 2×2 table ((a,0)×5, (b,1)×5) has two structural
        zeros; the full-table Pearson statistic is n·(ad−bc)²/(r1·r2·
        c1·c2) = 10.0 — the observed-cells-only sum would say 5.0 (the
        omission the H₀/textbook property layer caught)."""
        pairs = [("a", 0)] * 5 + [("b", 1)] * 5
        df = spark.createDataFrame(pairs, "r string, c long")
        row = chi2_independence(df, "r", "c").collect()[0]
        assert row["chi2"] == pytest.approx(10.0, abs=1e-6)
        assert row["dof"] == 1

    def test_independent_uniform_is_zero(self, spark):
        pairs = [(r, c) for r in ("x", "y") for c in (0, 1) for _ in range(5)]
        df = spark.createDataFrame(pairs, "r string, c long")
        row = chi2_independence(df, "r", "c").collect()[0]
        assert row["chi2"] == 0.0
        assert row["dof"] == 1

    def test_nulls_excluded(self, spark):
        pairs = [("a", 0), ("a", 1), (None, 0), ("b", None), ("b", 1)]
        df = spark.createDataFrame(pairs, "r string, c long")
        assert chi2_independence(df, "r", "c").collect()[0]["n"] == 3

    def test_empty_input_null_statistic(self, spark):
        # all rows filtered -> chi2 NULL (matches the SQL mirror, where
        # list() over zero rows is NULL), never the fold's 0.0 init
        df = spark.createDataFrame([(None, 1)], "r string, c long")
        row = chi2_independence(df, "r", "c").collect()[0]
        assert row["chi2"] is None
        assert row["n"] is None


class TestMadOutliers:
    def test_known_values(self, spark):
        # median 10, devs {0,1,1,2,90} -> mad 1; outlier: |100-10| > 3
        vals = [8.0, 9.0, 10.0, 11.0, 100.0]
        df = spark.createDataFrame(
            [("g", v) for v in vals], "grp string, v double"
        )
        row = mad_outliers(df, "grp", "v", k=3.0).collect()[0]
        assert row["median"] == 10.0
        assert row["mad"] == 1.0
        assert row["n_outliers"] == 1
        assert row["n"] == 5

    def test_even_count_interpolates(self, spark):
        df = spark.createDataFrame(
            [("g", v) for v in (1.0, 2.0, 3.0, 4.0)], "grp string, v double"
        )
        row = mad_outliers(df, "grp", "v").collect()[0]
        assert row["median"] == 2.5
        # devs: 1.5, 0.5, 0.5, 1.5 -> sorted 0.5 0.5 1.5 1.5 -> mad 1.0
        assert row["mad"] == 1.0

    def test_constant_group_zero_mad(self, spark):
        df = spark.createDataFrame(
            [("g", 5.0)] * 4 + [("g", 6.0)], "grp string, v double"
        )
        row = mad_outliers(df, "grp", "v").collect()[0]
        assert row["mad"] == 0.0
        # mad 0 -> any deviation beats k*mad -> the single 6.0 flags
        assert row["n_outliers"] == 1


class TestWeekdayAdjustedOutliers:
    def test_planted_anomaly_flags_weekends_do_not(self, spark):
        """A strong weekly pattern (weekend dips) with one planted
        Wednesday spike: the spike flags, the weekend dips do not —
        the whole point of removing the weekday profile first."""
        from streamkit_spark.functions.analytics import (
            mad_outliers,
            weekday_adjusted_outliers,
        )

        rows = []
        for day in range(4, 4 + 49):  # day 4 = Thursday epoch anchor
            wd = (day + 4) % 7
            base = 20.0 if wd in (2, 3) else 100.0  # weekend dips
            val = base + (day % 3) * 0.5  # small jitter
            if day == 25:
                val += 500.0  # planted anomaly
            rows.append(("g", day, val))
        df = spark.createDataFrame(rows, "grp string, day long, v double")
        out = weekday_adjusted_outliers(df, "grp", "day", "v").collect()
        assert [r["day"] for r in out] == [25]
        assert out[0]["residual"] == pytest.approx(500.0, abs=1.0)
        # sanity: the UNADJUSTED MAD on the same daily values flags the
        # weekend dips (level shifts), which is exactly the false-alarm
        # mode the adjusted report removes
        from pyspark.sql import functions as F

        naive = mad_outliers(
            df.groupBy("grp", "day")
            .agg(F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("y"))
            .select("grp", F.col("y").alias("v")),
            "grp",
            "v",
        ).collect()[0]
        assert naive["n_outliers"] > 1

    def test_single_observation_weekdays_never_flag_themselves(self, spark):
        from streamkit_spark.functions.analytics import (
            weekday_adjusted_outliers,
        )

        # 7 days, one per weekday: every expected == itself, residual 0
        rows = [("g", d, float(10 * d)) for d in range(7)]
        df = spark.createDataFrame(rows, "grp string, day long, v double")
        assert weekday_adjusted_outliers(df, "grp", "day", "v").count() == 0


class TestOlsTrend:
    def test_exact_line(self, spark):
        # y = 2x + 1 exactly -> slope 2, intercept 1, r2 1
        rows = [("g", i, 2.0 * i + 1.0) for i in range(10)]
        df = spark.createDataFrame(rows, "grp string, x long, y double")
        r = ols_trend(df, "grp", "x", "y").collect()[0]
        assert (r["slope"], r["intercept"], r["r2"]) == (2.0, 1.0, 1.0)
        assert r["n"] == 10

    def test_matches_numpy(self, spark):
        import numpy as np

        rng = np.random.RandomState(3)
        xs = np.arange(50)
        ys = np.round(3.5 * xs + 10 + rng.randn(50) * 5, 2)
        df = spark.createDataFrame(
            [("g", int(x), float(y)) for x, y in zip(xs, ys)],
            "grp string, x long, y double",
        )
        r = ols_trend(df, "grp", "x", "y").collect()[0]
        slope, intercept = np.polyfit(xs, ys, 1)
        assert r["slope"] == pytest.approx(slope, abs=1e-3)
        assert r["intercept"] == pytest.approx(intercept, abs=1e-3)
        corr = np.corrcoef(xs, ys)[0, 1]
        assert r["r2"] == pytest.approx(corr**2, abs=1e-3)

    def test_constant_x_is_null(self, spark):
        df = spark.createDataFrame(
            [("g", 5, float(i)) for i in range(4)],
            "grp string, x long, y double",
        )
        r = ols_trend(df, "grp", "x", "y").collect()[0]
        assert r["slope"] is None and r["intercept"] is None and r["r2"] is None

    def test_wide_x_raises(self, spark):
        # raw epoch-ms x would silently NULL the sxy decimal cast under
        # non-ANSI Spark -> the guard must fail loudly instead
        df = spark.createDataFrame(
            [("g", 1_700_000_000_000 + i, float(i)) for i in range(3)],
            "grp string, x long, y double",
        )
        with pytest.raises(Exception, match="ols_trend"):
            ols_trend(df, "grp", "x", "y").collect()

    def test_constant_y_zero_slope_null_r2(self, spark):
        df = spark.createDataFrame(
            [("g", i, 7.0) for i in range(4)],
            "grp string, x long, y double",
        )
        r = ols_trend(df, "grp", "x", "y").collect()[0]
        assert r["slope"] == 0.0
        assert r["r2"] is None


class TestCusum:
    def test_step_change_found(self, spark):
        # level 10 for days 0-9, level 50 for days 10-19: the CUSUM
        # excursion peaks at the last low day (day 9)
        rows = [("g", d, 10.0) for d in range(10)] + [
            ("g", d, 50.0) for d in range(10, 20)
        ]
        df = spark.createDataFrame(rows, "grp string, day long, v double")
        r = cusum_changepoint(df, "grp", "day", "v").collect()[0]
        assert r["cp_day"] == 9
        assert r["n_days"] == 20
        # S_10 = 100, expected 10/20 * 600 = 300 -> dev 200
        assert r["max_dev"] == 200.0

    def test_python_reference(self, spark):
        import random

        rng = random.Random(11)
        vals = [round(rng.uniform(0, 100), 2) for _ in range(30)]
        rows = [("g", d, v) for d, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "grp string, day long, v double")
        r = cusum_changepoint(df, "grp", "day", "v").collect()[0]
        n = len(vals)
        total = sum(vals)
        best = max(
            (abs(sum(vals[: t + 1]) - (t + 1) / n * total), -t)
            for t in range(n)
        )
        assert r["cp_day"] == -best[1]
        assert r["max_dev"] == pytest.approx(best[0], abs=1e-3)

    def test_constant_series_day_tiebreak(self, spark):
        rows = [("g", d, 5.0) for d in range(4)]
        df = spark.createDataFrame(rows, "grp string, day long, v double")
        r = cusum_changepoint(df, "grp", "day", "v").collect()[0]
        # all deviations 0 -> smallest day wins the tiebreak
        assert r["cp_day"] == 0 and r["max_dev"] == 0.0


def _peel_ref(edges, k):
    edges = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        deg = defaultdict(int)
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        drop = {v for v, d in deg.items() if d < k}
        if not drop:
            break
        edges = {
            (a, b) for a, b in edges if a not in drop and b not in drop
        }
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    return dict(deg)


class TestKCore:
    # triangle + pendant chain: 2-core is exactly the triangle
    EDGES = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]

    def _df(self, spark, edges):
        return spark.createDataFrame(edges, "src long, dst long")

    def test_triangle_chain(self, spark):
        out = {
            r["v"]: r["d"]
            for r in k_core(self._df(spark, self.EDGES), k=2).collect()
        }
        assert out == {1: 2, 2: 2, 3: 2}

    def test_matches_python_reference(self, spark):
        import random

        rng = random.Random(7)
        edges = [
            (rng.randrange(30), rng.randrange(30)) for _ in range(80)
        ]
        for k in (2, 3, 4):
            got = {
                r["v"]: r["d"]
                for r in k_core(self._df(spark, edges), k=k).collect()
            }
            assert got == _peel_ref(edges, k)

    def test_degree_invariant(self, spark):
        out = k_core(self._df(spark, self.EDGES), k=2).collect()
        assert all(r["d"] >= 2 for r in out)

    def test_empty_core(self, spark):
        assert k_core(self._df(spark, self.EDGES), k=3).count() == 0

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        edges = self.EDGES + [(2, 1), (3, 2), (1, 2)]
        out = {
            r["v"]: r["d"]
            for r in k_core(self._df(spark, edges), k=2).collect()
        }
        assert out == {1: 2, 2: 2, 3: 2}


class TestHistogramQuantiles:
    def test_known_buckets(self, spark):
        from streamkit_spark.functions.analytics import histogram_quantiles

        # values 1..100 dollars, width 25.00: p50 lands in bucket 2
        # (est_hi 75), p90/p99 in bucket 3 (est_hi 100)
        df = spark.createDataFrame(
            [("g", float(v)) for v in range(1, 101)], "grp string, v double"
        )
        rows = {
            r["p"]: r
            for r in histogram_quantiles(df, "grp", "v").collect()
        }
        assert rows[50]["est_hi"] == 75.0
        assert rows[90]["est_hi"] == 100.0
        assert rows[99]["est_hi"] == 100.0
        assert all(r["bucket_width"] == 25.0 for r in rows.values())
        assert all(r["n"] == 100 for r in rows.values())

    def test_error_bounded_by_one_bucket(self, spark):
        import random

        from streamkit_spark.functions.analytics import histogram_quantiles

        rng = random.Random(5)
        vals = sorted(round(rng.uniform(0, 500), 2) for _ in range(400))
        df = spark.createDataFrame(
            [("g", v) for v in vals], "grp string, v double"
        )
        rows = {
            r["p"]: r["est_hi"]
            for r in histogram_quantiles(df, "grp", "v").collect()
        }
        for p, est in rows.items():
            true_q = vals[-(-p * len(vals) // 100) - 1]  # ceil rank
            assert est >= true_q - 1e-9
            assert est - 25.0 <= true_q + 1e-9

    def test_merge_by_addition(self, spark):
        from streamkit_spark.functions.analytics import histogram_quantiles

        # the sketch is row-additive: quantiles of A ∪ B == quantiles
        # of the concatenated frame (trivially), and splitting the data
        # across wildly different partitionings cannot change the
        # integer bucket counts
        rows = [("g", float(v)) for v in range(1, 101)]
        df1 = spark.createDataFrame(rows, "grp string, v double")
        df8 = spark.createDataFrame(rows, "grp string, v double").repartition(8)
        a = [tuple(r) for r in histogram_quantiles(df1, "grp", "v").collect()]
        b = [tuple(r) for r in histogram_quantiles(df8, "grp", "v").collect()]
        assert a == b

    def test_negative_values_floor_bucketed(self, spark):
        from streamkit_spark.functions.analytics import histogram_quantiles

        # -1.00 must land in bucket -1 (floor), not bucket 0 (trunc):
        # with 3 negatives and 1 positive, p50 rank 2 -> bucket -1 ->
        # est_hi 0.0
        df = spark.createDataFrame(
            [("g", -1.0), ("g", -2.0), ("g", -24.0), ("g", 5.0)],
            "grp string, v double",
        )
        rows = {
            r["p"]: r["est_hi"]
            for r in histogram_quantiles(df, "grp", "v").collect()
        }
        assert rows[50] == 0.0


class TestAssociationRules:
    def test_known_counts(self, spark):
        from streamkit_spark.functions.analytics import association_rules

        # baskets: {a,b}, {a,b}, {a,c}, {b}  -> N=4, ca=3, cb=3, cc=1
        rows = [
            (1, "a"), (1, "b"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "c"),
            (4, "b"),
        ]
        df = spark.createDataFrame(rows, "basket long, item string")
        out = {
            (r["antecedent"], r["consequent"]): r
            for r in association_rules(df, ["basket"], "item").collect()
        }
        ab = out[("a", "b")]
        assert ab["n_pair"] == 2
        assert ab["support"] == 0.5          # 2/4
        assert ab["confidence"] == round(2 / 3, 4)
        assert ab["lift"] == round(4 * 2 / (3 * 3), 4)
        # direction matters for confidence, not support/lift
        ba = out[("b", "a")]
        assert ba["support"] == ab["support"] and ba["lift"] == ab["lift"]
        assert ba["confidence"] == round(2 / 3, 4)
        assert ("c", "a") in out and out[("c", "a")]["confidence"] == 1.0

    def test_duplicate_items_one_per_basket(self, spark):
        from streamkit_spark.functions.analytics import association_rules

        rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
        df = spark.createDataFrame(rows, "basket long, item string")
        out = association_rules(df, ["basket"], "item").collect()
        pair = [r for r in out if r["antecedent"] == "a"][0]
        assert pair["n_pair"] == 2 and pair["confidence"] == 1.0

    def test_singleton_baskets_no_rules(self, spark):
        from streamkit_spark.functions.analytics import association_rules

        df = spark.createDataFrame(
            [(1, "a"), (2, "b")], "basket long, item string"
        )
        assert association_rules(df, ["basket"], "item").count() == 0


class TestPsiProfile:
    def test_identical_distributions_near_zero(self, spark):
        from streamkit_spark.functions.analytics import psi_profile

        # two groups drawing the same values -> PSI ~ 0
        rows = [(g, float(v)) for g in ("x", "y") for v in range(1, 101)]
        df = spark.createDataFrame(rows, "grp string, v double")
        out = {r["grp"]: r["psi"] for r in psi_profile(df, "grp", "v").collect()}
        assert all(abs(p) < 0.01 for p in out.values())

    def test_shifted_distribution_flags(self, spark):
        from streamkit_spark.functions.analytics import psi_profile

        rows = [("x", float(v)) for v in range(1, 101)] + [
            ("y", float(v) + 200.0) for v in range(1, 101)
        ]
        df = spark.createDataFrame(rows, "grp string, v double")
        out = {r["grp"]: r["psi"] for r in psi_profile(df, "grp", "v").collect()}
        # totally disjoint ranges -> major shift on both sides
        assert all(p > 0.25 for p in out.values())

    def test_counts_and_spine(self, spark):
        from streamkit_spark.functions.analytics import psi_profile

        rows = [("x", 10.0)] * 7 + [("y", 60.0)] * 3
        df = spark.createDataFrame(rows, "grp string, v double")
        out = {r["grp"]: r for r in psi_profile(df, "grp", "v").collect()}
        assert out["x"]["n"] == 7 and out["x"]["n_rest"] == 3
        assert out["x"]["n_buckets"] == 2
        # symmetric complement: psi(x vs rest) == psi(y vs rest) here
        assert out["x"]["psi"] == out["y"]["psi"]


# --------------------------------------------------- Mann-Kendall/Theil-Sen

def _mk_daily(spark, rows):
    return spark.createDataFrame(rows, "g string, day long, value double")


def _py_mann_kendall_sen(ys):
    import math

    n = len(ys)
    s = 0
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            d = ys[j] - ys[i]
            s += (d > 0) - (d < 0)
            slopes.append(d / (j - i))
    from collections import Counter

    ties = Counter(ys)
    tsum = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - tsum) / 18
    if var <= 0:
        z = None
    elif s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    slopes.sort()
    m = len(slopes)
    med = (slopes[(m - 1) // 2] + slopes[m // 2]) / 2
    return s, z, med


def test_robust_trend_monotone_series(spark):
    from streamkit_spark.functions.analytics import robust_trend

    rows = [("a", d, float(2 * d + 1)) for d in range(10)]
    r = robust_trend(_mk_daily(spark, rows), "g", "day", "value").collect()[0]
    assert r["s"] == 45  # all 45 pairs concordant
    assert r["sen_slope"] == 2.0
    assert r["z"] > 3.0


def test_robust_trend_matches_python_reference(spark):
    import pytest as _pt

    from streamkit_spark.functions.analytics import robust_trend

    ys = [3.0, 7.0, 3.0, 9.5, 1.25, 8.0, 8.0, 2.5, 6.0, 4.75]
    rows = [("a", d, v) for d, v in enumerate(ys)]
    r = robust_trend(_mk_daily(spark, rows), "g", "day", "value").collect()[0]
    s, z, sen = _py_mann_kendall_sen(ys)
    assert r["s"] == s
    assert r["z"] == _pt.approx(z, abs=1e-3)
    assert r["sen_slope"] == _pt.approx(sen, abs=1e-3)


def test_robust_trend_constant_series_null_z(spark):
    from streamkit_spark.functions.analytics import robust_trend

    rows = [("a", d, 5.0) for d in range(6)]
    r = robust_trend(_mk_daily(spark, rows), "g", "day", "value").collect()[0]
    assert r["s"] == 0 and r["z"] is None and r["sen_slope"] == 0.0


def test_robust_trend_outlier_resistance(spark):
    from streamkit_spark.functions.analytics import robust_trend

    base = [("a", d, float(d)) for d in range(9)]
    spiked = base + [("a", 9, 1000.0)]  # one wild day
    r = robust_trend(_mk_daily(spark, spiked), "g", "day", "value").collect()[0]
    # OLS slope would exceed 60; Theil-Sen stays at the true 1.0
    assert r["sen_slope"] == 1.0
