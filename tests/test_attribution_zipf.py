"""Unit tests for linear multi-touch attribution and the Zipf log-log
fit: hand-built event timelines with known credit splits; a synthetic
exact power law recovering its exponent."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from streamkit_spark.functions.text import zipf_fit
from streamkit_spark.operators.windows import linear_attribution


def _events(spark, rows):
    # (event_id, user_id, event_type, ts_ms)
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long"
    )


def _attr(spark, rows, window_ms=1000):
    df = _events(spark, rows)
    out = linear_attribution(
        df,
        "purchase",
        ["click", "view"],
        F.col("ts"),
        window_ms=window_ms,
    )
    return {r["event_type"]: (r["n_events"], r["credit"]) for r in out.collect()}


class TestLinearAttribution:
    def test_even_split(self, spark):
        # one purchase, one click + one view inside the window:
        # each channel gets 0.5
        rows = [
            (1, 1, "click", 100),
            (2, 1, "view", 200),
            (3, 1, "purchase", 300),
        ]
        got = _attr(spark, rows)
        assert got == {"click": (1, 0.5), "view": (1, 0.5)}

    def test_direct_when_no_touches(self, spark):
        rows = [(1, 1, "purchase", 300), (2, 2, "click", 100)]
        got = _attr(spark, rows)
        assert got == {"(direct)": (1, 1.0)}

    def test_window_excludes_old_and_later_touches(self, spark):
        rows = [
            (1, 1, "click", 100),      # too old for window 150
            (2, 1, "purchase", 300),
            (3, 1, "view", 400),       # after the purchase
        ]
        got = _attr(spark, rows, window_ms=150)
        assert got == {"(direct)": (1, 1.0)}

    def test_boundary_strictness(self, spark):
        # touch exactly at pts - window is INCLUDED; at pts EXCLUDED
        rows = [
            (1, 1, "click", 200),      # pts - window = 300 - 100 = 200
            (2, 1, "view", 300),       # == pts, excluded
            (3, 1, "purchase", 300),
        ]
        got = _attr(spark, rows, window_ms=100)
        assert got == {"click": (1, 1.0)}

    def test_credit_conserved_across_conversions(self, spark):
        # 2 purchases; first has 3 touches (1/3 each), second has 1
        rows = [
            (1, 1, "click", 100),
            (2, 1, "click", 110),
            (3, 1, "view", 120),
            (4, 1, "purchase", 200),
            (5, 2, "view", 150),
            (6, 2, "purchase", 210),
        ]
        got = _attr(spark, rows)
        total = sum(c for _, c in got.values())
        assert total == pytest.approx(2.0, abs=1e-4)
        assert got["click"][0] == 2 and got["view"][0] == 2
        assert got["click"][1] == pytest.approx(2 / 3, abs=1e-4)
        assert got["view"][1] == pytest.approx(1 + 1 / 3, abs=1e-4)

    def test_shared_touch_credits_both_conversions(self, spark):
        rows = [
            (1, 1, "click", 100),
            (2, 1, "purchase", 150),
            (3, 1, "purchase", 180),
        ]
        got = _attr(spark, rows)
        # the click is the sole touch for BOTH purchases
        assert got == {"click": (2, 2.0)}


class TestZipfFit:
    def test_exact_power_law(self, spark):
        # freq(r) = round(C * r^-1): slope should land near -1
        rows = [(f"t{r:04d}", max(1, round(100000 / r))) for r in range(1, 301)]
        df = spark.createDataFrame(rows, "tok string, freq long")
        out = zipf_fit(df).collect()[0]
        assert out["n_types"] == 300
        assert out["zipf_slope"] == pytest.approx(-1.0, abs=0.01)
        assert out["r2"] > 0.999

    def test_matches_numpy_reference(self, spark):
        rows = [("a", 50), ("b", 30), ("c", 20), ("d", 10), ("e", 5)]
        df = spark.createDataFrame(rows, "tok string, freq long")
        out = zipf_fit(df).collect()[0]
        xs = [math.log(r) for r in range(1, 6)]
        ys = [math.log(c) for _, c in rows]
        n = 5.0
        num = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
        den = n * sum(a * a for a in xs) - sum(xs) ** 2
        assert out["zipf_slope"] == pytest.approx(num / den, abs=1e-4)
        assert out["n_tokens"] == 115

    def test_single_type_is_null(self, spark):
        df = spark.createDataFrame([("a", 7)], "tok string, freq long")
        out = zipf_fit(df).collect()[0]
        assert out["zipf_slope"] is None and out["r2"] is None

    def test_rank_ties_break_on_token(self, spark):
        # equal freqs -> deterministic ranks by token; slope 0, r2 NULL
        df = spark.createDataFrame(
            [("a", 4), ("b", 4), ("c", 4)], "tok string, freq long"
        )
        out = zipf_fit(df).collect()[0]
        assert out["zipf_slope"] == 0.0
        # constant ly: deny is mathematically 0 but the float fold can
        # leave a tiny positive residue -> r2 collapses to 0.0 (num is
        # the same residue scale); either NULL or 0.0 is a valid "no
        # fit" answer, and the fold is engine/oracle-identical.
        assert out["r2"] in (None, 0.0)


class TestBenford:
    def test_shares_and_constants(self, spark):
        from streamkit_spark.functions.analytics import benford_profile

        # 9 values with leading cent-digits 1,1,1,2,2,3,4,5,9
        vals = [1.23, 10.0, 0.19, 2.5, 25.0, 3.33, 0.45, 5.0, 0.99]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        rows = {r["digit"]: r for r in benford_profile(df, "v").collect()}
        assert rows[1]["n_obs"] == 3
        assert rows[2]["n_obs"] == 2
        assert rows[1]["share"] == round(3 / 9, 4)
        assert rows[1]["benford_p"] == 0.301
        assert rows[9]["benford_p"] == 0.0458
        assert set(rows) == {1, 2, 3, 4, 5, 9}

    def test_nonpositive_excluded(self, spark):
        from streamkit_spark.functions.analytics import benford_profile

        df = spark.createDataFrame(
            [(0.0,), (-5.0,), (None,), (7.0,)], "v double"
        )
        rows = benford_profile(df, "v").collect()
        assert len(rows) == 1 and rows[0]["digit"] == 7
        assert rows[0]["share"] == 1.0

    def test_cent_digit_not_unit_digit(self, spark):
        from streamkit_spark.functions.analytics import benford_profile

        # 0.19 -> 19 cents -> leading digit 1 (not 0)
        df = spark.createDataFrame([(0.19,)], "v double")
        assert benford_profile(df, "v").collect()[0]["digit"] == 1

    def test_grouped_segments_independent(self, spark):
        """benford_by_group: a Benford-ish segment and a capped segment
        get INDEPENDENT digit profiles — the capped one's digit-1 excess
        is large and positive while the spread one's is near zero, and
        each group's shares sum to 1."""
        from streamkit_spark.functions.analytics import benford_by_group

        spread = [
            ("organic", float(v))
            for v in [1.2, 1.7, 10.0, 18.0, 2.5, 29.0, 3.1, 4.4, 5.9,
                      6.2, 7.7, 8.1, 9.6, 1.1, 2.2]
        ]
        capped = [("capped", 19.99)] * 10  # every digit = 1
        df = spark.createDataFrame(spread + capped, "g string, v double")
        rows = benford_by_group(df, "g", "v").collect()
        by_grp: dict = {}
        for r in rows:
            by_grp.setdefault(r["g"], {})[r["digit"]] = r
        cap = by_grp["capped"]
        assert set(cap) == {1} and cap[1]["share"] == 1.0
        assert cap[1]["excess"] == round(1.0 - 0.30102999566398119, 4)
        org = by_grp["organic"]
        # shares are rounded to 4dp, so the sum carries up to 9 half-ulps
        assert abs(sum(r["share"] for r in org.values()) - 1.0) < 5e-4
        assert org[1]["excess"] < cap[1]["excess"]


class TestHeaps:
    def test_growth_exponent_recovered(self, spark):
        from streamkit_spark.functions.text import heaps_fit

        # each doc introduces exactly 5 new types over 10 repeated
        # tokens: V(n) grows linearly in tokens -> beta ~= 1
        rows = []
        for d in range(30):
            toks = [f"w{d}_{i}" for i in range(5)] * 2
            rows.append((d, " ".join(toks)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = heaps_fit(df).collect()[0]
        assert out["n_docs"] == 30
        assert out["total_tokens"] == 300
        assert out["total_types"] == 150
        assert abs(out["heaps_beta"] - 1.0) < 0.01

    def test_saturated_vocab_flat(self, spark):
        from streamkit_spark.functions.text import heaps_fit

        # same 3 tokens in every doc: after doc 0 no new types
        rows = [(d, "a b c a b c") for d in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = heaps_fit(df).collect()[0]
        assert out["total_types"] == 3
        assert out["heaps_beta"] < 0.35

    def test_python_reference(self, spark):
        import math

        from streamkit_spark.functions.text import heaps_fit

        rows = [(0, "a b c"), (1, "a d"), (2, "e f g a"), (3, "b e h")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = heaps_fit(df).collect()[0]
        ct, cv, seen, pts = 0, 0, set(), []
        for _, text in rows:
            toks = text.split()
            ct += len(toks)
            new = [t for t in set(toks) if t not in seen]
            seen.update(new)
            cv += len(new)
            pts.append((math.log(ct), math.log(cv)))
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        sxx = sum(p[0] ** 2 for p in pts)
        beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert out["heaps_beta"] == pytest.approx(beta, abs=1e-4)
        assert out["total_types"] == 8
