"""Token burstiness (text.burstiness_by_token) and inter-arrival stats
(analytics.interarrival_stats) — hand-computed frames."""

from __future__ import annotations

import pytest

from streamkit_spark.functions.analytics import interarrival_stats
from streamkit_spark.functions.text import burstiness_by_token


# -------------------------------------------------------------- burstiness

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_burstiness_hand_computed(spark):
    rows = [(1, "x x x"), (2, "y"), (3, "x y")]
    out = {
        r["token"]: r
        for r in burstiness_by_token(
            _docs(spark, rows), "doc_id", "text", min_df=2
        ).collect()
    }
    # x: df=2, total=4, sq=3^2+1^2=10, D=3 -> vmr=(30-16)/12, burst=2
    assert out["x"]["df"] == 2 and out["x"]["total"] == 4
    assert out["x"]["vmr"] == pytest.approx(14 / 12, abs=1e-4)
    assert out["x"]["burst"] == 2.0
    # y: df=2, total=2, sq=2 -> vmr=(6-4)/6, burst=1
    assert out["y"]["vmr"] == pytest.approx(2 / 6, abs=1e-4)
    assert out["y"]["burst"] == 1.0


def test_burstiness_uniform_token_vmr_zero(spark):
    # one "z" in every doc: variance over the collection is exactly 0
    rows = [(i, "z pad%d" % i) for i in range(4)]
    out = {
        r["token"]: r
        for r in burstiness_by_token(
            _docs(spark, rows), "doc_id", "text", min_df=1
        ).collect()
    }
    assert out["z"]["vmr"] == 0.0 and out["z"]["burst"] == 1.0


def test_burstiness_min_df_cut_and_nulls(spark):
    rows = [(1, "a b"), (2, "a"), (3, None), (None, "b b b")]
    out = {
        r["token"]
        for r in burstiness_by_token(
            _docs(spark, rows), "doc_id", "text", min_df=2
        ).collect()
    }
    assert out == {"a"}  # b has df=1 after NULL-row filtering


# ------------------------------------------------------------ interarrival

def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, user_id long, ts_ms long, event_id long"
    )


def test_interarrival_hand_computed(spark):
    # one user, gaps 10, 20, 30, 40 -> n=4, mean=25, median=(20+30)/2, p90
    # rank = ceil(0.9*4) = 4 -> 40
    rows = [("a", 1, t, i) for i, t in enumerate([0, 10, 30, 60, 100])]
    r = interarrival_stats(
        _ev(spark, rows), "event_type", "user_id", "ts_ms",
        order_cols=("event_id",),
    ).collect()[0]
    assert r["n_gaps"] == 4
    assert r["mean_gap"] == 25.0
    assert r["median_gap"] == 25.0
    assert r["p90_gap"] == 40


def test_interarrival_odd_n_and_multiple_users(spark):
    # user 1 gaps: 5, 15; user 2 gap: 10 -> pooled [5, 10, 15]: median 10,
    # p90 rank = ceil(2.7) = 3 -> 15
    rows = [("a", 1, 0, 1), ("a", 1, 5, 2), ("a", 1, 20, 3),
            ("a", 2, 100, 4), ("a", 2, 110, 5)]
    r = interarrival_stats(
        _ev(spark, rows), "event_type", "user_id", "ts_ms",
        order_cols=("event_id",),
    ).collect()[0]
    assert r["n_gaps"] == 3
    assert r["median_gap"] == 10.0
    assert r["p90_gap"] == 15


def test_interarrival_tie_timestamps_use_order_cols(spark):
    # two events at the same ts: event_id breaks the tie -> gaps 0 and 7
    rows = [("a", 1, 3, 2), ("a", 1, 3, 1), ("a", 1, 10, 3)]
    r = interarrival_stats(
        _ev(spark, rows), "event_type", "user_id", "ts_ms",
        order_cols=("event_id",),
    ).collect()[0]
    assert r["n_gaps"] == 2
    assert r["mean_gap"] == 3.5


def test_interarrival_groups_without_pairs_omitted(spark):
    rows = [("a", 1, 0, 1), ("a", 1, 9, 2), ("b", 2, 5, 3)]
    out = interarrival_stats(
        _ev(spark, rows), "event_type", "user_id", "ts_ms",
        order_cols=("event_id",),
    ).collect()
    assert [r["event_type"] for r in out] == ["a"]


# ------------------------------------------------------------ calibration

def test_calibration_perfect_ranker_monotone(spark):
    from streamkit_spark.functions.analytics import calibration_report

    # 100 rows, score = i, label = score >= 70: top 3 deciles pure 1.0,
    # the rest pure 0.0
    rows = [(float(i), i >= 70) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    out = calibration_report(df, "score", "label", n_buckets=10).collect()
    assert [r["bucket"] for r in out] == list(range(10))
    assert all(r["n"] == 10 for r in out)
    rates = [r["rate"] for r in out]
    assert rates == [0.0] * 7 + [1.0] * 3
    for r in out:
        assert r["lo"] <= r["rate"] <= r["hi"]
        assert r["min_score"] <= r["max_score"]
    # score ranges tile in bucket order
    for a, b in zip(out, out[1:]):
        assert a["max_score"] < b["min_score"]


def test_calibration_matches_manual_wilson_per_bucket(spark):
    import math

    from streamkit_spark.functions.analytics import calibration_report

    rows = [(float(i % 7), (i * 13) % 3 == 0) for i in range(84)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    out = {r["bucket"]: r for r in calibration_report(
        df, "score", "label", n_buckets=4
    ).collect()}
    total = sum(r["n"] for r in out.values())
    assert total == 84
    for r in out.values():
        n, s = r["n"], r["successes"]
        p = s / n
        z = 1.96
        denom = 1 + z * z / n
        center = (p + z * z / (2 * n)) / denom
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
        assert r["rate"] == round(p, 4)
        assert abs(r["lo"] - (center - half)) < 1e-3
        assert abs(r["hi"] - (center + half)) < 1e-3


def test_calibration_null_rows_filtered(spark):
    from streamkit_spark.functions.analytics import calibration_report

    rows = [(1.0, True), (2.0, False), (None, True), (3.0, None)]
    out = calibration_report(
        spark.createDataFrame(rows, "score double, label boolean"),
        "score", "label", n_buckets=2,
    ).collect()
    assert sum(r["n"] for r in out) == 2


def _py_auc(pairs):
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None
    u = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    return u / (len(pos) * len(neg))


def test_auc_matches_pairwise_reference_with_ties(spark):
    from streamkit_spark.functions.analytics import auc_report

    pairs = [(0.1, False), (0.4, False), (0.4, True), (0.35, False),
             (0.8, True), (0.8, True), (0.2, False), (0.9, True),
             (0.5, False), (0.45, True)]
    df = spark.createDataFrame(pairs, "score double, label boolean")
    r = auc_report(df, "score", "label").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (5, 5)
    assert r["auc"] == pytest.approx(_py_auc(pairs), abs=1e-4)


def test_auc_perfect_and_inverted_separators(spark):
    from streamkit_spark.functions.analytics import auc_report

    good = [(float(i), i >= 5) for i in range(10)]
    bad = [(float(-i), i >= 5) for i in range(10)]
    assert auc_report(
        spark.createDataFrame(good, "score double, label boolean"),
        "score", "label",
    ).collect()[0]["auc"] == 1.0
    assert auc_report(
        spark.createDataFrame(bad, "score double, label boolean"),
        "score", "label",
    ).collect()[0]["auc"] == 0.0


def test_auc_degenerate_classes(spark):
    from streamkit_spark.functions.analytics import auc_report

    all_true = spark.createDataFrame(
        [(1.0, True), (2.0, True)], "score double, label boolean"
    )
    r = auc_report(all_true, "score", "label").collect()
    assert len(r) == 1 and r[0]["auc"] is None  # no negatives
    all_false = spark.createDataFrame(
        [(1.0, False)], "score double, label boolean"
    )
    assert auc_report(all_false, "score", "label").collect() == []
