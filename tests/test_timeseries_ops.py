"""Edge semantics for as-of join, range join, sessionization, tumbling."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamkit_spark.operators.asof import asof_join, range_join
from streamkit_spark.operators.windows import session_stats, sessionize, tumbling_agg


def test_asof_backward_inclusive_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, "k", 100), (2, "k", 200), (3, "k", 50), (4, "other", 500)],
        "id long, k string, t long",
    )
    right = spark.createDataFrame(
        [(10, "k", 100), (11, "k", 150), (12, "zzz", 1)],
        "rid long, k string, t long",
    )
    out = {
        r["id"]: (r["t_asof"], r["rid"])
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t", right_cols=["rid"]
        ).collect()
    }
    assert out[1] == (100, 10)  # equal ts: inclusive
    assert out[2] == (150, 11)  # latest at-or-before
    assert out[3] == (None, None)  # nothing before → nulls
    assert out[4] == (None, None)  # key with no right rows at all


def test_asof_picks_latest_of_equal_ts_right_rows(spark):
    left = spark.createDataFrame([(1, "k", 10)], "id long, k string, t long")
    right = spark.createDataFrame(
        [(7, "k", 10), (8, "k", 10)], "rid long, k string, t long"
    )
    row = asof_join(
        left, right, on="k", left_ts="t", right_ts="t", right_cols=["rid"]
    ).first()
    # last in (ts, input-order) wins — deterministic given ordered input ids
    assert row["rid"] in (7, 8) and row["t_asof"] == 10


def test_range_join_band_inclusive(spark):
    left = spark.createDataFrame([(1, "k", 1000)], "id long, k string, t long")
    right = spark.createDataFrame(
        [(10, "k", 900), (11, "k", 1100), (12, "k", 1101), (13, "x", 1000)],
        "rid long, k string, t long",
    )
    got = sorted(
        r["r_rid"]
        for r in range_join(left, right, on="k", left_ts="t", right_ts="t", band_ms=100).collect()
    )
    assert got == [10, 11]  # 1101 outside band (inclusive ±100); x key excluded


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    # a pair near a bucket boundary must appear exactly once
    left = spark.createDataFrame([(1, "k", 199)], "id long, k string, t long")
    right = spark.createDataFrame([(10, "k", 201)], "rid long, k string, t long")
    rows = range_join(left, right, on="k", left_ts="t", right_ts="t", band_ms=100).collect()
    assert len(rows) == 1


def test_sessionize_gap_boundary(spark):
    df = spark.createDataFrame(
        [("u", 0), ("u", 1000), ("u", 2001), ("u", 2500)], "k string, t long"
    )
    out = sessionize(df, "k", F.col("t"), gap_ms=1000).orderBy("t").collect()
    # gap == 1000 continues the session (strictly greater starts a new one)
    assert [r["session_id"] for r in out] == [1, 1, 2, 2]


def test_session_stats_counts(spark):
    df = spark.createDataFrame(
        [("u", 0), ("u", 100), ("u", 5000), ("v", 7)], "k string, t long"
    )
    out = {
        r["k"]: (r["n_sessions"], r["n_events"], r["longest_session_ms"])
        for r in session_stats(df, "k", F.col("t"), gap_ms=1000).collect()
    }
    assert out == {"u": (2, 3, 100), "v": (1, 1, 0)}


def test_tumbling_window_ids(spark):
    df = spark.createDataFrame(
        [("a", 0), ("a", 999), ("a", 1000), ("b", 2500)], "k string, t long"
    )
    out = {
        (r["window_id"], r["k"]): r["n"]
        for r in tumbling_agg(
            df, F.col("t"), 1000, ["k"], [F.count("*").alias("n")]
        ).collect()
    }
    assert out == {(0, "a"): 2, (1, "a"): 1, (2, "b"): 1}


def test_rolling_daily_counts_window_and_gaps(spark):
    from streamkit_spark.operators.windows import rolling_daily_counts

    day = 86_400_000
    rows = [
        # user 1: days 0, 1, 8 (day 8 is outside day 1's 7-day window)
        (1, 0 * day), (1, 0 * day + 5), (1, 1 * day), (1, 8 * day),
        # user 2: single burst
        (2, 3 * day), (2, 3 * day), (2, 3 * day),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long")
    got = {
        (r["user_id"], r["day"]): (r["n_events"], r["n_rolling"])
        for r in rolling_daily_counts(df, "user_id", F.col("ts_ms")).collect()
    }
    assert got == {
        (1, 0): (2, 2),
        (1, 1): (1, 3),   # day 0 still in range
        (1, 8): (1, 1),   # days 0-1 aged out (range, not rows: gap days count)
        (2, 3): (3, 3),
    }


def test_funnel_strict_ordering(spark):
    from streamkit_spark.operators.windows import funnel_counts

    rows = [
        # user 1 converts fully in order
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # user 2: purchase BEFORE click -> counts for view+click only
        (2, "view", 10), (2, "purchase", 15), (2, "click", 20),
        # user 3: click with no prior view -> counts for nothing past step 0? no view at all
        (3, "click", 5), (3, "purchase", 6),
        # user 4: click at SAME ts as view -> strict > excludes the click
        (4, "view", 50), (4, "click", 50),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts_ms long")
    got = {
        r["event_type"]: r["n_keys"]
        for r in funnel_counts(
            df, ["view", "click", "purchase"], key="user_id", ts_ms=F.col("ts_ms")
        ).collect()
    }
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_asof_forward_inclusive_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, "k", 100), (2, "k", 200), (3, "k", 160), (4, "other", 5)],
        "id long, k string, t long",
    )
    right = spark.createDataFrame(
        [(10, "k", 100), (11, "k", 150), (12, "zzz", 999)],
        "rid long, k string, t long",
    )
    out = {
        r["id"]: (r["t_asof"], r["rid"])
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t",
            right_cols=["rid"], direction="forward",
        ).collect()
    }
    assert out[1] == (100, 10)  # equal ts: inclusive
    assert out[3] == (None, None)  # nothing at-or-after 160
    assert out[2] == (None, None)
    assert out[4] == (None, None)


def test_asof_tolerance_nulls_far_matches(spark):
    left = spark.createDataFrame(
        [(1, "k", 100), (2, "k", 500)], "id long, k string, t long"
    )
    right = spark.createDataFrame([(10, "k", 90)], "rid long, k string, t long")
    out = {
        r["id"]: (r["t_asof"], r["rid"])
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t",
            right_cols=["rid"], tolerance=50,
        ).collect()
    }
    assert out[1] == (90, 10)  # within 50
    assert out[2] == (None, None)  # 410 away → nulled, row kept
    # forward with tolerance
    out_f = {
        r["id"]: r["rid"]
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t",
            right_cols=["rid"], direction="forward", tolerance=50,
        ).collect()
    }
    assert out_f == {1: None, 2: None}


def test_asof_rejects_unknown_direction(spark):
    import pytest

    df = spark.createDataFrame([(1, "k", 1)], "id long, k string, t long")
    with pytest.raises(ValueError, match="unknown direction"):
        asof_join(df, df, on="k", left_ts="t", right_ts="t", direction="nearest")


def test_funnel_timing_hand_computed(spark):
    from streamkit_spark.operators.windows import funnel_timing

    rows = [
        # u1: click@10 -> purchase@30 (delta 20); earlier purchase@5 ignored
        (1, "click", 10), (1, "purchase", 5), (1, "purchase", 30),
        # u2: click@100 -> purchase@200 (delta 100), second purchase later
        (2, "click", 100), (2, "purchase", 200), (2, "purchase", 900),
        # u3: click only -> no conversion
        (3, "click", 50),
        # u4: purchase before any click -> no conversion
        (4, "purchase", 10),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, t long")
    r = funnel_timing(
        df, "click", "purchase", ts_ms=F.col("t")
    ).first()
    assert (r["n_start"], r["n_converted"]) == (3, 2)
    assert r["conv_rate"] == round(2 / 3, 4)
    # deltas [20, 100]: interpolated p50 = 60, p90 = 92
    assert r["p50_ms"] == 60.0
    assert r["p90_ms"] == 92.0
    assert r["max_ms"] == 100


def test_funnel_timing_no_conversions(spark):
    from streamkit_spark.operators.windows import funnel_timing

    df = spark.createDataFrame(
        [(1, "click", 10)], "user_id long, event_type string, t long"
    )
    r = funnel_timing(df, "click", "purchase", ts_ms=F.col("t")).first()
    assert (r["n_start"], r["n_converted"], r["conv_rate"]) == (1, 0, 0.0)
    assert r["p50_ms"] is None and r["max_ms"] is None
