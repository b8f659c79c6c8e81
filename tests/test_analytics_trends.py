"""Gap-filled daily counts, raw transition matrix, and event-type
PageRank (analytics.gap_filled_daily / transition_matrix /
event_pagerank) — unit semantics on hand-built frames plus an
independent pure-Python PageRank reference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamkit_spark import tables
from streamkit_spark.functions.analytics import (
    event_pagerank,
    gap_filled_daily,
    transition_matrix,
)
from tests.conftest import SF_DIR

DAY = 86_400_000  # ms


def _ev_frame(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts long, event_id long"
    )


# ------------------------------------------------------------ gap filling

def test_gap_filled_zero_materializes_missing_days(spark):
    df = spark.createDataFrame(
        [("a", 0 * DAY), ("a", 0 * DAY), ("a", 3 * DAY), ("b", 1 * DAY)],
        "event_type string, ts_ms long",
    )
    got = {
        (r["event_type"], r["day"]): (r["n"], r["observed"])
        for r in gap_filled_daily(df, "event_type", "ts_ms").collect()
    }
    # global day span 0..3 for BOTH groups (spine is global bounds x groups)
    assert len(got) == 8
    assert got[("a", 0)] == (2, True)
    assert got[("a", 1)] == (0, False)
    assert got[("a", 2)] == (0, False)
    assert got[("a", 3)] == (1, True)
    assert got[("b", 1)] == (1, True)
    assert got[("b", 0)] == (0, False)
    assert got[("b", 3)] == (0, False)


def test_gap_filled_ffill_carries_last_observed(spark):
    df = spark.createDataFrame(
        [("a", 1 * DAY), ("a", 1 * DAY), ("a", 4 * DAY), ("b", 0 * DAY)],
        "event_type string, ts_ms long",
    )
    got = {
        (r["event_type"], r["day"]): r["n"]
        for r in gap_filled_daily(df, "event_type", "ts_ms", fill="ffill").collect()
    }
    # before first observation: 0; gaps carry the last observed count
    assert got[("a", 0)] == 0
    assert got[("a", 1)] == 2
    assert got[("a", 2)] == 2
    assert got[("a", 3)] == 2
    assert got[("a", 4)] == 1
    assert got[("b", 0)] == 1
    assert got[("b", 4)] == 1  # carried from day 0


def test_gap_filled_rejects_unknown_fill(spark):
    df = spark.createDataFrame([("a", 0)], "event_type string, ts_ms long")
    with pytest.raises(ValueError, match="unknown fill"):
        gap_filled_daily(df, "event_type", "ts_ms", fill="bogus")


# ------------------------------------------------------ transition matrix

def test_transition_matrix_counts_and_null_handling(spark):
    df = _ev_frame(
        spark,
        [
            (1, "a", 10, 1),
            (1, "b", 20, 2),
            (1, "a", 30, 3),
            (1, None, 40, 4),  # NULL-typed events are dropped pre-lag
            (1, "b", 50, 5),
            (2, "a", 10, 1),
            (2, "b", 20, 2),
            (3, "solo", 10, 1),  # single event -> no transition
        ],
    )
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in transition_matrix(df).collect()
    }
    # user 1 (null removed): a->b, b->a, a->b ; user 2: a->b
    assert got == {("a", "b"): 3, ("b", "a"): 1}


def test_transition_matrix_orders_by_ts_then_tiebreak(spark):
    df = _ev_frame(spark, [(1, "x", 10, 2), (1, "y", 10, 1), (1, "z", 5, 9)])
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in transition_matrix(df).collect()
    }
    # order: z (ts=5), y (ts=10,id=1), x (ts=10,id=2)
    assert got == {("z", "y"): 1, ("y", "x"): 1}


# ------------------------------------------------------------- pagerank

def _reference_pagerank(edges, iters=10, damping=0.85):
    """Independent dense-matrix reference (no fold-order tricks)."""
    states = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges})
    k = len(states)
    ix = {s: i for i, s in enumerate(states)}
    out = [0.0] * k
    for a, _, n in edges:
        out[ix[a]] += n
    pi = [1.0 / k] * k
    for _ in range(iters):
        dm = sum(pi[i] for i in range(k) if out[i] == 0.0)
        new = [(1.0 - damping) / k + damping * dm / k] * k
        for a, b, n in edges:
            new[ix[b]] += damping * pi[ix[a]] * (n / out[ix[a]])
        pi = new
    return dict(zip(states, pi))


def test_event_pagerank_matches_reference_and_sums_to_one(spark):
    # a -> b twice, b -> c once, c dangling
    df = _ev_frame(
        spark,
        [
            (1, "a", 10, 1), (1, "b", 20, 2),
            (2, "a", 10, 1), (2, "b", 20, 2), (2, "c", 30, 3),
        ],
    )
    got = {r["state"]: r["rank"] for r in event_pagerank(df).collect()}
    edges = [("a", "b", 2), ("b", "c", 1)]
    ref = _reference_pagerank(edges)
    assert set(got) == set(ref)
    for s in ref:
        assert got[s] == pytest.approx(ref[s], abs=1.5e-4)
    # damped pagerank with dangling redistribution is a distribution
    assert sum(got.values()) == pytest.approx(1.0, abs=5e-4)
    # sink state c accumulates the most mass
    assert got["c"] > got["b"] > got["a"]


def test_event_pagerank_empty_input(spark):
    df = _ev_frame(spark, [])
    assert event_pagerank(df).collect() == []
    # a single event produces no transitions either
    df1 = _ev_frame(spark, [(1, "a", 10, 1)])
    assert event_pagerank(df1).collect() == []


def test_event_pagerank_max_states_cap(spark):
    df = _ev_frame(
        spark,
        [(1, "a", 10, 1), (1, "b", 20, 2), (1, "c", 30, 3)],
    )
    with pytest.raises(ValueError, match="distinct states exceeds"):
        event_pagerank(df, max_states=2)
    with pytest.raises(ValueError, match="max_states must be"):
        event_pagerank(df, max_states=0)
    with pytest.raises(ValueError, match="exceeds max_edges"):
        event_pagerank(df, max_edges=1)


def test_event_pagerank_null_types_do_not_crash(spark):
    df = _ev_frame(
        spark, [(1, "a", 10, 1), (1, None, 20, 2), (1, "b", 30, 3)]
    )
    got = {r["state"]: r["rank"] for r in event_pagerank(df).collect()}
    assert set(got) == {"a", "b"}


def test_event_pagerank_on_fixture_is_a_distribution(spark):
    ev = tables.load(spark, SF_DIR, "events")
    got = event_pagerank(ev, "user_id", "event_type", ("ts", "event_id"))
    rows = got.collect()
    assert len(rows) >= 2
    assert sum(r["rank"] for r in rows) == pytest.approx(1.0, abs=1e-3)


# ---------------------------------------------------------- rank buckets

def test_rank_buckets_exact_deciles(spark):
    from streamkit_spark.functions.analytics import rank_buckets

    # scores 0..99, one row each -> bucket = score // 10
    df = spark.createDataFrame([(i, i) for i in range(100)], "id long, s long")
    got = {r["id"]: r["bucket"] for r in rank_buckets(df, "s").collect()}
    assert got == {i: i // 10 for i in range(100)}


def test_rank_buckets_ties_share_a_bucket(spark):
    from streamkit_spark.functions.analytics import rank_buckets

    # 60% of rows share one score: they all land in ONE bucket (ties
    # never split), and the bucket is chosen by strictly-smaller rank
    rows = [(i, 5) for i in range(60)] + [(60 + i, 100 + i) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, s long")
    got = {r["id"]: r["bucket"] for r in rank_buckets(df, "s", 10).collect()}
    assert {got[i] for i in range(60)} == {0}
    assert got[60] == 6  # 60 smaller rows / 100 * 10
    assert got[99] == 9


def test_rank_buckets_nulls_and_validation(spark):
    import pytest as _pt

    from streamkit_spark.functions.analytics import rank_buckets

    df = spark.createDataFrame([(1, 10), (2, None), (3, 20)], "id long, s long")
    got = {r["id"]: r["bucket"] for r in rank_buckets(df, "s", 2).collect()}
    assert got[2] is None
    assert got[1] == 0 and got[3] == 1
    with _pt.raises(ValueError, match="n_buckets"):
        rank_buckets(df, "s", 0)


# ------------------------------------------------------ user accumulation

def test_user_accumulation_first_day_semantics(spark):
    from streamkit_spark.functions.analytics import user_accumulation

    DAY_MS = 86_400_000
    rows = [
        (1, 0 * DAY_MS), (1, 2 * DAY_MS),   # user 1 first seen day 0
        (2, 0 * DAY_MS),                     # user 2 day 0
        (3, 2 * DAY_MS), (3, 2 * DAY_MS),   # user 3 day 2 (dup events)
        (4, 5 * DAY_MS),                     # user 4 day 5
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long")
    got = {
        r["day"]: (r["new_users"], r["cum_users"])
        for r in user_accumulation(df).collect()
    }
    # only days with NEW users appear; returning users never re-count
    assert got == {0: (2, 2), 2: (1, 3), 5: (1, 4)}


# ------------------------------------------------------------- ewma smooth

def test_ewma_smooth_matches_python_fold(spark):
    import pytest as _pt

    from streamkit_spark.functions.analytics import ewma_smooth

    rows = [("a", 1, 10), ("a", 2, 0), ("a", 3, 20), ("b", 1, 5)]
    df = spark.createDataFrame(rows, "g string, day long, n long")
    got = {
        (r["g"], r["day"]): (r["n"], r["ewma"])
        for r in ewma_smooth(df, "g", "day", "n", alpha=0.3).collect()
    }

    def ref(xs, alpha=0.3):
        s = float(xs[0])
        out = [s]
        for x in xs[1:]:
            s = alpha * x + (1.0 - alpha) * s
            out.append(s)
        return out

    ra = ref([10, 0, 20])
    assert got[("a", 1)] == (10, round(ra[0], 4))
    assert got[("a", 2)] == (0, round(ra[1], 4))
    assert got[("a", 3)] == (20, round(ra[2], 4))
    assert got[("b", 1)] == (5, 5.0)
    with _pt.raises(ValueError, match="alpha"):
        ewma_smooth(df, "g", "day", "n", alpha=0.0)
