"""Streaming window operators: tumbling, session, custom stateful status."""

from __future__ import annotations

from streamkit_spark.operators.produce import Store
from streamkit_spark.streaming.subscribe import events_stream
from streamkit_spark.streaming.windows import (
    running_segment_status,
    session_counts,
    tumbling_counts,
)

MIN = 60_000


def _store(spark, tmp_path):
    store = Store(spark, str(tmp_path / "store"))
    # two segments; g0 spans two 1-minute windows, g1 one
    store.produce("s0", "g0", [(1, b"x", None), (2, b"x", None)], now_ms=0)
    store.produce("s0", "g0", [(3, b"x", None)], now_ms=MIN + 1000)
    store.produce("s0", "g1", [(1, b"x", None)], now_ms=30_000)
    return store


def test_tumbling_counts_streaming(spark, tmp_path):
    store = _store(spark, tmp_path)
    agg = tumbling_counts(events_stream(spark, store.events_path), "1 minute")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("tumble_out").start()
    )
    try:
        q.processAllAvailable()
        # append mode: emitted windows are those the watermark closed; a
        # final empty batch isn't forced, so assert on the update-mode total
        # via a fresh complete-mode query instead
    finally:
        q.stop()
    q2 = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("tumble_all").start()
    )
    try:
        q2.processAllAvailable()
        rows = {
            (r["window_start_ms"], r["segment"]): (r["n"], r["max_sequence"])
            for r in spark.sql("SELECT * FROM tumble_all").collect()
        }
        assert rows == {
            (0, "g0"): (2, 2),
            (MIN, "g0"): (1, 3),
            (0, "g1"): (1, 1),
        }
    finally:
        q2.stop()


def test_session_counts_streaming(spark, tmp_path):
    store = Store(spark, str(tmp_path / "store"))
    # one key: events at 0s, 10s (same session, gap 1min), then 10min (new)
    store.produce("s0", "g0", [(1, b"x", None)], now_ms=0)
    store.produce("s0", "g0", [(2, b"x", None)], now_ms=10_000)
    store.produce("s0", "g0", [(3, b"x", None)], now_ms=10 * MIN)
    agg = session_counts(events_stream(spark, store.events_path), gap="1 minute")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("sess_out").start()
    )
    try:
        q.processAllAvailable()
        rows = sorted(
            (r["session_start_ms"], r["n"])
            for r in spark.sql("SELECT * FROM sess_out").collect()
        )
        assert rows == [(0, 2), (10 * MIN, 1)]
    finally:
        q.stop()


def test_running_segment_status_stateful(spark, tmp_path):
    store = _store(spark, tmp_path)
    agg = running_segment_status(events_stream(spark, store.events_path))
    q = (
        agg.writeStream.outputMode("update")
        .format("memory").queryName("state_out").start()
    )
    try:
        q.processAllAvailable()
        # latest row per key
        rows = spark.sql(
            """
            SELECT space, segment, first_sequence, first_ts,
                   last_sequence, last_ts FROM state_out
            """
        ).collect()
        latest = {}
        for r in rows:
            latest[(r["space"], r["segment"])] = (
                r["first_sequence"], r["first_ts"], r["last_sequence"], r["last_ts"]
            )
        assert latest[("s0", "g0")] == (1, 0, 3, MIN + 1000)
        assert latest[("s0", "g1")] == (1, 30_000, 1, 30_000)
    finally:
        q.stop()

    # state persists across micro-batches: append more, restart the query
    store.produce("s0", "g1", [(2, b"x", None)], now_ms=2 * MIN)
    q2 = (
        agg.writeStream.outputMode("update")
        .format("memory").queryName("state_out2").start()
    )
    try:
        q2.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM state_out2 WHERE segment = 'g1'"
        ).collect()
        best = max(rows, key=lambda r: r["last_sequence"])
        assert (best["first_sequence"], best["last_sequence"]) == (1, 2)
    finally:
        q2.stop()
