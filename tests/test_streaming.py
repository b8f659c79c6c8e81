"""Streaming layer: subscription snapshot→live contract, update-mode
coalescing, at-least-once dedup, watermark fence semantics."""

from __future__ import annotations

import time

import pytest

from streamkit_spark.operators.produce import Store
from streamkit_spark.streaming.subscribe import (
    at_least_once_dedup,
    events_stream,
    subscribe_segment_status,
)
from streamkit_spark.streaming.watermark import SpaceWatermarks


def recs(start, n):
    return [(start + i, b"p", None) for i in range(n)]


def test_subscription_snapshot_then_live(spark, tmp_path):
    store = Store(spark, str(tmp_path / "store"))
    store.produce("s0", "g0", recs(1, 3), now_ms=100)
    store.produce("s0", "g1", recs(1, 2), now_ms=110)

    q = subscribe_segment_status(
        spark, store.events_path, "sub_status",
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        snap = {
            (r["space"], r["segment"]): r["last_sequence"]
            for r in spark.sql("SELECT * FROM sub_status").collect()
        }
        assert snap == {("s0", "g0"): 3, ("s0", "g1"): 2}

        # live phase: new produce lands as an update
        store.produce("s0", "g0", recs(4, 2), now_ms=200)
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM sub_status WHERE space='s0' AND segment='g0'"
        ).collect()
        # update mode re-emits the key; latest row wins
        assert max(r["last_sequence"] for r in rows) == 5
        last = max(rows, key=lambda r: r["last_sequence"])
        assert last["last_ts"] == 200 and last["first_sequence"] == 1
    finally:
        q.stop()


def test_wildcard_vs_filtered_subscription(spark, tmp_path):
    store = Store(spark, str(tmp_path / "store"))
    store.produce("a", "g0", recs(1, 1), now_ms=10)
    store.produce("b", "g0", recs(1, 1), now_ms=20)
    q = subscribe_segment_status(
        spark, store.events_path, "sub_b", space="b", segment="*"
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT DISTINCT space FROM sub_b").collect()
        assert [r["space"] for r in rows] == ["b"]
    finally:
        q.stop()


def test_at_least_once_dedup(spark, tmp_path):
    store = Store(spark, str(tmp_path / "store"))
    store.produce("s0", "g0", recs(1, 3), now_ms=100)
    # simulate redelivery: write the same rows again (duplicate files)
    dup = store.events()
    dup.write.mode("append").partitionBy("space").parquet(store.events_path)
    assert store.events().count() == 6

    deduped = at_least_once_dedup(events_stream(spark, store.events_path))
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT space, segment, sequence FROM dedup_out").collect()
        assert len(out) == 3
        assert sorted(r["sequence"] for r in out) == [1, 2, 3]
    finally:
        q.stop()


def test_watermark_fence_semantics():
    """Mirrors space_watermarks_test.go behaviors: idle → now; active
    writer fences readers; earliest fence wins; peers order notifications."""
    wm = SpaceWatermarks()
    assert wm.safe_max_timestamp("s0", 1000) == 1000  # idle → now

    t1 = wm.begin("s0", 500)
    assert wm.safe_max_timestamp("s0", 1000) == 499  # fenced

    t2 = wm.begin("s0", 700)
    assert wm.safe_max_timestamp("s0", 1000) == 499  # min fence wins

    # t2 committed but t1 (earlier) still in flight → t2 must wait
    wm.note_committed("s0", t2, 710)
    assert not wm.visible_for_peers("s0", t2)
    wm.note_committed("s0", t1, 510)
    assert wm.visible_for_peers("s0", t2)

    wm.end("s0", t1)
    assert wm.safe_max_timestamp("s0", 1000) == 699
    wm.end("s0", t2)
    assert wm.safe_max_timestamp("s0", 1000) == 1000
    assert wm.last_committed_ts("s0") == 710

    # independent spaces don't interact
    wm.begin("other", 100)
    assert wm.safe_max_timestamp("s0", 2000) == 2000


def test_fenced_read_hides_in_flight_rows(spark, tmp_path):
    """End-to-end: reader clamped to the fence never sees rows committed
    by a later writer while an earlier writer is in flight."""
    from streamkit_spark.operators.consume import ConsumeBounds, consume_space

    store = Store(spark, str(tmp_path / "store"))
    wm = SpaceWatermarks()
    store.produce("s0", "g0", recs(1, 2), now_ms=100)

    slow = wm.begin("s0", 150)  # slow writer begins, hasn't committed
    fast = wm.begin("s0", 200)
    store.produce("s0", "g1", recs(1, 1), now_ms=200)  # fast writer commits
    wm.note_committed("s0", fast, 200)
    wm.end("s0", fast)

    safe = wm.safe_max_timestamp("s0", now_ms=300)
    assert safe == 149
    visible = consume_space(store.events(), "s0", ConsumeBounds(max_ts=safe))
    assert [r["sequence"] for r in visible.collect()] == [1, 2]  # g1 row hidden

    # slow writer finishes → fence lifts → row becomes visible
    store.produce("s0", "g0", recs(3, 1), now_ms=310)
    wm.note_committed("s0", slow, 310)
    wm.end("s0", slow)
    safe = wm.safe_max_timestamp("s0", now_ms=320)
    visible = consume_space(store.events(), "s0", ConsumeBounds(max_ts=safe))
    assert visible.count() == 4
