"""Worker-presence membership stream (T9 analog) and subscription
liveness surface (T5 analog)."""

from __future__ import annotations

import shutil
import time

from streamkit_spark.streaming.liveness import LivenessListener
from streamkit_spark.streaming.presence import subscribe_presence

HB_SCHEMA = "worker_id string, ts long"


def _drop_file(spark, tmp_path, src_dir, name, rows):
    df = spark.createDataFrame(rows, HB_SCHEMA)
    stage = tmp_path / f"stage-{name}"
    df.coalesce(1).write.mode("overwrite").parquet(str(stage))
    for f in stage.glob("*.parquet"):
        shutil.copy(f, src_dir / f"{name}.parquet")


def test_presence_join_snapshot_then_ttl_eviction(spark, tmp_path):
    """Join → snapshot shows both workers online; silence for > TTL (in
    event time) → the silent worker is evicted, the live one stays
    (reference: snapshot-on-join pkg/api/worker_presence.go:32-66, sweeper
    worker_presence_presence.go:22-91)."""
    src = tmp_path / "hb"
    src.mkdir()
    _drop_file(spark, tmp_path, src, "b1", [("w1", 1000), ("w2", 1200)])

    hb = spark.readStream.schema(HB_SCHEMA).parquet(str(src))
    q = subscribe_presence(hb, "presence_t9", ttl_ms=3000)
    try:
        q.processAllAvailable()
        snap = {
            r["worker_id"]: r["status"]
            for r in spark.sql("SELECT * FROM presence_t9").collect()
        }
        assert snap == {"w1": "online", "w2": "online"}

        # w1 keeps heartbeating; w2 goes silent.  Event time advances far
        # past w2's TTL (1200 + 3000), watermark follows, sweeper fires.
        _drop_file(spark, tmp_path, src, "b2", [("w1", 10_000)])
        q.processAllAvailable()
        # one more batch so the advanced watermark is applied to state
        _drop_file(spark, tmp_path, src, "b3", [("w1", 11_000)])
        q.processAllAvailable()

        rows = spark.sql(
            "SELECT * FROM presence_t9 ORDER BY worker_id, n_heartbeats"
        ).collect()
        latest = {}
        for r in rows:  # update-mode memory sink appends; last row wins
            latest[r["worker_id"]] = r
        assert latest["w2"]["status"] == "evicted"
        assert latest["w2"]["n_heartbeats"] == 1
        assert latest["w1"]["status"] == "online"
        assert latest["w1"]["last_seen"] == 11_000
        assert latest["w1"]["n_heartbeats"] == 3
    finally:
        q.stop()


def test_liveness_listener_heartbeats(spark, tmp_path):
    """T5 analog: per-query heartbeat rows from the listener bus; stale
    queries flip alive=False after the timeout (node.go:685-720)."""
    listener = LivenessListener(timeout_ms=60_000)
    spark.streams.addListener(listener)
    src = tmp_path / "hb"
    src.mkdir()
    _drop_file(spark, tmp_path, src, "b1", [("w1", 1000)])
    q = (
        spark.readStream.schema(HB_SCHEMA)
        .parquet(str(src))
        .writeStream.format("memory")
        .queryName("liveness_probe")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        deadline = time.time() + 10
        while time.time() < deadline and not listener.alive("liveness_probe"):
            time.sleep(0.2)  # listener bus is async
        assert listener.alive("liveness_probe")
        hb = {r["name"]: r for r in listener.heartbeat()}
        assert hb["liveness_probe"]["age_ms"] >= 0
        # silence beyond the timeout → stale
        future = listener.heartbeat()[0]["last_event_ms"] + 120_000
        assert not listener.alive("liveness_probe", now_ms=future)
    finally:
        q.stop()
        spark.streams.removeListener(listener)
