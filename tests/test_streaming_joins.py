"""Stream-stream interval join (streaming/joins.interval_join):
batch==stream parity, interval bounds, watermark state eviction plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamkit_spark.streaming.joins import interval_join

CLICKS = [
    # (click_id, ts-ms, user)
    (1, 1_000, 7),
    (2, 5_000, 7),
    (3, 9_000, 8),
    (4, 50_000, 9),
]
BUYS = [
    # (buy_id, ts-ms, user) — buy pairs with clicks within [0, 10s]
    (101, 6_000, 7),   # joins clicks 1 (dt=5s) and 2 (dt=1s)
    (102, 12_000, 8),  # joins click 3 (dt=3s)
    (103, 90_000, 9),  # too late for click 4 (dt=40s) — no pair
]
EXPECTED = {(1, 101), (2, 101), (3, 102)}


def _frames(spark):
    clicks = spark.createDataFrame(CLICKS, "click_id long, ts long, user long")
    buys = spark.createDataFrame(BUYS, "buy_id long, ts long, user long")
    return clicks, buys


def test_batch_interval_join_pairs_within_bounds(spark):
    clicks, buys = _frames(spark)
    out = interval_join(clicks, buys, keys=["user"], lower_ms=0, upper_ms=10_000)
    got = {(r["click_id"], r["buy_id"]) for r in out.collect()}
    assert got == EXPECTED


def test_stream_equals_batch_interval_join(spark, tmp_path):
    clicks, buys = _frames(spark)
    cpath, bpath = str(tmp_path / "clicks"), str(tmp_path / "buys")
    clicks.repartition(1).write.parquet(cpath)
    buys.repartition(1).write.parquet(bpath)
    cs = spark.readStream.schema(clicks.schema).parquet(cpath)
    bs = spark.readStream.schema(buys.schema).parquet(bpath)

    out = interval_join(cs, bs, keys=["user"], lower_ms=0, upper_ms=10_000)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sj_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["click_id"], r["buy_id"])
            for r in spark.sql("SELECT * FROM sj_out").collect()
        }
    finally:
        q.stop()
    assert got == EXPECTED


def test_streaming_join_state_is_watermark_bounded(spark, tmp_path):
    """The physical plan must carry watermarks on BOTH sides and a
    StreamingSymmetricHashJoin — the eviction-capable operator; without
    provable bounds Spark raises or plans unbounded state."""
    clicks, buys = _frames(spark)
    cpath, bpath = str(tmp_path / "c2"), str(tmp_path / "b2")
    clicks.repartition(1).write.parquet(cpath)
    buys.repartition(1).write.parquet(bpath)
    cs = spark.readStream.schema(clicks.schema).parquet(cpath)
    bs = spark.readStream.schema(buys.schema).parquet(bpath)
    out = interval_join(cs, bs, keys=["user"], lower_ms=0, upper_ms=10_000)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sj_plan")
        .start()
    )
    try:
        q.processAllAvailable()
        prog = q.lastProgress
        assert prog is not None and prog["stateOperators"], "no stateful operator planned"
        op = prog["stateOperators"][0]["operatorName"]
        assert "symmetricHashJoin" in op or "Join" in op
    finally:
        q.stop()
