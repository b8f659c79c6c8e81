"""Continuously-maintained rollup: batch==stream parity, incremental
partition upsert, replay idempotence."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from streamkit_spark.streaming.rollup import (
    maintain_rollup,
    read_rollup,
    rollup_aggregate,
)

EV_SCHEMA = "ts long, event_type string, value double"
DAY_NS = 86_400_000_000_000


def _drop_file(spark, tmp_path, src_dir, name, rows):
    df = spark.createDataFrame(rows, EV_SCHEMA)
    stage = tmp_path / f"stage-{name}"
    df.coalesce(1).write.mode("overwrite").parquet(str(stage))
    for f in stage.glob("*.parquet"):
        shutil.copy(f, src_dir / f"{name}.parquet")


def _rollup_dict(df):
    return {
        (r["day"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in df.collect()
    }


def test_rollup_matches_batch_and_upserts_incrementally(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    out = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    b1 = [
        (0 * DAY_NS + 1000, "click", 1.5),
        (0 * DAY_NS + 2000, "click", 2.5),
        (0 * DAY_NS + 3000, "view", 10.0),
        (1 * DAY_NS + 1000, "click", 4.0),
    ]
    _drop_file(spark, tmp_path, src, "b1", b1)
    ev = spark.readStream.schema(EV_SCHEMA).parquet(str(src))
    # lateness must span the cross-batch update below: with "0 seconds"
    # the day-1 window would close after batch 1 and b2's day-1 row
    # would be (correctly) dropped as late
    q = maintain_rollup(ev, out, ckpt, late="3 days")
    try:
        q.processAllAvailable()
        got1 = _rollup_dict(read_rollup(spark, out))
        assert got1[("1970-01-01", "click")] == (2, 4.0)
        assert got1[("1970-01-01", "view")] == (1, 10.0)
        assert got1[("1970-01-02", "click")] == (1, 4.0)

        # a second batch touches ONE (day, type) group and adds another;
        # untouched partitions must survive the dynamic overwrite
        b2 = [
            (0 * DAY_NS + 5000, "click", 1.0),
            (2 * DAY_NS + 1000, "error", 7.0),
        ]
        _drop_file(spark, tmp_path, src, "b2", b2)
        q.processAllAvailable()
        got2 = _rollup_dict(read_rollup(spark, out))
        assert got2[("1970-01-01", "click")] == (3, 5.0)  # updated total
        assert got2[("1970-01-01", "view")] == (1, 10.0)  # untouched survives
        assert got2[("1970-01-03", "error")] == (1, 7.0)  # new partition
    finally:
        q.stop()

    # batch backfill over the same raw events produces the same table
    batch = rollup_aggregate(spark.read.schema(EV_SCHEMA).parquet(str(src)))
    assert _rollup_dict(batch) == got2


def test_rollup_upsert_is_replay_idempotent(spark, tmp_path):
    out = str(tmp_path / "rollup2")
    batch = spark.createDataFrame(
        [("1970-01-01", "click", 2, 4.0)],
        "day string, event_type string, n_events long, value_sum double",
    )
    for _ in range(2):  # at-least-once redelivery of the same totals
        (
            batch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day", "event_type")
            .parquet(out)
        )
    got = _rollup_dict(read_rollup(spark, out))
    assert got == {("1970-01-01", "click"): (2, 4.0)}
