"""Streaming EWMA anomaly detection: kernel math, cross-batch baseline,
outlier exclusion from the baseline."""

from __future__ import annotations

import shutil

from streamkit_spark.streaming.anomaly import ewma_step, subscribe_anomalies

EV_SCHEMA = "event_type string, ts long, value double"


def _drop_file(spark, tmp_path, src_dir, name, rows):
    df = spark.createDataFrame(rows, EV_SCHEMA)
    stage = tmp_path / f"stage-{name}"
    df.coalesce(1).write.mode("overwrite").parquet(str(stage))
    for f in stage.glob("*.parquet"):
        shutil.copy(f, src_dir / f"{name}.parquet")


def test_ewma_step_kernel():
    mean, var, n = 0.0, 0.0, 0
    for x in [10.0, 10.0, 10.0]:
        mean, var, n = ewma_step(mean, var, n, x, alpha=0.2)
    assert (mean, n) == (10.0, 3) and var == 0.0
    mean2, var2, n2 = ewma_step(mean, var, n, 20.0, alpha=0.2)
    assert mean2 == 12.0  # 10 + 0.2*10
    assert var2 > 0


def test_spike_flagged_against_cross_batch_baseline(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    # batch 1: a steady baseline around 50 (warm-up + tight variance)
    base = [("click", 1000 + i, 50.0 + (i % 5 - 2) * 0.5) for i in range(40)]
    _drop_file(spark, tmp_path, src, "b1", base)

    ev = spark.readStream.schema(EV_SCHEMA).parquet(str(src))
    q = subscribe_anomalies(ev, "anom_sink", alpha=0.1, z_threshold=4.0, min_obs=10)
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM anom_sink").count() == 0

        # batch 2: normal points + one spike — detected against the
        # baseline STATE carried from batch 1
        b2 = [("click", 2000 + i, 50.0 + (i % 3 - 1) * 0.5) for i in range(5)]
        b2.append(("click", 2100, 500.0))
        b2.append(("click", 2200, 50.5))  # post-spike normality survives
        _drop_file(spark, tmp_path, src, "b2", b2)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM anom_sink").collect()
        assert [(r["ts"], r["value"]) for r in rows] == [(2100, 500.0)]
        assert abs(rows[0]["z"]) > 4.0

        # batch 3: the spike was excluded from the baseline, so a point
        # near the OLD baseline is still normal (a naive EWMA that ate
        # the spike would have drifted its mean far upward)
        _drop_file(spark, tmp_path, src, "b3", [("click", 3000, 51.0)])
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM anom_sink").count() == 1
    finally:
        q.stop()
