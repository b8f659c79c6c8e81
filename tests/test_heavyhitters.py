"""Streaming Misra–Gries heavy hitters: MG guarantees, bounded state,
cross-batch state carry."""

from __future__ import annotations

import random
import shutil
from collections import Counter

from streamkit_spark.streaming.heavyhitters import mg_update, subscribe_heavy_hitters

EV_SCHEMA = "event_type string, user_id string"


def _drop_file(spark, tmp_path, src_dir, name, rows):
    df = spark.createDataFrame(rows, EV_SCHEMA)
    stage = tmp_path / f"stage-{name}"
    df.coalesce(1).write.mode("overwrite").parquet(str(stage))
    for f in stage.glob("*.parquet"):
        shutil.copy(f, src_dir / f"{name}.parquet")


def test_mg_update_guarantees_any_order():
    rng = random.Random(7)
    # zipf-ish: one dominant item + noise
    items = ["hot"] * 400 + [f"u{i}" for i in range(300)]
    for k in (4, 8):
        for _ in range(3):
            rng.shuffle(items)
            counters: dict[str, int] = {}
            dec = mg_update(counters, items, k)
            true = Counter(items)
            n = len(items)
            assert len(counters) <= k
            # every item with true count > n/(k+1) must be present
            for it, c in true.items():
                if c > n / (k + 1):
                    assert it in counters, (k, it)
            # count_min <= true <= count_max
            for it, c in counters.items():
                assert c <= true[it] <= c + dec, (it, c, dec)


def test_stream_carries_state_across_batches(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    b1 = [("click", "hot")] * 30 + [("click", f"u{i}") for i in range(5)]
    _drop_file(spark, tmp_path, src, "b1", b1)

    ev = spark.readStream.schema(EV_SCHEMA).parquet(str(src))
    q = subscribe_heavy_hitters(ev, "hh_sink", "event_type", "user_id", k=4)
    try:
        q.processAllAvailable()
        rows1 = spark.sql("SELECT * FROM hh_sink").collect()
        snap1 = {r["item"]: r for r in rows1}
        assert "hot" in snap1
        assert snap1["hot"]["n_seen"] == 35

        # second batch: state (not just the batch) feeds the summary
        b2 = [("click", "hot")] * 20 + [("click", f"v{i}") for i in range(5)]
        _drop_file(spark, tmp_path, src, "b2", b2)
        q.processAllAvailable()
        # latest-wins: the row with the highest n_seen per item (collect
        # order from a memory sink is not a contract)
        latest = {}
        for r in spark.sql("SELECT * FROM hh_sink").collect():
            cur = latest.get(r["item"])
            if cur is None or r["n_seen"] > cur["n_seen"]:
                latest[r["item"]] = r
        hot = latest["hot"]
        assert hot["n_seen"] == 60
        true_hot = 50
        assert hot["count_min"] <= true_hot <= hot["count_max"]
        # dominant item guarantee at the stream level: true 50 > 60/5
        assert hot["count_min"] > 0
    finally:
        q.stop()


def test_stream_guarantee_against_exact_counts(spark, tmp_path):
    rng = random.Random(13)
    rows = []
    for g in ("a", "b"):
        rows += [(g, "dom")] * 200
        rows += [(g, f"u{rng.randrange(150)}") for _ in range(200)]
    rng.shuffle(rows)
    src = tmp_path / "ev2"
    src.mkdir()
    _drop_file(spark, tmp_path, src, "b1", rows)

    ev = spark.readStream.schema(EV_SCHEMA).parquet(str(src))
    q = subscribe_heavy_hitters(ev, "hh_sink2", "event_type", "user_id", k=8)
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM hh_sink2").collect()
    finally:
        q.stop()
    true = Counter(rows)
    for g in ("a", "b"):
        items = {r["item"]: r for r in got if r["event_type"] == g}
        n = 400
        # dom: true 200 > 400/9 — must be present, bounds must bracket it
        assert "dom" in items
        r = items["dom"]
        assert r["count_min"] <= true[(g, "dom")] <= r["count_max"]
        live = [r for r in items.values() if r["count_min"] > 0]
        assert len(live) <= 8


def test_evicted_counter_emits_tombstone(spark, tmp_path):
    src = tmp_path / "ev3"
    src.mkdir()
    # batch 1 fills all k=2 counters
    _drop_file(spark, tmp_path, src, "b1",
               [("g", "a"), ("g", "a"), ("g", "b")])
    ev = spark.readStream.schema(EV_SCHEMA).parquet(str(src))
    q = subscribe_heavy_hitters(ev, "hh_tomb", "event_type", "user_id", k=2)
    try:
        q.processAllAvailable()
        # batch 2: two new singletons cancel b (count 1) out of the table
        _drop_file(spark, tmp_path, src, "b2", [("g", "c"), ("g", "d")])
        q.processAllAvailable()
        latest = {}
        for r in spark.sql("SELECT * FROM hh_tomb").collect():
            cur = latest.get(r["item"])
            if cur is None or r["n_seen"] > cur["n_seen"]:
                latest[r["item"]] = r
        # b was evicted → its latest row is a tombstone, not the stale
        # batch-1 counter
        assert latest["b"]["count_min"] == 0
        assert latest["b"]["n_seen"] == 5
        assert latest["a"]["count_min"] >= 1  # survivor stays live
    finally:
        q.stop()
