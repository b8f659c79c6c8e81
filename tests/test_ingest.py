"""Streaming ingestion into the Store: sequencing, lineage, idempotent
replay (T11 exactly-once contract)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from streamkit_spark.operators import invariants
from streamkit_spark.operators.produce import Store
from streamkit_spark.streaming.ingest import ingest_batch, stream_into_store

RAW_SCHEMA = (
    "space string, segment string, payload binary, "
    "metadata map<string,string>, __order long"
)


def _raw(spark, rows):
    return spark.createDataFrame(rows, RAW_SCHEMA)


def test_ingest_batch_sequences_per_segment(spark, tmp_path):
    store = Store(spark, str(tmp_path / "s"))
    batch = _raw(spark, [
        ("sp", "a", b"a1", None, 1),
        ("sp", "a", b"a2", None, 2),
        ("sp", "b", b"b1", None, 3),
    ])
    out = ingest_batch(store, batch, now_ms=100)
    assert out == {("sp", "a"): 2, ("sp", "b"): 1}
    ev = store.events()
    got = {
        (r["segment"], r["sequence"]): bytes(r["payload"])
        for r in ev.collect()
    }
    assert got == {("a", 1): b"a1", ("a", 2): b"a2", ("b", 1): b"b1"}

    # next batch continues sequences
    ingest_batch(store, _raw(spark, [("sp", "a", b"a3", None, 1)]), now_ms=200)
    assert store.events().filter("segment='a'").count() == 3
    assert invariants.check_all(store.events()) == {
        "i1_contiguity": 0, "i2_density": 0, "i3_trx_monotonic": 0,
    }


def test_ingest_replay_is_idempotent(spark, tmp_path):
    store = Store(spark, str(tmp_path / "s"))
    plan = str(tmp_path / "epoch-0.json")
    batch = _raw(spark, [("sp", "a", b"x", None, 1), ("sp", "a", b"y", None, 2)])
    first = ingest_batch(store, batch, now_ms=1, plan_path=plan)
    assert first == {("sp", "a"): 2}
    # replay the SAME epoch (same plan file) → skipped, no duplicates
    again = ingest_batch(store, batch, now_ms=2, plan_path=plan)
    assert again == {("sp", "a"): 0}
    assert store.events().count() == 2
    # a NEW epoch appends normally
    nxt = ingest_batch(store, batch, now_ms=3, plan_path=str(tmp_path / "epoch-1.json"))
    assert nxt == {("sp", "a"): 2}
    assert store.events().count() == 4
    assert invariants.check_all(store.events()) == {
        "i1_contiguity": 0, "i2_density": 0, "i3_trx_monotonic": 0,
    }


def test_stream_into_store_end_to_end(spark, tmp_path):
    # stage raw record files as a file stream
    src = tmp_path / "incoming"
    src.mkdir()
    b1 = _raw(spark, [("sp", "a", b"r1", None, 1), ("sp", "b", b"r2", None, 2)])
    b1.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage1"))
    for f in (tmp_path / "stage1").glob("*.parquet"):
        shutil.copy(f, src / "batch1.parquet")

    store = Store(spark, str(tmp_path / "s"))
    stream = spark.readStream.schema(RAW_SCHEMA).parquet(str(src))
    q = stream_into_store(stream, store, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        assert store.events().count() == 2

        # live arrival: drop another file, stream picks it up and appends
        b2 = _raw(spark, [("sp", "a", b"r3", None, 1)])
        b2.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage2"))
        for f in (tmp_path / "stage2").glob("*.parquet"):
            shutil.copy(f, src / "batch2.parquet")
        q.processAllAvailable()
        rows = {
            (r["segment"], r["sequence"]): bytes(r["payload"])
            for r in store.events().collect()
        }
        assert rows[("a", 2)] == b"r3"
        assert invariants.check_all(store.events()) == {
            "i1_contiguity": 0, "i2_density": 0, "i3_trx_monotonic": 0,
        }
    finally:
        q.stop()


def test_ingest_replay_with_new_group_falls_back_to_tail(spark, tmp_path):
    """A replayed batch containing a (space, segment) absent from the
    persisted plan must not KeyError — the new group sequences from the
    store tail and is recorded in the plan for further replays."""
    store = Store(spark, str(tmp_path / "s"))
    plan = str(tmp_path / "epoch-0.json")
    ingest_batch(store, _raw(spark, [("sp", "a", b"x", None, 1)]),
                 now_ms=1, plan_path=plan)
    superset = _raw(spark, [
        ("sp", "a", b"x", None, 1),
        ("sp", "b", b"new", None, 2),  # not in the persisted plan
    ])
    out = ingest_batch(store, superset, now_ms=2, plan_path=plan)
    assert out == {("sp", "a"): 0, ("sp", "b"): 1}
    # replaying the superset again is now fully idempotent
    again = ingest_batch(store, superset, now_ms=3, plan_path=plan)
    assert again == {("sp", "a"): 0, ("sp", "b"): 0}
    assert store.events().count() == 2


def test_ingest_conflict_with_foreign_writer_is_surfaced(spark, tmp_path):
    """If a foreign produce occupies the planned span with DIFFERENT
    payloads, the replay check must raise, not silently skip (ADVICE r1:
    silent data loss indistinguishable from a replay)."""
    import pytest

    from streamkit_spark.errors import SequenceMismatchError

    store = Store(spark, str(tmp_path / "s"))
    plan = str(tmp_path / "epoch-0.json")
    batch = _raw(spark, [("sp", "a", b"mine", None, 1)])
    # persist the plan without applying it: simulate crash-after-plan
    import json
    store.produce("sp", "a", [(1, b"seed", None)], now_ms=1)
    with open(plan, "w") as f:
        json.dump({"sp\x00a": 2}, f)
    # foreign writer takes sequence 2 with a different payload
    store.produce("sp", "a", [(2, b"foreign", None)], now_ms=2)
    with pytest.raises(SequenceMismatchError):
        ingest_batch(store, batch, now_ms=3, plan_path=plan)
    # true replay (same payload already landed) still skips cleanly
    plan2 = str(tmp_path / "epoch-1.json")
    with open(plan2, "w") as f:
        json.dump({"sp\x00a": 3}, f)
    store.produce("sp", "a", [(3, b"mine", None)], now_ms=4)
    out = ingest_batch(store, _raw(spark, [("sp", "a", b"mine", None, 1)]),
                       now_ms=5, plan_path=plan2)
    assert out == {("sp", "a"): 0}
