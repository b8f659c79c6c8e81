"""Store.recover() — crash-debris sweep matching the reference's WAL
orphan recovery semantics (azurekit/store.go:553-612: startup replay +
background monitor).  Each test plants the debris a real crash leaves."""

from __future__ import annotations

import os
import shutil

from streamkit_spark.operators.produce import Store


def seeded(spark, tmp_path, n=5) -> Store:
    store = Store(spark, str(tmp_path / "store"))
    store.produce("s", "seg1", [(i, f"p{i}".encode(), None) for i in range(1, n + 1)])
    return store


def test_recover_clean_store_is_noop(spark, tmp_path):
    store = seeded(spark, tmp_path)
    report = store.recover(verify_status=True)
    assert report == {
        "staging_removed": 0,
        "compact_rolled_back": False,
        "old_dir_present": False,
        "status_tmp_removed": 0,
        "status_repaired": 0,
    }
    assert store.events().count() == 5


def test_recover_sweeps_orphan_staging(spark, tmp_path):
    store = seeded(spark, tmp_path)
    # a producer crashed mid-write: staging dir full of files, nothing moved
    orphan = os.path.join(store.root, ".staging-deadbeef")
    os.makedirs(os.path.join(orphan, "space=s"))
    open(os.path.join(orphan, "space=s", "part-0.parquet"), "wb").write(b"junk")
    report = store.recover()
    assert report["staging_removed"] == 1
    assert not os.path.exists(orphan)
    assert store.events().count() == 5  # acknowledged data untouched


def test_recover_rolls_back_interrupted_compact(spark, tmp_path):
    store = seeded(spark, tmp_path)
    # crash between compact's two renames: events gone, .old holds the
    # acknowledged layout, .compacting may be half-written
    os.rename(store.events_path, store.events_path + ".old")
    os.makedirs(store.events_path + ".compacting")
    report = store.recover()
    assert report["compact_rolled_back"] is True
    assert not os.path.exists(store.events_path + ".compacting")
    assert not os.path.exists(store.events_path + ".old")
    assert store.events().count() == 5
    # store is fully writable again
    store.produce("s", "seg1", [(6, b"p6", None)])
    assert store.events().count() == 6


def test_recover_reports_but_keeps_post_swap_old_dir(spark, tmp_path):
    store = seeded(spark, tmp_path)
    # crash AFTER the swap (new layout live) but before the straggler
    # sweep: .old must be reported, not deleted (operator's call)
    shutil.copytree(store.events_path, store.events_path + ".old")
    report = store.recover()
    assert report["compact_rolled_back"] is False
    assert report["old_dir_present"] is True
    assert os.path.isdir(store.events_path + ".old")
    assert store.events().count() == 5


def test_recover_repairs_stale_status_row(spark, tmp_path):
    store = seeded(spark, tmp_path)
    # crash inside the append->status window: events has rows 1..5 but the
    # status row still claims last_sequence=2
    store._write_status_row(
        "s", "seg1",
        first_sequence=1, first_ts=1, last_sequence=2, last_ts=1,
        last_trx_number=1,
    )
    assert store._last_state("s", "seg1") == (2, 1)
    report = store.recover(verify_status=True)
    assert report["status_repaired"] == 1
    last_seq, _ = store._last_state("s", "seg1")
    assert last_seq == 5
    # and the write path accepts the true next sequence again
    store.produce("s", "seg1", [(6, b"p6", None)])


def test_recover_removes_status_tmp_files(spark, tmp_path):
    store = seeded(spark, tmp_path)
    part = os.path.join(store.status_path, "space=s", "segment=seg1")
    open(os.path.join(part, ".tmp-crashed.parquet"), "wb").write(b"junk")
    report = store.recover()
    assert report["status_tmp_removed"] == 1
    assert store._last_state("s", "seg1") == (5, 1)


def test_recover_scoped_to_spaces(spark, tmp_path):
    store = seeded(spark, tmp_path)
    store.produce("other", "segA", [(1, b"x", None)])
    # corrupt BOTH status rows, recover only one space
    for sp, seg in (("s", "seg1"), ("other", "segA")):
        store._write_status_row(sp, seg, 1, 1, 0, 1, 0)
    report = store.recover(verify_status=True, spaces=["other"])
    assert report["status_repaired"] == 1
    assert store._last_state("other", "segA")[0] == 1
    assert store._last_state("s", "seg1")[0] == 0  # untouched (still stale)
