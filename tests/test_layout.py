"""Z-order layout: Morton key correctness, non-overlapping range
partitions, and 2-D pruning locality vs a 1-D sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamkit_spark import tables
from streamkit_spark.functions.layout import (
    cluster_by_zorder,
    zorder_key,
    zorder_stats,
)
from tests.conftest import SF_DIR


def _morton(vals: list[int], bits: int) -> int:
    out = 0
    for i in range(bits):
        for c, v in enumerate(vals):
            out |= (((v & ((1 << bits) - 1)) >> i) & 1) << (i * len(vals) + c)
    return out


def test_zorder_key_matches_python_model(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (70000, 2)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(["x", "y"], 16).alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton([x, y], 16), (x, y)


def test_zorder_interleaves_locality(spark):
    # consecutive values in EITHER dimension stay within a 4-key window
    # of each other when the other dimension is fixed (bit i moves key
    # bit 2i / 2i+1)
    assert _morton([2, 3], 16) - _morton([2, 2], 16) <= 8
    df = spark.createDataFrame([(i, i // 4) for i in range(64)], "x long, y long")
    z = df.select(zorder_key(["x", "y"], 16).alias("z")).collect()
    assert len({r["z"] for r in z}) == 64  # injective on distinct pairs


def test_cluster_by_zorder_ranges_do_not_overlap(spark):
    ev = tables.load(spark, SF_DIR, "events").select(
        "user_id", F.expr("ts div 1000000 div 86400000").alias("day")
    )
    clustered = cluster_by_zorder(ev, ["user_id", "day"], bits=16, num_partitions=8)
    # the helper column is dropped from the returned frame (written
    # schema == input schema); recompute the key to audit the ranges
    parts = (
        clustered.select(
            zorder_key(["user_id", "day"], 16).alias("zk"),
            F.spark_partition_id().alias("pid"),
        )
        .groupBy("pid")
        .agg(F.min("zk").alias("lo"), F.max("zk").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(parts) > 1
    for a, b in zip(parts, parts[1:]):
        assert a["hi"] <= b["lo"], "repartitionByRange ranges must not overlap"


def test_zorder_prunes_both_dimensions_where_1d_sort_cannot(spark):
    ev = tables.load(spark, SF_DIR, "events").select(
        "user_id", F.expr("ts div 1000000 div 86400000").alias("day")
    )
    n_parts = 8
    lo_day = ev.agg(F.min("day")).first()[0]
    box = (F.col("day") >= lo_day) & (F.col("day") < lo_day + 4)

    def touched(df):
        return (
            df.withColumn("pid", F.spark_partition_id())
            .filter(box)
            .select("pid")
            .distinct()
            .count()
        )

    z = touched(cluster_by_zorder(ev, ["user_id", "day"], 16, n_parts))
    # 1-D layout sorted by user: a day-only predicate hits every partition
    one_d = touched(ev.repartitionByRange(n_parts, F.col("user_id")))
    assert one_d == n_parts
    assert z < n_parts, f"z-order should prune a day predicate, touched {z}"


def test_zorder_stats_spans_are_bounded(spark):
    ev = tables.load(spark, SF_DIR, "events").select(
        "user_id", F.expr("ts div 1000000 div 86400000").alias("day")
    )
    rows = zorder_stats(ev, ["user_id", "day"], bits=16, bucket_shift=8).collect()
    assert sum(r["n"] for r in rows) == ev.count()
    # bucket_shift=8 fixes every key bit above the low 4 of each
    # dimension → both spans are ≤ 15 per bucket (the whole point: BOTH
    # dimensions stay tight, not just the leading one)
    for r in rows:
        assert r["max_user_id"] - r["min_user_id"] <= 15
        assert r["max_day"] - r["min_day"] <= 15


# ---------------------------------------------------------------------------
# compaction planning
# ---------------------------------------------------------------------------

def test_compaction_plan_bins_match_python(spark):
    from streamkit_spark.functions.layout import compaction_plan

    rows = [(f"f{i:02d}", s) for i, s in enumerate([10, 90, 50, 60, 200, 5, 5])]
    df = spark.createDataFrame(rows, "file string, bytes long")
    got = {
        r["file"]: r["bin"]
        for r in compaction_plan(df, target_bytes=100).collect()
    }
    cum = 0
    for f, s in rows:  # files are already in name order
        assert got[f] == cum // 100, f
        cum += s


def test_compaction_plan_oversize_file_gets_own_bin(spark):
    from streamkit_spark.functions.layout import compaction_plan

    df = spark.createDataFrame(
        [("a", 50), ("b", 300), ("c", 50)], "file string, bytes long"
    )
    got = {r["file"]: r["bin"] for r in compaction_plan(df, 100).collect()}
    # b starts at offset 50 (bin 0 boundary) and spills; c starts at 350
    assert got == {"a": 0, "b": 0, "c": 3}


def test_compaction_bins_summary_grouped(spark):
    from streamkit_spark.functions.layout import compaction_bins

    df = spark.createDataFrame(
        [("s1", "a", 60), ("s1", "b", 60), ("s2", "a", 10)],
        "space string, file string, bytes long",
    )
    rows = compaction_bins(df, 100, group_cols=("space",)).collect()
    # b STARTS inside bin 0 (offset 60 < 100) so bin 0 overshoots to 120
    # bytes — streaming concat bins exceed the target by at most one file
    assert [(r["space"], r["bin"], r["n_files"], r["total_bytes"]) for r in rows] == [
        ("s1", 0, 2, 120),
        ("s2", 0, 1, 10),
    ]


def test_store_compaction_plan_covers_all_files(spark, tmp_path):
    from streamkit_spark.operators.produce import Store

    store = Store(spark, str(tmp_path / "cstore"))
    for seq in range(1, 4):
        store.produce("sp a", "seg", [(seq, f"payload {seq}".encode(), None)])
    plan = store.compaction_plan(target_bytes=1 << 20).collect()
    assert len(plan) == 3  # one append file per produce
    assert {r["space"] for r in plan} == {"sp a"}
    assert all(r["bin"] == 0 for r in plan)  # tiny files pack into one bin
    assert all(r["bytes"] > 0 for r in plan)
