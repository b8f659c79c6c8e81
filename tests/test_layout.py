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
