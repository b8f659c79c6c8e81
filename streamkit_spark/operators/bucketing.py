"""Bucketed (pre-shuffled) tables: co-located joins without an exchange.

At 100 TB the dominant cost of a fact-fact join is the shuffle.  Writing
both tables bucketed by the join key puts matching keys in matching
buckets at rest — Spark then plans a SortMergeJoin with NO Exchange on
either side.  This is the engine's answer to the reference's "both sort
orders materialized at write time" trick (SURVEY §1.3): pay the
organization cost once at ingest, amortize across every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+ optionally sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the join key — shuffle-free by layout.
    (Plan check: plans.count_exchanges(...) == 0.)"""
    return spark.table(left_table).join(spark.table(right_table), on, how)
