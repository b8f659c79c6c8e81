"""Loaders for the driver-generated fixture tables (TESTDATA.md).

``load`` is the single entry point the declared-query corpus uses; it
defensively sets the nanos-parquet flag (the driver's SparkSession may not
carry it) and registers temp views so operators can be expressed in either
DataFrame or SQL form.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _prepare(spark: SparkSession) -> None:
    # The fixture events.ts is parquet TIMESTAMP(NANOS); Spark only reads it
    # as a raw long behind this flag.  Integer epoch-ns suits the engine
    # (reference models time as int64 ms — pkg/api/messages.go:105).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _prepare(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
