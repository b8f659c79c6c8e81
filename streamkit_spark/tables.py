"""Loaders for the driver-generated fixture tables (TESTDATA.md).

``load`` is the single entry point the declared-query corpus uses; it
defensively sets the nanos-parquet flag (the driver's SparkSession may not
carry it) and registers temp views so operators can be expressed in either
DataFrame or SQL form.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def normalize_events(df: DataFrame) -> DataFrame:
    """Pin the events table to the engine's time contract: ``ts`` is an
    int64 epoch-nanos column (reference models time as int64 —
    pkg/api/messages.go:105).

    The driver fixture has shipped ``ts`` as parquet TIMESTAMP(NANOS)
    (readable only as a long behind ``nanosAsLong``) and as
    TIMESTAMP(MICROS) (arrives as ``timestamp_ntz``).  Accept any flavor.
    The ntz conversion diffs against the ntz epoch, so it is session-
    timezone-independent and bit-identical to DuckDB's ``epoch_ns(ts)``.
    """
    t = dict(df.dtypes).get("ts")
    if t == "timestamp_ntz":
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampdiff(MICROSECOND,"
                " timestamp_ntz'1970-01-01 00:00:00', ts) * 1000"
            ),
        )
    elif t == "timestamp":
        df = df.withColumn("ts", F.unix_micros("ts") * F.lit(1000))
    return df


# Logical-plan cache: building a fixture DataFrame costs a parquet
# footer read + py4j analysis round-trips (~70 ms) and the result is an
# immutable plan, so repeated loads (bench runs a 62-entry suite ×3,
# most entries loading 1-3 tables) pay it once per session.  Keyed by
# SparkSESSION identity, not SparkContext: a DataFrame executes under
# the configs of the session that built it, and two sessions sharing
# one context (the engine session vs the driver's bare comparison
# session) must never serve each other's plans.  The cached DataFrame
# pins its session, so the id() can't be recycled while the entry
# lives.  Fixture files are regenerated only BETWEEN driver rounds,
# never while a session is live (same lifecycle as _IVFADC_CACHE).
_PLAN_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def _session_alive(spark: SparkSession) -> bool:
    """A stopped session's SparkContext has ``_jsc = None`` (set by
    ``SparkContext.stop``); anything py4j-broken counts as dead too."""
    try:
        return spark.sparkContext._jsc is not None
    except Exception:
        return False


def _sweep_dead_plans() -> None:
    """Drop cache entries whose pinned session has been stopped, so a
    long-lived process that cycles sessions doesn't accumulate dead
    DataFrames (each entry pins its whole session object).  Runs only on
    the miss/fresh path — the hot hit path stays a dict lookup."""
    for k, df in list(_PLAN_CACHE.items()):
        if not _session_alive(df.sparkSession):
            _PLAN_CACHE.pop(k, None)


def load(
    spark: SparkSession, sf_dir: str, name: str, fresh: bool = False
) -> DataFrame:
    key = (id(spark), os.path.abspath(sf_dir), name)
    if not fresh:
        hit = _PLAN_CACHE.get(key)
        if hit is not None and _session_alive(spark):
            return hit
    _sweep_dead_plans()
    _prepare(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events(df)
    _PLAN_CACHE[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
