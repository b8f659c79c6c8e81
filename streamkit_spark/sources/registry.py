"""Source registry — the engine's pluggable-backend surface.

The reference's StoreFactory abstracts PebbleDB vs Azure Tables behind one
contract (/root/reference/pkg/storage/interface.go:19-22) with a
backend-parity test matrix.  The Spark analog: every format below yields
the same DataFrame contract, and the parity obligation ("same declared
query, same result, any backend") is enforced by the oracle corpus.

Delta/Iceberg are gated behind import-try: their jars aren't in this
image; when present they become the preferred store backend (ACID appends
replace the reference's WAL — SURVEY §2.9 T11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

BATCH_FORMATS = ("parquet", "orc", "json", "csv")


def delta_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.Class.forName("org.apache.spark.sql.delta.DeltaLog")  # noqa: SLF001
        return True
    except Exception:
        return False


def read_source(
    spark: SparkSession,
    fmt: str,
    path: str,
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    if fmt == "delta" and not delta_available(spark):
        raise NotImplementedError("delta-spark jars not on the classpath")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def stream_source(
    spark: SparkSession,
    fmt: str,
    path_or_options: str | dict[str, str],
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """Streaming source: file formats take a path; kafka/rate take options.
    File schemas are mandatory (no streaming inference)."""
    reader = spark.readStream.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if isinstance(path_or_options, dict):
        return reader.options(**path_or_options, **options).load()
    return reader.options(**options).load(path_or_options)
