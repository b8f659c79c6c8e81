"""Write-path invariant checks I1-I3 (SURVEY §2.1) as DataFrame builders.

Each returns a DataFrame of violations — empty means the invariant holds.
Semantics from the reference's commit validation
(/root/reference/pkg/storage/pebblekit/store.go:248-250) and integration
tests (test/core_integration_test.go:48-88,
test/transaction_edge_integration_test.go:17-143).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from streamkit_spark.schema import EventsBinding


def i1_contiguity(df: DataFrame, binding: EventsBinding = EventsBinding()) -> DataFrame:
    """Rows whose sequence does not follow its predecessor by exactly 1."""
    w = Window.partitionBy(binding.space, binding.segment).orderBy(binding.sequence)
    d = F.col(binding.sequence) - F.lag(binding.sequence).over(w)
    return (
        df.select(binding.space, binding.segment, binding.sequence, d.alias("d"))
        .filter(F.col("d").isNotNull() & (F.col("d") != 1))
    )


def i2_density(df: DataFrame, binding: EventsBinding = EventsBinding()) -> DataFrame:
    """Segments where count(*) != max(sequence) (gaps or duplicates)."""
    return (
        df.groupBy(binding.space, binding.segment)
        .agg(F.count("*").alias("n"), F.max(binding.sequence).alias("m"))
        .filter(F.col("n") != F.col("m"))
    )


def i3_trx_monotonic(df: DataFrame) -> DataFrame:
    """Chunks whose trx_number does not strictly increase in sequence order
    (expects envelope columns space/segment/sequence/trx_number)."""
    chunks = (
        df.groupBy("space", "segment", "trx_number")
        .agg(F.min("sequence").alias("first_seq"))
    )
    w = Window.partitionBy("space", "segment").orderBy("first_seq")
    d = F.col("trx_number") - F.lag("trx_number").over(w)
    return (
        chunks.select("space", "segment", "trx_number", d.alias("d"))
        .filter(F.col("d").isNotNull() & (F.col("d") < 1))
    )


def check_all(df: DataFrame, binding: EventsBinding = EventsBinding()) -> dict[str, int]:
    """Counts of violations per invariant (0 everywhere = healthy store)."""
    out = {
        "i1_contiguity": i1_contiguity(df, binding).count(),
        "i2_density": i2_density(df, binding).count(),
    }
    if "trx_number" in df.columns:
        out["i3_trx_monotonic"] = i3_trx_monotonic(df).count()
    return out
