"""Distributed sketch structures: Bloom-filter semi-join pre-filtering.

The reference engine carries no sketch machinery (its scans are
key-range-pruned pebble iterators, internal/enumerate/enumerate.go); this
module belongs to the large-scale-pipeline extension surface.  A Bloom
pre-filter is Spark's own runtime-filter / dynamic-partition-pruning
pattern made explicit and portable: build a tiny bit-set over the join
keys of the SMALL side, broadcast it, and drop non-matching rows of the
BIG side map-side — before the shuffle that the real join would pay.
At 100 TB the win is the shuffle you never do: a 0.2%-selective semi-join
moves 0.2% (+ the false-positive rate) of the big table instead of all
of it.

Two hash paths, same pattern as dedup.winnow_fingerprints:

* ``hash_fn="xxhash64"`` — JVM-intrinsic, one long per (key, seed); the
  production path.
* ``hash_fn="md5"`` — byte-identical in DuckDB, so the declared query's
  oracle can reconstruct the exact same bit-set and the false-positive
  COUNT (not just a tolerance) hash-matches across engines.

Everything is expressed as DataFrame ops: the bit-set is a ≤``m``-row
distinct-positions table (broadcast), membership is ``h`` chained
broadcast SEMI-joins fused into one map stage — no driver-side bit
array, no UDF.  Callers running several filters against one bit-set
should materialize it first (``bloom_report`` localCheckpoints it);
each join branch otherwise re-plans the build pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streamkit_spark.functions.util import maybe_broadcast

__all__ = ["bloom_positions", "bloom_build", "bloom_filter", "bloom_report"]


def bloom_positions(
    key: Column,
    m: int = 65536,
    h: int = 3,
    salt: str = "bf",
    hash_fn: str = "xxhash64",
) -> Column:
    """Array of ``h`` bit positions in ``[0, m)`` for one key.

    ``m`` must be a power of 16 ≤ 16^15 on the md5 path (the position is
    the leading ``log16(m)`` hex chars of each salted digest, matching
    the DuckDB nibble reconstruction)."""
    key = key.cast("string")
    if hash_fn == "xxhash64":
        return F.array(
            *[F.pmod(F.xxhash64(F.lit(f"{salt}:{i}"), key), F.lit(m)) for i in range(h)]
        )
    if hash_fn == "md5":
        import math

        digits = round(math.log(m, 16))
        if 16**digits != m:
            raise ValueError(f"md5 path needs m = power of 16, got {m}")
        return F.array(
            *[
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{salt}:{i}:"), key)), 1, digits
                    ),
                    16,
                    10,
                ).cast("long")
                for i in range(h)
            ]
        )
    raise ValueError(f"unknown hash_fn: {hash_fn!r}")


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m: int = 65536,
    h: int = 3,
    salt: str = "bf",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """The Bloom bit-set as a ≤``m``-row table of set positions (``pos``
    long).  One explode + distinct; bounded by ``m`` regardless of the
    key count, hence always broadcastable."""
    return (
        keys.select(
            F.explode(
                bloom_positions(F.col(key_col), m, h, salt, hash_fn)
            ).alias("pos")
        )
        .distinct()
    )


def bloom_filter(
    df: DataFrame,
    probe_col: str,
    bloom: DataFrame,
    m: int = 65536,
    h: int = 3,
    salt: str = "bf",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Rows of ``df`` whose ``probe_col`` passes the Bloom filter (all
    ``h`` positions present — no false negatives, false positives at the
    classic ``(1 - e^{-hn/m})^h`` rate).

    Plan: ``h`` chained broadcast SEMI-joins, one per probe position.
    Whole-stage codegen fuses them into a single map stage over ``df`` —
    row-preserving (duplicates survive), and the big side is never
    shuffled or grouped; the only data movement is the ≤``m``-row bit-set
    broadcast."""
    probes = bloom_positions(F.col(probe_col), m, h, salt, hash_fn)
    out = df
    for i in range(h):
        pcol = f"__bf_pos{i}"
        out = out.withColumn(pcol, probes.getItem(i)).join(
            maybe_broadcast(bloom.withColumnRenamed("pos", pcol)), pcol, "semi"
        )
    return out.drop(*[f"__bf_pos{i}" for i in range(h)])


def bloom_report(
    big: DataFrame,
    probe_col: str,
    keys: DataFrame,
    key_col: str,
    m: int = 65536,
    h: int = 3,
    salt: str = "bf",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """One-row accounting of a Bloom pre-filter vs the exact semi-join:
    (bloom_pass, exact_pass, false_pos).  ``false_pos`` is deterministic
    given the hash path — the md5 path hash-matches a DuckDB twin.

    The bit-set is materialized once (localCheckpoint — it is ≤ m rows
    by construction): the h semi-joins and the accounting otherwise each
    re-plan the keys-side scan+explode+distinct pipeline, and AQE
    exchange reuse across those branches is not guaranteed (the repo's
    derived-table-self-join lesson)."""
    bloom = bloom_build(keys, key_col, m, h, salt, hash_fn).localCheckpoint()
    passed = bloom_filter(big, probe_col, bloom, m, h, salt, hash_fn)
    exact = big.join(
        keys.select(F.col(key_col).alias(probe_col)).distinct(), probe_col, "semi"
    )
    return (
        passed.agg(F.count("*").alias("bloom_pass"))
        .crossJoin(F.broadcast(exact.agg(F.count("*").alias("exact_pass"))))
        .select(
            "bloom_pass",
            "exact_pass",
            (F.col("bloom_pass") - F.col("exact_pass")).alias("false_pos"),
        )
    )
