"""Data-layout optimization: Z-order (Morton) clustering for multi-column
scan pruning.

The reference's only layout lever is its (space, segment, sequence) sort
order (internal/enumerate/enumerate.go key ranges) — one-dimensional.  A
100 TB lakehouse table queried by MORE than one column (user AND day,
space AND ts) needs a layout where file-level min/max stats prune on both
predicates at once; interleaving the key bits (Morton order) is the
standard trick (used by Delta/Iceberg OPTIMIZE ZORDER).  Rows close in
Z-order are close in every interleaved dimension, so
``repartitionByRange(zkey)`` + parquet row-group stats skip files for
2-D box predicates that a 1-D sort can only prune on its leading column.

Everything is a JVM column expression: the key is one ``aggregate`` fold
over bit positions (disjoint bit contributions added — identical to OR),
no UDF, no driver work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_key",
    "cluster_by_zorder",
    "zorder_stats",
    "compaction_plan",
    "compaction_bins",
]


def zorder_key(cols: list[str], bits: int = 16) -> Column:
    """Morton key interleaving the low ``bits`` bits of each column
    (column c contributes bit i to output bit ``i*C + c``).

    Inputs are masked to ``[0, 2^bits)`` — callers map values into that
    range first (e.g. days since epoch, bucketed ids).  ``C * bits`` must
    fit in 63 bits.  The fold ADDS the per-bit contributions; they occupy
    disjoint output bits, so + ≡ | and the same expression runs verbatim
    as ``sum() over generate_series`` in the DuckDB oracle."""
    C = len(cols)
    if C * bits > 63:
        raise ValueError(f"{C} cols x {bits} bits exceeds a signed long")
    mask = (1 << bits) - 1
    if not all(isinstance(c, str) for c in cols):
        raise TypeError("zorder_key takes column NAMES / SQL expressions")
    names = list(cols)
    terms = " + ".join(
        f"shiftleft(shiftright(cast({n} as bigint) & {mask}, i) & 1, i * {C} + {c})"
        for c, n in enumerate(names)
    )
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint),"
        f" (acc, i) -> acc + ({terms}))"
    )


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition + sort the frame by its Morton key — the layout
    pass you run before writing.  ``repartitionByRange`` gives
    NON-OVERLAPPING zkey ranges per output partition (sampled range
    bounds), so every file's min/max zkey is a true pruning interval;
    ``sortWithinPartitions`` tightens parquet row-group stats inside
    each file.  The Morton key itself is dropped before returning —
    readers prune on the DATA columns' min/max stats (Delta/Iceberg
    ZORDER likewise never persists the key), so the written schema is
    the input schema."""
    z = zorder_key(cols, bits).alias("__zkey")
    out = df.select("*", z)
    parts = [F.col("__zkey")]
    if num_partitions:
        clustered = out.repartitionByRange(num_partitions, *parts)
    else:
        clustered = out.repartitionByRange(*parts)
    return clustered.sortWithinPartitions("__zkey").drop("__zkey")


def zorder_stats(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    bucket_shift: int = 8,
) -> DataFrame:
    """Pruning-range report: bucket rows by the high Morton bits
    (``zkey >> bucket_shift`` — a file/row-group proxy) and emit each
    bucket's row count and per-dimension min/max.  The min/max spans are
    exactly what a reader would prune on; tight spans in EVERY dimension
    are the point of Z-order (a 1-D sort gives tight spans only in its
    leading column)."""
    from streamkit_spark.functions.util import spread

    z = zorder_key(cols, bits)
    aggs = [F.count("*").alias("n")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        # spread BEFORE the 16-iteration bit fold: a single-file input
        # would run the whole Morton expression on one core (the
        # dedup._spread lesson); the guard makes it a no-op on
        # already-partitioned inputs
        spread(df.select(*cols))
        .select(*cols, F.shiftright(z, bucket_shift).alias("zbucket"))
        .groupBy("zbucket")
        .agg(*aggs)
        .orderBy("zbucket")
    )


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    file_col: str = "file",
    size_col: str = "bytes",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign files to compaction output bins by streaming concatenation
    (the Delta/Iceberg OPTIMIZE shape): within each group, files are laid
    out in ``file_col`` order and a bin boundary is cut every
    ``target_bytes`` — bin = (running_sum − size) div target.  A file
    larger than the target spills its bin past the target — bins exceed
    the target by at most one file (the file joins the bin its offset
    STARTS in); ordering by name keeps the plan deterministic and
    incremental (appending files never reshuffles earlier bins).

    This is METADATA-scale work: input rows are file entries (~10⁵-10⁶
    per table at 100 TB with 256 MB files), so the per-group window
    prefix sum is cheap; the expensive part — actually rewriting the
    bytes — is the caller's `read files in bin → write one file` pass,
    which parallelizes per bin.  Pure integer math, oracle-exact.

    Output: group_cols + (file, bytes, bin).
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    # integer bin index: (prefix-sum BEFORE this file) div target — exact
    # long arithmetic, no float division
    bin_ = F.expr(
        f"(sum({size_col}) over (partition by {', '.join(group_cols) or '1'}"
        f" order by {file_col}) - {size_col}) div {int(target_bytes)}"
    )
    return files.select(
        *group_cols,
        F.col(file_col).alias("file"),
        F.col(size_col).cast("long").alias("bytes"),
        bin_.cast("long").alias("bin"),
    )


def compaction_bins(
    files: DataFrame,
    target_bytes: int,
    file_col: str = "file",
    size_col: str = "bytes",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-bin summary of :func:`compaction_plan`: one row per planned
    output file with its input count and total bytes — the report that
    schedules the rewrite (bins with n_files == 1 and total ≈ target need
    no work)."""
    plan = compaction_plan(files, target_bytes, file_col, size_col, group_cols)
    return (
        plan.groupBy(*group_cols, "bin")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("bytes").cast("long").alias("total_bytes"),
        )
        .orderBy(*group_cols, "bin")
    )
