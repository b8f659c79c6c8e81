"""As-of and range joins — time-series operators Spark lacks natively
(SURVEY §2.3 J3 extension; the reference's watermark clamp is itself an
as-of read).

Both are implemented as compositions of built-in ops (no Pandas UDF in the
hot path):

* ``asof_join`` — union-tag + running-window ``last_value``: one shuffle on
  (key), one sort within partitions; no per-row probe.  This beats the
  classic broadcast-probe at scale because the right side is usually too
  big to broadcast and ``merge_asof``-style pandas grouping would ship
  whole partitions through Python.
* ``range_join`` — bucketized band join: equi-join on (key, time-bucket ±1)
  then residual band filter.  Turns an O(n·m) inequality join into an
  equi-join Catalyst can hash-partition; bucket width = band width keeps
  each row probing ≤ 3 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    ``on`` key (pandas ``merge_asof`` semantics, both directions):

    * ``direction="backward"`` (default): latest right with
      ``right_ts <= left_ts``;
    * ``direction="forward"``: earliest right with
      ``right_ts >= left_ts``.

    ``tolerance`` (same units as the ts columns) nulls out a match
    farther than ``tolerance`` from ``left_ts`` — the row is kept with
    NULL as-of columns, exactly like pandas.

    Plan: tag and union both sides, hash-partition by key, one ordered
    window pass computes the running nearest right-row; left rows then
    carry it; the tolerance is a row-local post-filter on the match (no
    second join).  Ties (equal ts): the right row is inside the window
    on both directions (inclusive) — deterministic as long as (key, ts)
    is unique on the right (pre-aggregate the right side if not)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(
                F.struct(*[F.col(c) for c in [right_ts, *right_cols]]).alias("s")
            ).schema["s"].dataType
        ).alias("__r"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s"))
            .schema["s"].dataType
        ).alias("__l"),
        F.struct(*[F.col(c) for c in [right_ts, *right_cols]]).alias("__r"),
    )
    unioned = l_tag.unionByName(r_tag)
    if direction == "backward":
        w = (
            Window.partitionBy("__k")
            .orderBy("__ts", "__side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = F.last("__r", ignorenulls=True).over(w)
    else:
        # at equal ts the left row (side 1) sorts first so the same-ts
        # right row is inside the forward-looking frame (inclusive)
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), F.col("__side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pick = F.first("__r", ignorenulls=True).over(w)
    matched = unioned.withColumn("__last_r", pick).filter(F.col("__side") == 1)
    if tolerance is not None:
        in_tol = (
            F.col(f"__last_r.{right_ts}") >= F.col("__ts") - F.lit(tolerance)
            if direction == "backward"
            else F.col(f"__last_r.{right_ts}") <= F.col("__ts") + F.lit(tolerance)
        )
        matched = matched.withColumn(
            "__last_r", F.when(in_tol, F.col("__last_r"))
        )
    out = matched.select("__l.*", *[
        F.col(f"__last_r.{c}").alias(c + (suffix if c in left.columns else ""))
        for c in [right_ts, *right_cols]
    ])
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    band_ms: int,
) -> DataFrame:
    """All (left, right) pairs with the same key and
    ``|left_ts - right_ts| <= band_ms`` (inclusive band).

    Bucket trick: equi-join on (key, bucket) with the left row fanned out
    to its bucket and both neighbors; residual filter applies the exact
    band.  Output: all left columns + right columns prefixed ``r_``."""
    lb = left.withColumn(
        "__b",
        F.explode(
            F.array(
                (F.col(left_ts) / band_ms).cast("long") - 1,
                (F.col(left_ts) / band_ms).cast("long"),
                (F.col(left_ts) / band_ms).cast("long") + 1,
            )
        ),
    )
    rb = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
        (F.col(right_ts) / band_ms).cast("long").alias("__b"),
        F.col(on).alias("__rk"),
    )
    joined = lb.join(rb, (F.col(on) == F.col("__rk")) & (lb["__b"] == rb["__b"]))
    band = F.abs(F.col(left_ts) - F.col(f"r_{right_ts}")) <= band_ms
    return joined.filter(band).drop("__b", "__rk")
