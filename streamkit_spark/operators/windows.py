"""Time-window operators: tumbling aggregation and sessionization
(SURVEY §2.9 T8 — the reference has no windows; these are the Spark-native
extensions its users would reach for).

Batch forms here (pure window/groupBy compositions); the streaming forms
are ``F.window``/``F.session_window`` over the same columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_ms: Column,
    width_ms: int,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Fixed tumbling windows on an epoch-ms column: the window id is pure
    integer division — no shuffle beyond the aggregation itself, and the
    window id is a monotone partition-prunable key at scale."""
    win = (ts_ms / width_ms).cast("long").alias("window_id")
    return df.groupBy(win, *keys).agg(*aggs)


def sessionize(
    df: DataFrame,
    key: str,
    ts_ms: Column,
    gap_ms: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap from
    the previous event exceeds ``gap_ms``.

    Classic lag + running-sum over one (key, ts) window — a single shuffle
    on the key; each partition sorts once and both window functions share
    the frame."""
    w = Window.partitionBy(key).orderBy(ts_ms)
    gap = ts_ms - F.lag(ts_ms).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_ms), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame, key: str, ts_ms: Column, gap_ms: int
) -> DataFrame:
    """Per-key session summary: session count, events, span."""
    s = sessionize(df, key, ts_ms, gap_ms)
    ts = ts_ms
    per_session = s.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts).alias("start_ms"),
        F.max(ts).alias("end_ms"),
    )
    return (
        per_session.groupBy(key)
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max(F.col("end_ms") - F.col("start_ms")).alias("longest_session_ms"),
        )
        .orderBy(key)
    )


def rolling_daily_counts(
    df: DataFrame,
    key: str,
    ts_ms: Column,
    window_days: int = 7,
) -> DataFrame:
    """Per-key daily activity with a trailing ``window_days``-day rolling
    total — the retention/engagement primitive (DAU with trailing WAU).

    Two steps: (1) a (key, epoch-day) count aggregate — map-side combined,
    shuffle ∝ distinct (key, day) pairs, never raw events; (2) a RANGE
    window over the integer day per key, so gap days weigh nothing and no
    row explosion fills them in.  The window partitions by key — state per
    partition is one key's day rows (≤ days of history), so the sort is
    trivially bounded at any corpus scale.

    Day is a pure integer epoch-day (ms // 86400000): timezone-free and
    byte-identical across engines.

    Output: (key, day, n_events, n_rolling), day ascending per key."""
    day = (ts_ms / F.lit(86_400_000)).cast("long")
    daily = df.groupBy(F.col(key), day.alias("day")).agg(
        F.count("*").cast("long").alias("n_events")
    )
    w = (
        Window.partitionBy(key)
        .orderBy("day")
        .rangeBetween(-(window_days - 1), 0)
    )
    return daily.withColumn(
        "n_rolling", F.sum("n_events").over(w).cast("long")
    ).orderBy(key, "day")


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    key: str = "user_id",
    ts_ms: Column | None = None,
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered conversion funnel: step i counts the keys whose
    earliest qualifying step-i event is strictly LATER than their
    earliest qualifying step-(i-1) event (the classic product-analytics
    funnel; re-orderings don't count as conversions).

    Plan: one filtered min-aggregate per step, each joined to the
    previous step's (key, t) table on the key — len(steps) co-partitioned
    shuffles of one fixed-width row per key, then single-row count
    aggregates unioned into the report.  No window, no collect; every
    join key is the same ``key``, so at scale the shuffles co-locate and
    AQE folds the tiny right sides to broadcasts.

    Output: (step, event_type, n_keys) — one row per step, step ordinal
    ascending."""
    ts = ts_ms if ts_ms is not None else F.col("ts")
    out = None
    prev = None
    for i, st in enumerate(steps):
        ev = df.filter(F.col(type_col) == st).select(
            F.col(key).alias("__k"), ts.alias("__ts")
        )
        if prev is None:
            cur = ev.groupBy("__k").agg(F.min("__ts").alias("__t"))
        else:
            cur = (
                ev.join(prev, "__k")
                .filter(F.col("__ts") > F.col("__t"))
                .groupBy("__k")
                .agg(F.min("__ts").alias("__t"))
            )
        row = cur.agg(F.count("*").cast("long").alias("n_keys")).select(
            F.lit(i).cast("long").alias("step"),
            F.lit(st).alias("event_type"),
            "n_keys",
        )
        out = row if out is None else out.unionByName(row)
        prev = cur
    return out


def funnel_timing(
    df: DataFrame,
    from_step: str,
    to_step: str,
    ts_ms: Column,
    key: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert between two funnel steps: for every key whose
    earliest ``to_step`` event is strictly later than its earliest
    ``from_step`` event (the :func:`funnel_counts` conversion rule),
    delta = first qualifying ``to`` − first ``from``.  One-row report:
    (step_from, step_to, n_start, n_converted, conv_rate, p50_ms,
    p90_ms, max_ms).

    Percentiles are Spark's EXACT interpolated ``percentile`` (the
    quantile_report determinism note: identical to DuckDB's
    quantile_cont, deterministic under any partition order because the
    sort happens inside the aggregate), rounded 4dp.  Plan: two filtered
    min-aggregates co-partitioned on the key + single-row aggregates —
    no window, no collect; delta rows are one fixed-width row per
    converting key.

    ``ts_ms`` is REQUIRED (no default, unlike :func:`funnel_counts`
    whose outputs are unit-free counts): this report's columns are
    unit-suffixed ``_ms``, and the engine's raw ts column is
    epoch-NANOSECONDS (tables.load contract) — any silent default would
    mislabel one unit or the other by 10^6.  Pass
    ``F.expr("ts div 1000000")`` for engine tables."""
    ts = ts_ms
    a = (
        df.filter(F.col(type_col) == from_step)
        .select(F.col(key).alias("__k"), ts.alias("__ts"))
        .groupBy("__k")
        .agg(F.min("__ts").alias("__t0"))
    )
    conv = (
        df.filter(F.col(type_col) == to_step)
        .select(F.col(key).alias("__k"), ts.alias("__ts"))
        .join(a, "__k")
        .filter(F.col("__ts") > F.col("__t0"))
        .groupBy("__k")
        .agg(F.min("__ts").alias("__t1"), F.min("__t0").alias("__t0"))
    )
    deltas = conv.select((F.col("__t1") - F.col("__t0")).alias("delta"))
    stats = deltas.agg(
        F.count("*").cast("long").alias("n_converted"),
        F.round(F.percentile(F.col("delta"), F.lit(0.5)), 4).alias("p50_ms"),
        F.round(F.percentile(F.col("delta"), F.lit(0.9)), 4).alias("p90_ms"),
        F.max("delta").alias("max_ms"),
    )
    starts = a.agg(F.count("*").cast("long").alias("n_start"))
    return (
        stats.crossJoin(F.broadcast(starts))
        .select(
            F.lit(from_step).alias("step_from"),
            F.lit(to_step).alias("step_to"),
            "n_start",
            "n_converted",
            F.round(
                F.when(
                    F.col("n_start") > 0,
                    F.col("n_converted").cast("double")
                    / F.col("n_start").cast("double"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("conv_rate"),
            "p50_ms",
            "p90_ms",
            "max_ms",
        )
    )


def linear_attribution(
    df: DataFrame,
    conversion_step: str,
    touch_steps: list[str] | tuple[str, ...],
    ts_ms: Column,
    key: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    window_ms: int = 3 * 86400000,
) -> DataFrame:
    """Equal-credit (linear) multi-touch attribution: every touch event
    of the same key in the ``window_ms`` before a conversion shares the
    conversion's credit equally (1/n each); conversions with no
    preceding touch credit a synthetic ``(direct)`` channel.  Output:
    ``(event_type, n_events, credit)`` per attributed channel — the
    marketing-standard alternative to last-touch (which
    :func:`streamkit_spark.operators.asof.as_of_join` answers).

    Determinism contract: per-conversion touch counts are exact
    integers, so every credit is a rational 1/n — the float work
    reduces to Σ cnt(n)/n per channel, a fold over the
    denominator-sorted (n, cnt) list.  That list is bounded by the
    DISTINCT DENOMINATOR count (max touches one key fits in the
    window), not the event count, so the fold state stays tiny at any
    corpus size and the oracle's ``list_sum(list(term ORDER BY n))``
    replays it exactly.

    Scale: one key-equi range join (conversions ⋈ touches co-partition
    on the key; the window predicate prunes within the key's rows) +
    one count window partitioned by conversion id + two bounded
    aggregates.  ``ts_ms`` is required, same unit contract as
    :func:`funnel_timing` — pass ``F.expr("ts div 1000000")`` for
    engine tables."""
    ts = ts_ms
    convs = df.filter(F.col(type_col) == conversion_step).select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("__pid"),
        ts.alias("__pts"),
    )
    touches = df.filter(F.col(type_col).isin(list(touch_steps))).select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("__tid"),
        F.col(type_col).alias("__ttype"),
        ts.alias("__tts"),
    )
    j = convs.join(
        touches,
        [
            convs["__k"] == touches["__k"],
            touches["__tts"] < convs["__pts"],
            touches["__tts"] >= convs["__pts"] - F.lit(int(window_ms)),
        ],
        "left",
    ).select("__pid", "__tid", "__ttype")
    n_w = Window.partitionBy("__pid")
    per_row = j.select(
        F.coalesce(F.col("__ttype"), F.lit("(direct)")).alias("channel"),
        F.count("__tid").over(n_w).cast("long").alias("n"),
    )
    by_denom = per_row.groupBy("channel", "n").agg(
        F.count("*").cast("long").alias("cnt")
    )
    term = F.when(
        F.col("n") == 0, F.col("cnt").cast("double")
    ).otherwise(F.col("cnt").cast("double") / F.col("n").cast("double"))
    return (
        by_denom.select("channel", "n", term.alias("t"), "cnt")
        .groupBy("channel")
        .agg(
            F.sum("cnt").cast("long").alias("n_events"),
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("n", "t"))),
                    F.lit(0.0).cast("double"),
                    lambda acc, x: acc + x["t"],
                ),
                4,
            ).alias("credit"),
        )
        .select(F.col("channel").alias(type_col), "n_events", "credit")
        .orderBy(type_col)
    )
