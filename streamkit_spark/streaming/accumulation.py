"""Streaming cumulative-unique-users — the stream twin of
``analytics.user_accumulation``.

The batch rewrite (per-user first day → per-day new users → cumulative
sum) splits cleanly across the stream/batch boundary:

* ``first_seen_stream`` — a streaming ``min(day)`` aggregate per user.
  State is one (user, day) pair per user — the same state a streaming
  dropDuplicates would keep, but carrying the value the finisher needs.
  ``update`` output mode: a micro-batch re-emits every user that
  RECEIVED INPUT in the batch (Spark rewrites the group's state either
  way; active users are re-emitted even when their min is unchanged) —
  but the emitted value is monotone, so a latest-wins sink
  (subscribe.py semantics) converges to the exact per-user first day
  even under at-least-once replay.
* ``finalize_accumulation`` — a BATCH aggregate over the (users)-sized
  first-seen table producing (day, new_users, cum_users).  Streaming
  cannot nest the second aggregate (multi-agg streaming queries are
  unsupported); the finisher input is user-sized, not event-sized, so
  running it per dashboard refresh is cheap at any corpus scale.

Parity contract (test_batch_stream_parity): stream → finalize equals
``analytics.user_accumulation`` on the same events exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["first_seen_stream", "finalize_accumulation"]


def first_seen_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_ns: Column | str = "ts",
) -> DataFrame:
    """Streaming per-key first-seen-day aggregate: (key, first_day).

    ``ts_ns`` is the epoch-ns envelope timestamp (``tables.load``
    contract); day bucketing matches the batch twin's integer ``div``
    discipline.  No watermark: first-seen is a monotone min over ALL
    history — evicting state would let a replayed old event re-emit, and
    per-key state is one long, bounded by the user population."""
    ts_ns = F.col(ts_ns) if isinstance(ts_ns, str) else ts_ns
    return (
        events.select(
            F.col(key_col).alias("k"),
            ts_ns.cast("long").alias("__ns"),
        )
        .select("k", F.expr("(__ns div 1000000) div 86400000").alias("day"))
        .groupBy("k")
        .agg(F.min("day").alias("first_day"))
    )


def finalize_accumulation(first_seen: DataFrame) -> DataFrame:
    """Batch finisher over the (key, first_day) table:
    (day, new_users, cum_users).  Delegates to the ONE shared
    definition (``analytics.accumulate_first_days``) so batch and
    stream cannot drift — the parity test pins them together."""
    from streamkit_spark.functions.analytics import accumulate_first_days

    return accumulate_first_days(first_seen)
