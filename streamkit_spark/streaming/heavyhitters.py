"""Streaming heavy hitters — bounded-state Misra–Gries top-k per group.

The reference has no frequency-sketch surface; this extends the
subscription side (SURVEY §2.9 T3/T4 latest-wins snapshots) with the
summary a telemetry pipeline actually wants from an unbounded stream:
"which items dominate this space", maintained incrementally with O(k)
state per group — never a per-item counter table.

Misra & Gries ("Finding repeated elements", Sci. Comp. Prog. 1982):
keep ≤ k counters; an incoming item increments its counter or claims a
free one, else ALL counters decrement (the k-way cancellation).  After N
items, any item with true count > N/(k+1) is guaranteed present, and
each counter underestimates its item's true count by at most the
group's total decrement ``d ≤ N/(k+1)`` — both bounds are emitted so a
consumer can see the uncertainty (``count_min = counter``,
``count_max = counter + d``).

Plan shape: ``applyInPandasWithState`` keyed by the group column — state
is two k-length lists + two longs regardless of stream length; each
micro-batch does one pandas pass over its group rows.  The guarantee
(superset of true > N/(k+1) items, count_min ≤ true ≤ count_max) is
property-tested against exact counts under arbitrary item order.

Latest-wins consumers (the T3/T4 snapshot pattern) need RETRACTIONS: a
counter evicted by the k-way cancellation would otherwise survive in
the sink as a stale "live" heavy hitter.  Each batch therefore also
emits a tombstone row (``count_min = 0``) for every item that left the
summary — 0 ≤ true ≤ dec is exactly the MG bound for an absent item,
so the tombstone is both the retraction signal and a valid bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters_stream", "subscribe_heavy_hitters", "mg_update"]


def mg_update(counters: dict[str, int], items, k: int) -> int:
    """One Misra–Gries pass of ``items`` into ``counters`` (mutated in
    place, ≤ k entries).  Returns the total decrement applied."""
    dec = 0
    for it in items:
        if it in counters:
            counters[it] += 1
        elif len(counters) < k:
            counters[it] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
            dec += 1
    return dec


def heavy_hitters_stream(
    events: DataFrame,
    group_col: str = "event_type",
    item_col: str = "user_id",
    k: int = 8,
) -> DataFrame:
    """Update stream of per-group Misra–Gries summaries.

    Output (update mode): one row per surviving counter per batch —
    (group, item, count_min, count_max, n_seen) with ``count_min ≤
    true ≤ count_max`` and every item with true count > n_seen/(k+1)
    present — plus a TOMBSTONE row (count_min = 0, count_max = total
    decrement) for each item evicted this batch, so latest-wins
    consumers retract stale entries."""
    import pandas as pd  # noqa: PLC0415

    out_schema = (
        f"{group_col} string, item string, count_min long, "
        "count_max long, n_seen long"
    )
    state_schema = "items array<string>, counts array<long>, n long, dec long"

    def update(key, pdfs, state):
        if state.exists:
            items, counts, n, dec = state.get
            counters = dict(zip(list(items), list(counts)))
        else:
            counters, n, dec = {}, 0, 0
        before = set(counters)
        for pdf in pdfs:
            if pdf.empty:
                continue
            vals = pdf[item_col].astype(str)
            n += len(vals)
            dec += mg_update(counters, vals, k)
        state.update(
            (list(counters.keys()), [int(c) for c in counters.values()], n, dec)
        )
        live = [
            {
                group_col: key[0],
                "item": it,
                "count_min": c,
                "count_max": c + dec,
                "n_seen": n,
            }
            for it, c in sorted(counters.items())
        ]
        gone = [
            {
                group_col: key[0],
                "item": it,
                "count_min": 0,
                "count_max": dec,
                "n_seen": n,
            }
            for it in sorted(before - set(counters))
        ]
        yield pd.DataFrame(live + gone)

    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: PLC0415

    return (
        events.select(F.col(group_col).cast("string"), F.col(item_col))
        .groupBy(group_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def subscribe_heavy_hitters(
    events: DataFrame,
    sink_name: str,
    group_col: str = "event_type",
    item_col: str = "user_id",
    k: int = 8,
):
    """Attach the heavy-hitter stream to an in-memory update sink (the
    T3/T4 snapshot pattern: late joiners read the sink table)."""
    hh = heavy_hitters_stream(events, group_col, item_col, k)
    return (
        hh.writeStream.queryName(sink_name)
        .format("memory")
        .outputMode("update")
        .start()
    )
