"""Worker-presence analog (SURVEY §2.9 T9) — a TTL-evicting membership
stream over worker heartbeats.

The reference keeps an in-memory worker map per store node: workers
announce/renew, observers receive the full inventory as a snapshot on
join, and a sweeper evicts workers silent for 3× their renewal interval
(min 30 s) (/root/reference/pkg/api/worker_presence.go:32-66,159-167,
pkg/server/worker_presence_router.go, sweeper
worker_presence_presence.go:22-91).

Spark-first mapping: membership is a *stateful streaming aggregation*
keyed by worker, with event-time TTL timeouts —
``applyInPandasWithState`` with ``EventTimeTimeout``:

* heartbeat arrives  → state (first_seen, last_seen, count) updates and an
  ``online`` row is emitted (update-mode sink keeps latest-per-worker —
  the observer's snapshot IS the sink table, so a late joiner reads the
  full inventory first, then live updates: the snapshot→live contract);
* watermark passes ``last_seen + ttl`` → the state times out, an
  ``evicted`` row is emitted and the state removed — the sweeper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_TTL_MS = 30_000  # reference: max(3 × renewal, 30 s)


def presence_stream(
    heartbeats: DataFrame,
    ttl_ms: int = DEFAULT_TTL_MS,
    late: str = "0 seconds",
    worker_col: str = "worker_id",
    ts_ms_col: str = "ts",
) -> DataFrame:
    """Membership stream from a heartbeat stream.

    ``heartbeats``: streaming DataFrame with at least (worker_id string,
    ts long epoch-ms).  Output rows, one per worker per change:
    (worker_id, status 'online'|'evicted', first_seen, last_seen,
    n_heartbeats).
    """
    import pandas as pd  # noqa: PLC0415

    s = heartbeats.withColumn(
        "event_time", F.timestamp_millis(F.col(ts_ms_col))
    ).withWatermark("event_time", late)

    out_schema = (
        f"{worker_col} string, status string, first_seen long, "
        "last_seen long, n_heartbeats long"
    )
    state_schema = "first_seen long, last_seen long, n long"

    def update(key, pdfs, state):
        if state.hasTimedOut:
            first, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        worker_col: key[0],
                        "status": "evicted",
                        "first_seen": first,
                        "last_seen": last,
                        "n_heartbeats": n,
                    }
                ]
            )
            return
        first = last = None
        n = 0
        if state.exists:
            first, last, n = state.get
        for pdf in pdfs:
            if pdf.empty:
                continue
            n += len(pdf)
            lo, hi = int(pdf[ts_ms_col].min()), int(pdf[ts_ms_col].max())
            first = lo if first is None else min(first, lo)
            last = hi if last is None else max(last, hi)
        state.update((first, last, n))
        # sweep when the event-time watermark passes last_seen + ttl
        state.setTimeoutTimestamp(last + ttl_ms)
        yield pd.DataFrame(
            [
                {
                    worker_col: key[0],
                    "status": "online",
                    "first_seen": first,
                    "last_seen": last,
                    "n_heartbeats": n,
                }
            ]
        )

    return s.groupBy(worker_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", "EventTimeTimeout"
    )


def subscribe_presence(
    heartbeats: DataFrame,
    query_name: str,
    ttl_ms: int = DEFAULT_TTL_MS,
    checkpoint: str | None = None,
):
    """Run the presence stream into an update-mode memory sink named
    ``query_name`` — the sink table is the live membership inventory
    (snapshot for late joiners, updates thereafter)."""
    writer = (
        presence_stream(heartbeats, ttl_ms)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
