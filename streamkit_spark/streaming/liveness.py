"""Subscription heartbeat / liveness surface (SURVEY §2.9 T5).

The reference emits optional heartbeat frames on long-lived subscriptions
so clients can detect dead streams (timeout = 3× interval,
/root/reference/pkg/server/node.go:685-720, client
pkg/client/client.go:558-567,1418-1429).  Spark's equivalent signal is the
StreamingQueryListener event flow: every micro-batch (and idle tick)
produces an event.  This module wraps it into the same contract: a
per-query "last heartbeat" surface and a staleness predicate.
"""

from __future__ import annotations

import threading
import time

from pyspark.sql.streaming import StreamingQueryListener

DEFAULT_TIMEOUT_MS = 30_000  # reference client default: 3 × 10 s interval


def _now_ms() -> int:
    return int(time.time() * 1000)


class LivenessListener(StreamingQueryListener):
    """Tracks per-query liveness from listener events.

    ``heartbeat()`` returns one row per known query:
    (query_id, name, last_event_ms, age_ms, batch_id, alive) — alive iff
    the last event is younger than ``timeout_ms`` and the query has not
    terminated.  Register with ``spark.streams.addListener(listener)``.
    """

    def __init__(self, timeout_ms: int = DEFAULT_TIMEOUT_MS):
        self.timeout_ms = timeout_ms
        self._lock = threading.Lock()
        self._state: dict[str, dict] = {}

    def _note(self, qid: str, name: str | None, batch_id: int | None, terminated: bool = False):
        with self._lock:
            row = self._state.setdefault(
                str(qid), {"name": name, "batch_id": None, "terminated": False}
            )
            row["last_event_ms"] = _now_ms()
            if name is not None:
                row["name"] = name
            if batch_id is not None:
                row["batch_id"] = batch_id
            if terminated:
                row["terminated"] = True

    # -- listener callbacks (called from Spark's listener bus thread)

    def onQueryStarted(self, event):  # noqa: N802 (Spark API)
        self._note(event.id, event.name, None)

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        self._note(p.id, p.name, p.batchId)

    def onQueryIdle(self, event):  # noqa: N802
        self._note(event.id, None, None)

    def onQueryTerminated(self, event):  # noqa: N802
        self._note(event.id, None, None, terminated=True)

    # -- surface

    def heartbeat(self, now_ms: int | None = None) -> list[dict]:
        now = now_ms if now_ms is not None else _now_ms()
        out = []
        with self._lock:
            for qid, row in self._state.items():
                age = now - row["last_event_ms"]
                out.append(
                    {
                        "query_id": qid,
                        "name": row["name"],
                        "last_event_ms": row["last_event_ms"],
                        "age_ms": age,
                        "batch_id": row["batch_id"],
                        "alive": (not row["terminated"]) and age <= self.timeout_ms,
                    }
                )
        return out

    def alive(self, name: str, now_ms: int | None = None) -> bool:
        return any(r["alive"] and r["name"] == name for r in self.heartbeat(now_ms))
