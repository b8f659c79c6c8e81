"""Space watermarks — the read-visibility fence (SURVEY §2.9 T1/T2).

The reference tracks in-flight produces per space; the safe visible
timestamp is ``min(fence of active writes) - 1`` (or "now" when idle), and
every consume/peek is clamped to it so a reader never sees a later row
before an earlier in-flight one lands
(/root/reference/pkg/server/space_watermarks.go:90-161, clamp
pkg/server/node.go:565-587).

This is *write-visibility* coordination, not Spark's late-data
``withWatermark`` — it lives in the engine session (driver-side bookkeeping
over in-flight commits), while the data path stays declarative: readers
just get an extra ``ts <= safe_ts`` filter, which Catalyst pushes into the
scan like any other predicate.
"""

from __future__ import annotations

import itertools
import threading
from dataclasses import dataclass, field


@dataclass
class _Active:
    token: int
    fence_ms: int
    committed_ts: int | None = None


@dataclass
class _SpaceState:
    active: dict[int, _Active] = field(default_factory=dict)
    last_committed_ts: int = 0


class SpaceWatermarks:
    """Per-space in-flight write registry with the reference's fence math."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._spaces: dict[str, _SpaceState] = {}
        self._tokens = itertools.count(1)

    def begin(self, space: str, now_ms: int) -> int:
        """Register an in-flight produce; returns its token.  The fence is
        the begin wall-clock (space_watermarks.go Begin)."""
        with self._lock:
            st = self._spaces.setdefault(space, _SpaceState())
            token = next(self._tokens)
            st.active[token] = _Active(token, now_ms)
            return token

    def note_committed(self, space: str, token: int, last_ts: int) -> None:
        """Record the commit timestamp of a produce that has durably written
        but not yet published its notification."""
        with self._lock:
            st = self._spaces.setdefault(space, _SpaceState())
            if token in st.active:
                st.active[token].committed_ts = last_ts
            st.last_committed_ts = max(st.last_committed_ts, last_ts)

    def end(self, space: str, token: int) -> None:
        with self._lock:
            st = self._spaces.setdefault(space, _SpaceState())
            st.active.pop(token, None)

    def safe_max_timestamp(self, space: str, now_ms: int) -> int:
        """min(active fences) - 1, else now (space_watermarks.go:135-154)."""
        with self._lock:
            st = self._spaces.get(space)
            if not st or not st.active:
                return now_ms
            return min(a.fence_ms for a in st.active.values()) - 1

    def visible_for_peers(self, space: str, token: int) -> bool:
        """A producer's notification may publish only once no peer that
        began earlier is still uncommitted (WaitUntilVisibleForPeers,
        space_watermarks.go:105-133) — ordering notifications by visible
        timestamp."""
        with self._lock:
            st = self._spaces.get(space)
            if not st or token not in st.active:
                return True
            mine = st.active[token]
            for a in st.active.values():
                if a.token != mine.token and a.fence_ms < mine.fence_ms and a.committed_ts is None:
                    return False
            return True

    def last_committed_ts(self, space: str) -> int:
        with self._lock:
            st = self._spaces.get(space)
            return st.last_committed_ts if st else 0
