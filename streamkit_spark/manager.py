"""Per-store engine lifecycle manager — the analog of the reference's
node manager (``pkg/server/manager.go:139-291``): one lazily-created
handle per store, a CIRCUIT BREAKER on handle creation, and IDLE
EVICTION of handles nobody has touched.

On Spark the "node" is whatever per-store object is expensive to build
and worth caching — a :class:`~streamkit_spark.engine.StreamkitEngine`
over a store path, a Store with warmed status views, a cached
DataFrame bundle.  The manager is factory-generic; anything with an
optional ``close()`` works.

Semantics mirrored from the reference (same defaults):

* **Circuit breaker** (manager.go:149-173): after ``max_failures``
  consecutive creation failures for a store id the circuit OPENS —
  further attempts inside ``failure_window`` fail fast with the
  remaining retry-after, without calling the factory.  Once the window
  passes, the expired failure record is PRUNED on access
  (manager.go:128-137 runs before the circuit check), so expiry is a
  FULL RESET: the next attempt probes the factory and subsequent
  failures must reach ``max_failures`` again to re-open.  The
  half-open count-reduction branch below mirrors the reference's
  (manager.go:166-172) — in both codebases it is defense-in-depth
  behind the prune, not the normal path.
* **Failure-table bounds** (manager.go:128-137, 291+): entries whose
  last failure is older than the window are pruned on access, and the
  table is capped at ``max_failure_entries`` distinct ids — the OLDEST
  entry is evicted to admit a new one.
* **Idle eviction** (manager.go:249-271): ``reap_idle()`` closes and
  removes handles with no in-flight use and no access for
  ``idle_ttl``; ``start_reaper()`` runs it on a background thread
  every ``idle_check_every`` seconds (optional — a driver can also
  call ``reap_idle()`` from its own housekeeping loop).
* **use() refcounting** (manager.go:77-86): the context manager bumps
  an in-flight counter so the reaper never closes a handle mid-call,
  and stamps last-access on entry.

``time_fn`` is injectable so tests drive the clock deterministically.
Thread-safe: one lock guards the tables; the factory runs OUTSIDE it
behind a per-id in-progress marker (slow creation of one store never
blocks access to others, racing creators of the same id still
deduplicate); handles close OUTSIDE the lock (the reference's toClose
pattern).  remove()/close() with live borrowers defer the close to the
last use() release instead of yanking the handle mid-call.
"""

from __future__ import annotations

import threading
import time as _time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Any, Callable

__all__ = ["CircuitOpenError", "EngineManager"]

_DEFAULT_MAX_FAILURE_ENTRIES = 1024


class CircuitOpenError(RuntimeError):
    """Creation circuit is open for this store id; retry later.

    ``retry_after`` is the remaining seconds of the failure window —
    the reference reports the same quantity in its error string."""

    def __init__(self, store_id: Any, failures: int, retry_after: float):
        super().__init__(
            f"store creation circuit open for {store_id!r}: too many "
            f"recent failures ({failures}), retry after {retry_after:.3f}s"
        )
        self.store_id = store_id
        self.failures = failures
        self.retry_after = retry_after


@dataclass
class _Failure:
    count: int
    last_failed: float


@dataclass
class _Entry:
    handle: Any
    last_accessed: float
    inflight: int = 0
    # Set by remove()/close() when borrowers are still inside use():
    # the LAST borrower out closes the handle (deferred force-close).
    defunct: bool = False


@dataclass
class EngineManager:
    """See module docstring.  ``factory(store_id) -> handle`` builds a
    handle; handles with a ``close()`` method are closed on eviction,
    removal, and shutdown."""

    factory: Callable[[Any], Any]
    max_failures: int = 3
    failure_window: float = 30.0
    max_failure_entries: int = _DEFAULT_MAX_FAILURE_ENTRIES
    idle_ttl: float = 0.0
    idle_check_every: float = 0.0
    time_fn: Callable[[], float] = _time.monotonic

    _entries: dict = field(default_factory=dict, init=False)
    _failures: dict = field(default_factory=dict, init=False)
    _creating: dict = field(default_factory=dict, init=False)
    _lock: threading.Lock = field(default_factory=threading.Lock, init=False)
    _reaper: threading.Thread | None = field(default=None, init=False)
    _stop: threading.Event = field(default_factory=threading.Event, init=False)
    _closed: bool = field(default=False, init=False)

    # ------------------------------------------------------------ access

    def get_or_create(self, store_id: Any) -> Any:
        """Return the cached handle for ``store_id``, creating it via
        the factory — subject to the circuit breaker.  Racing creators
        of the SAME id deduplicate (the reference holds its mutex across
        NewStore, manager.go:139-141, so two callers can never build two
        handles and leak the loser — preserved here via a per-id
        in-progress marker), but the factory runs OUTSIDE the global
        lock: one slow creation (a Spark engine build can take seconds)
        never blocks get_or_create/use/reap_idle for other store ids."""
        return self._acquire_entry(store_id, bump_inflight=False).handle

    def _acquire_entry(self, store_id: Any, bump_inflight: bool) -> "_Entry":
        """Resolve-or-create the entry.  When ``bump_inflight``, the
        inflight bump happens in the SAME critical section that resolves
        (or publishes) the handle, so the idle reaper / remove / close
        can never close it between resolution and the bump."""
        while True:
            with self._lock:
                if self._closed:
                    raise RuntimeError("EngineManager is closed")
                self._prune_expired_failures_locked()
                ent = self._entries.get(store_id)
                if ent is not None:
                    ent.last_accessed = self.time_fn()
                    if bump_inflight:
                        ent.inflight += 1
                    return ent
                in_progress = self._creating.get(store_id)
                if in_progress is None:
                    f = self._failures.get(store_id)
                    if f is not None and f.count >= self.max_failures:
                        elapsed = self.time_fn() - f.last_failed
                        if elapsed < self.failure_window:
                            raise CircuitOpenError(
                                store_id, f.count, self.failure_window - elapsed
                            )
                        # half-open: allow exactly one probe
                        f.count = self.max_failures - 1
                    in_progress = threading.Event()
                    self._creating[store_id] = in_progress
                    break  # we are the creator; build outside the lock
            # Another thread is creating this id: wait for it to finish,
            # then loop — on success the entry is there; on failure we
            # retry as creator (and may fail fast on the circuit).
            in_progress.wait()
        try:
            handle = self.factory(store_id)
        except BaseException as exc:
            # BaseException, not Exception: a KeyboardInterrupt/SystemExit
            # escaping the factory must still pop the _creating marker and
            # set the Event, or every later get_or_create/use for this id
            # blocks forever at in_progress.wait().  Only Exception counts
            # toward the circuit — an operator's Ctrl-C is not an engine
            # failure.
            with self._lock:
                if isinstance(exc, Exception):
                    self._record_failure_locked(store_id)
                self._creating.pop(store_id, None)
            in_progress.set()
            raise
        with self._lock:
            self._creating.pop(store_id, None)
            if self._closed:
                # close() ran while we were building; don't publish.
                in_progress.set()
                self._close_handle(handle)
                raise RuntimeError("EngineManager is closed")
            self._failures.pop(store_id, None)
            ent = _Entry(handle, self.time_fn())
            if bump_inflight:
                ent.inflight += 1
            self._entries[store_id] = ent
        in_progress.set()
        return ent

    def _record_failure_locked(self, store_id: Any) -> None:
        f = self._failures.get(store_id)
        if f is not None:
            f.count += 1
            f.last_failed = self.time_fn()
        else:
            if len(self._failures) >= self.max_failure_entries:
                self._evict_oldest_failure_locked()
            self._failures[store_id] = _Failure(1, self.time_fn())

    @contextmanager
    def use(self, store_id: Any):
        """``with manager.use(sid) as h:`` — refcounted access.  If a
        concurrent remove()/close() force-invalidates the entry while
        borrowed, the handle stays open until the LAST borrower exits;
        that borrower closes it."""
        ent = self._acquire_entry(store_id, bump_inflight=True)
        try:
            yield ent.handle
        finally:
            with self._lock:
                ent.inflight -= 1
                close_now = ent.defunct and ent.inflight == 0
            if close_now:
                self._close_handle(ent.handle)

    # -------------------------------------------------------- lifecycle

    def remove(self, store_id: Any) -> None:
        """Force-path: forget the handle AND its failure history.  The
        handle closes immediately when idle; with borrowers inside
        use() the close defers to the last borrower's release (the
        entry is unpublished either way — new callers re-create)."""
        with self._lock:
            self._failures.pop(store_id, None)
            ent = self._entries.pop(store_id, None)
            if ent is not None and ent.inflight > 0:
                ent.defunct = True
                ent = None  # last borrower out closes it
        if ent is not None:
            self._close_handle(ent.handle)

    def reap_idle(self) -> int:
        """Evict handles idle past ``idle_ttl`` with nothing in flight;
        returns the number evicted.  No-op when idle_ttl <= 0."""
        if self.idle_ttl <= 0:
            return 0
        now = self.time_fn()
        to_close = []
        with self._lock:
            for sid, ent in list(self._entries.items()):
                if ent.inflight != 0:
                    continue
                if now - ent.last_accessed < self.idle_ttl:
                    continue
                to_close.append(ent.handle)
                del self._entries[sid]
        for h in to_close:
            self._close_handle(h)
        return len(to_close)

    def start_reaper(self) -> None:
        """Run ``reap_idle`` every ``idle_check_every`` seconds on a
        daemon thread (both TTL and interval must be positive)."""
        if self.idle_ttl <= 0 or self.idle_check_every <= 0:
            return
        if self._reaper is not None:
            return

        def loop():
            while not self._stop.wait(self.idle_check_every):
                self.reap_idle()

        self._reaper = threading.Thread(
            target=loop, name="engine-manager-reaper", daemon=True
        )
        self._reaper.start()

    def close(self) -> None:
        """Stop the reaper and close every handle (idempotent).  Handles
        borrowed inside use() at close time defer their close to the
        last borrower's release, like remove()."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
        self._stop.set()
        if self._reaper is not None:
            self._reaper.join(timeout=5)
        with self._lock:
            to_close = []
            for e in self._entries.values():
                if e.inflight > 0:
                    e.defunct = True
                else:
                    to_close.append(e.handle)
            self._entries.clear()
            self._failures.clear()
        for h in to_close:
            self._close_handle(h)

    # ---------------------------------------------------------- helpers

    def stats(self) -> dict:
        """Counts for telemetry: live handles, tracked failures, open
        circuits (count >= max_failures and still inside the window)."""
        with self._lock:
            now = self.time_fn()
            open_circuits = sum(
                1
                for f in self._failures.values()
                if f.count >= self.max_failures
                and now - f.last_failed < self.failure_window
            )
            return {
                "handles": len(self._entries),
                "failures_tracked": len(self._failures),
                "open_circuits": open_circuits,
            }

    def _prune_expired_failures_locked(self) -> None:
        if not self._failures or self.failure_window <= 0:
            return
        now = self.time_fn()
        for sid in [
            s
            for s, f in self._failures.items()
            if now - f.last_failed >= self.failure_window
        ]:
            del self._failures[sid]

    def _evict_oldest_failure_locked(self) -> None:
        if not self._failures:
            return
        victim = min(self._failures, key=lambda s: self._failures[s].last_failed)
        del self._failures[victim]

    @staticmethod
    def _close_handle(handle: Any) -> None:
        close = getattr(handle, "close", None)
        if callable(close):
            try:
                close()
            except Exception:
                pass  # closing is best-effort, as in the reference's reaper
