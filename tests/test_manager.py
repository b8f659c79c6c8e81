"""EngineManager — circuit breaker + idle eviction semantics parity
with the reference node manager (pkg/server/manager.go), driven by an
injected deterministic clock (no sleeps)."""

from __future__ import annotations

import pytest

from streamkit_spark.manager import CircuitOpenError, EngineManager


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t

    def advance(self, dt):
        self.t += dt


class Handle:
    def __init__(self, sid):
        self.sid = sid
        self.closed = False

    def close(self):
        self.closed = True


def _mgr(fails: dict, clock, **kw):
    def factory(sid):
        n = fails.get(sid, 0)
        if n > 0:
            fails[sid] = n - 1
            raise RuntimeError(f"boom {sid}")
        return Handle(sid)

    return EngineManager(factory=factory, time_fn=clock, **kw)


def test_caches_handle_and_clears_failures_on_success():
    clock = FakeClock()
    m = _mgr({"a": 1}, clock)
    with pytest.raises(RuntimeError):
        m.get_or_create("a")
    h = m.get_or_create("a")
    assert m.get_or_create("a") is h  # cached
    assert m.stats() == {
        "handles": 1, "failures_tracked": 0, "open_circuits": 0,
    }


def test_circuit_opens_after_max_failures_and_fails_fast():
    clock = FakeClock()
    calls = []

    def factory(sid):
        calls.append(sid)
        raise RuntimeError("down")

    m = EngineManager(factory=factory, time_fn=clock)
    for _ in range(3):
        with pytest.raises(RuntimeError):
            m.get_or_create("s")
    # circuit open: factory NOT called, retry_after reported
    with pytest.raises(CircuitOpenError) as ei:
        m.get_or_create("s")
    assert len(calls) == 3
    assert 0 < ei.value.retry_after <= 30.0
    assert m.stats()["open_circuits"] == 1


def test_window_expiry_prunes_failures_full_reset():
    """Reference semantics (manager.go prunes BEFORE the circuit
    check): once the window passes, the failure record is gone — the
    next attempt probes the factory, and re-opening needs max_failures
    fresh failures again."""
    clock = FakeClock()
    calls = []

    def factory(sid):
        calls.append(sid)
        raise RuntimeError("still down")

    m = EngineManager(factory=factory, time_fn=clock)
    for _ in range(3):
        with pytest.raises(RuntimeError):
            m.get_or_create("s")
    with pytest.raises(CircuitOpenError):
        m.get_or_create("s")
    assert len(calls) == 3
    clock.advance(31)  # past the window -> record pruned, full reset
    for expected_calls in (4, 5, 6):
        with pytest.raises(RuntimeError):
            m.get_or_create("s")
        assert len(calls) == expected_calls
    # three fresh failures -> open again
    with pytest.raises(CircuitOpenError):
        m.get_or_create("s")
    assert len(calls) == 6


def test_window_expiry_then_success_recovers():
    clock = FakeClock()
    m = _mgr({"s": 3}, clock)
    for _ in range(3):
        with pytest.raises(RuntimeError):
            m.get_or_create("s")
    clock.advance(31)
    h = m.get_or_create("s")
    assert isinstance(h, Handle)
    assert m.stats()["failures_tracked"] == 0


def test_expired_failures_prune_before_the_circuit_trips():
    clock = FakeClock()
    m = _mgr({"s": 2}, clock)
    with pytest.raises(RuntimeError):
        m.get_or_create("s")
    clock.advance(31)  # first failure expires
    with pytest.raises(RuntimeError):
        m.get_or_create("s")
    # only 1 live failure -> circuit closed, success proceeds
    assert isinstance(m.get_or_create("s"), Handle)


def test_failure_table_cap_evicts_oldest():
    clock = FakeClock()

    def factory(sid):
        raise RuntimeError("no")

    m = EngineManager(
        factory=factory, time_fn=clock, max_failure_entries=2,
        failure_window=1e9,
    )
    for sid in ("a", "b", "c"):
        with pytest.raises(RuntimeError):
            m.get_or_create(sid)
        clock.advance(1)
    st = m.stats()
    assert st["failures_tracked"] == 2  # "a" (oldest) evicted


def test_reap_idle_skips_inflight_and_fresh():
    clock = FakeClock()
    m = _mgr({}, clock, idle_ttl=10.0)
    a = m.get_or_create("a")
    m.get_or_create("b")
    with m.use("a"):
        clock.advance(100)
        assert m.reap_idle() == 1  # only b: a is in flight
        assert not a.closed
    assert m.reap_idle() == 1  # a now idle (use() stamped access at t)
    assert a.closed
    assert m.stats()["handles"] == 0


def test_access_refreshes_idle_clock():
    clock = FakeClock()
    m = _mgr({}, clock, idle_ttl=10.0)
    m.get_or_create("a")
    clock.advance(9)
    m.get_or_create("a")  # refresh
    clock.advance(9)
    assert m.reap_idle() == 0
    clock.advance(2)
    assert m.reap_idle() == 1


def test_remove_and_close_close_handles_and_reset_failures():
    clock = FakeClock()
    m = _mgr({}, clock)
    a = m.get_or_create("a")
    b = m.get_or_create("b")
    m.remove("a")
    assert a.closed and not b.closed
    m.close()
    assert b.closed
    m.close()  # idempotent
    assert m.stats() == {
        "handles": 0, "failures_tracked": 0, "open_circuits": 0,
    }


def test_remove_defers_close_to_last_borrower():
    """A borrower inside use() keeps its handle open across a
    concurrent remove(); the LAST borrower out closes it (ADVICE r6)."""
    clock = FakeClock()
    m = _mgr({}, clock)
    with m.use("a") as outer:
        with m.use("a") as inner:
            assert inner is outer
            m.remove("a")
            assert not outer.closed  # two borrowers still inside
            # the id is unpublished: a new caller gets a FRESH handle
            fresh = m.get_or_create("a")
            assert fresh is not outer and not fresh.closed
        assert not outer.closed  # one borrower still inside
    assert outer.closed  # last borrower released -> deferred close
    assert not fresh.closed


def test_close_defers_borrowed_handles():
    clock = FakeClock()
    m = _mgr({}, clock)
    idle = m.get_or_create("idle")
    cm = m.use("busy")
    busy = cm.__enter__()
    m.close()
    assert idle.closed  # nothing in flight -> closed immediately
    assert not busy.closed  # borrowed -> deferred
    cm.__exit__(None, None, None)
    assert busy.closed
    with pytest.raises(RuntimeError):
        m.get_or_create("idle")


def test_slow_factory_does_not_block_other_ids():
    """Creation runs outside the global lock: while one store's factory
    is blocked, get_or_create of a DIFFERENT id completes (ADVICE r6)."""
    import threading

    gate = threading.Event()
    entered = threading.Event()

    def factory(sid):
        if sid == "slow":
            entered.set()
            assert gate.wait(timeout=10), "gate never opened"
        return Handle(sid)

    m = EngineManager(factory=factory)
    t = threading.Thread(target=m.get_or_create, args=("slow",))
    t.start()
    assert entered.wait(timeout=10)
    # the slow creation is parked inside factory(); this must not hang
    fast = m.get_or_create("fast")
    assert fast.sid == "fast"
    gate.set()
    t.join(timeout=10)
    assert not t.is_alive()
    assert m.stats()["handles"] == 2
    m.close()


def test_racing_creators_of_same_id_deduplicate():
    import threading

    calls = []
    release = threading.Event()
    started = threading.Event()

    def factory(sid):
        calls.append(sid)
        started.set()
        assert release.wait(timeout=10)
        return Handle(sid)

    m = EngineManager(factory=factory)
    got = []
    threads = [
        threading.Thread(target=lambda: got.append(m.get_or_create("x")))
        for _ in range(4)
    ]
    threads[0].start()
    assert started.wait(timeout=10)
    for t in threads[1:]:
        t.start()
    release.set()
    for t in threads:
        t.join(timeout=10)
    assert len(calls) == 1  # factory ran exactly once
    assert len(got) == 4 and all(h is got[0] for h in got)
    m.close()


def test_base_exception_in_factory_does_not_wedge_the_id():
    """A BaseException escaping the factory (KeyboardInterrupt — e.g.
    Ctrl-C during a slow engine build) must clear the per-id in-progress
    marker and wake waiters; a later get_or_create for the same id must
    run the factory again instead of blocking forever, and the interrupt
    must NOT count toward the circuit."""
    state = {"raise_interrupt": True}

    def factory(sid):
        if state["raise_interrupt"]:
            state["raise_interrupt"] = False
            raise KeyboardInterrupt()
        return Handle(sid)

    m = EngineManager(factory=factory)
    with pytest.raises(KeyboardInterrupt):
        m.get_or_create("a")
    # no wedge: the retry creates normally (a hang here fails via the
    # thread timeout rather than blocking the suite)
    import threading

    got = []
    t = threading.Thread(target=lambda: got.append(m.get_or_create("a")))
    t.start()
    t.join(timeout=10)
    assert not t.is_alive() and len(got) == 1
    # interrupt did not count as a circuit failure
    assert m.stats()["failures_tracked"] == 0
    m.close()
