"""TTL lease store (operators/lease.py) — semantics parity with the
reference's internal/lease/lease.go acquire/renew/release/sweep rules
(cited per-method in the module)."""

from __future__ import annotations

import threading

from streamkit_spark.operators.lease import LeaseStore


class FakeClock:
    def __init__(self, t=1_000_000):
        self.t = t

    def __call__(self):
        return self.t

    def advance(self, ms):
        self.t += ms


def make(tmp_path):
    clock = FakeClock()
    return LeaseStore(str(tmp_path)), clock


def make_clocked(tmp_path):
    clock = FakeClock()
    return LeaseStore(str(tmp_path), clock=clock), clock


def test_acquire_grants_unowned_and_blocks_other_holder(tmp_path):
    ls, clock = make_clocked(tmp_path)
    assert ls.acquire("seg/1", "w1", ttl_ms=1000)
    assert not ls.acquire("seg/1", "w2", ttl_ms=1000)  # held by w1
    assert ls.acquire("seg/1", "w1", ttl_ms=1000)  # same-holder re-acquire
    assert ls.acquire("seg/2", "w2", ttl_ms=1000)  # other key free
    assert ls.size() == 2


def test_expired_lease_is_stealable(tmp_path):
    ls, clock = make_clocked(tmp_path)
    assert ls.acquire("k", "w1", ttl_ms=1000)
    clock.advance(999)
    assert not ls.acquire("k", "w2", ttl_ms=1000)  # still valid
    clock.advance(2)  # past expiry
    assert ls.acquire("k", "w2", ttl_ms=1000)  # stolen
    assert ls.snapshot()[0].holder == "w2"


def test_renew_requires_current_unexpired_holder(tmp_path):
    ls, clock = make_clocked(tmp_path)
    assert ls.acquire("k", "w1", ttl_ms=1000)
    assert ls.renew("k", "w1", ttl_ms=5000)  # extends
    assert not ls.renew("k", "w2", ttl_ms=5000)  # wrong holder
    clock.advance(5001)
    assert not ls.renew("k", "w1", ttl_ms=1000)  # expired -> renew fails
    assert not ls.renew("missing", "w1", ttl_ms=1000)


def test_release_only_by_holder(tmp_path):
    ls, clock = make_clocked(tmp_path)
    assert ls.acquire("k", "w1", ttl_ms=1000)
    assert not ls.release("k", "w2")
    assert ls.release("k", "w1")
    assert not ls.release("k", "w1")  # already gone
    assert ls.size() == 0


def test_sweep_drops_only_expired(tmp_path):
    ls, clock = make_clocked(tmp_path)
    ls.acquire("a", "w1", ttl_ms=100)
    ls.acquire("b", "w1", ttl_ms=10_000)
    clock.advance(500)
    assert ls.sweep() == 1
    assert [l.key for l in ls.snapshot()] == ["b"]


def test_cross_instance_coordination(tmp_path):
    """Two LeaseStore instances over the same path (≈ two driver
    processes) see each other's leases — the property the reference's
    in-memory map does NOT have and the file-backed analog adds."""
    clock = FakeClock()
    a = LeaseStore(str(tmp_path), clock=clock)
    b = LeaseStore(str(tmp_path), clock=clock)
    assert a.acquire("k", "procA", ttl_ms=1000)
    assert not b.acquire("k", "procB", ttl_ms=1000)
    assert b.acquire("other", "procB", ttl_ms=1000)
    assert a.release("k", "procA")
    assert b.acquire("k", "procB", ttl_ms=1000)


def test_concurrent_acquire_single_winner(tmp_path):
    ls = LeaseStore(str(tmp_path))
    wins = []

    def worker(i):
        if ls.acquire("hot", f"w{i}", ttl_ms=60_000):
            wins.append(i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1


def test_to_df_diagnostics(spark, tmp_path):
    ls, clock = make_clocked(tmp_path)
    ls.acquire("seg/1", "w1", ttl_ms=1000)
    ls.acquire("seg/2", "w2", ttl_ms=1000)
    rows = ls.to_df(spark).orderBy("key").collect()
    assert [(r["key"], r["holder"]) for r in rows] == [
        ("seg/1", "w1"),
        ("seg/2", "w2"),
    ]
    assert all(r["expires_at_ms"] == clock() + 1000 for r in rows)
