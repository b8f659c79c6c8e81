"""Model-based property test: LeaseStore vs an in-memory reference model
implementing lease.go's semantics literally.  Random op sequences must
agree op-for-op (the file-backed store adds durability, never behavior)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from streamkit_spark.operators.lease import LeaseStore

KEYS = ["a", "b"]
HOLDERS = ["w1", "w2"]


class Model:
    """Literal transcription of lease.go Acquire/Renew/Release/sweep."""

    def __init__(self):
        self.leases: dict[str, tuple[str, int]] = {}

    def _sweep(self, now):
        self.leases = {k: v for k, v in self.leases.items() if v[1] > now}

    def acquire(self, key, holder, ttl, now):
        self._sweep(now)
        cur = self.leases.get(key)
        if cur is not None and cur[0] != holder:
            return False
        self.leases[key] = (holder, now + ttl)
        return True

    def renew(self, key, holder, ttl, now):
        self._sweep(now)
        cur = self.leases.get(key)
        if cur is None or cur[0] != holder:
            return False
        self.leases[key] = (holder, now + ttl)
        return True

    def release(self, key, holder, now):
        cur = self.leases.get(key)
        if cur is None or cur[0] != holder:
            return False
        del self.leases[key]
        return True


op_st = st.tuples(
    st.sampled_from(["acquire", "renew", "release"]),
    st.sampled_from(KEYS),
    st.sampled_from(HOLDERS),
    st.integers(min_value=1, max_value=500),  # ttl
    st.integers(min_value=0, max_value=400),  # clock advance before the op
)


@settings(max_examples=40, deadline=None)
@given(st.lists(op_st, min_size=1, max_size=25))
def test_lease_store_matches_reference_model(tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("leases"))
    now = [1_000_000]
    store = LeaseStore(root, clock=lambda: now[0])
    model = Model()
    for op, key, holder, ttl, advance in ops:
        now[0] += advance
        if op == "acquire":
            got = store.acquire(key, holder, ttl)
            want = model.acquire(key, holder, ttl, now[0])
        elif op == "renew":
            got = store.renew(key, holder, ttl)
            want = model.renew(key, holder, ttl, now[0])
        else:
            got = store.release(key, holder)
            want = model.release(key, holder, now[0])
        assert got == want, f"{op}({key},{holder},ttl={ttl}) diverged"
        # model sweeps only inside acquire/renew (as lease.go does);
        # compare live views (snapshot filters expired on both sides)
        live = {(l.key, l.holder, l.expires_at) for l in store.snapshot()}
        want_live = {
            (k, h, e) for k, (h, e) in model.leases.items() if e > now[0]
        }
        assert live == want_live
