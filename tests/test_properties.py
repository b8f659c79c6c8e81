"""Property-based tests (hypothesis) for pure engine logic — bounds
normalization, watermark fence algebra — and a randomized produce/consume
round-trip.  The reference uses only deterministic fixtures
(docs/test_guidelines.md); property coverage is an engine addition."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from streamkit_spark.operators.consume import ConsumeBounds
from streamkit_spark.schema import MAX_CONSUME_ENTRIES, MAX_SEQUENCE
from streamkit_spark.streaming.watermark import SpaceWatermarks

seqs = st.integers(min_value=0, max_value=MAX_SEQUENCE)
ts = st.integers(min_value=0, max_value=2**52)
limits = st.integers(min_value=-10, max_value=MAX_CONSUME_ENTRIES * 2)


@given(seqs, seqs, ts, ts, limits, st.one_of(st.none(), ts))
@settings(max_examples=300, deadline=None)
def test_bounds_normalization_invariants(mn, mx, tmin, tmax, lim, now):
    b = ConsumeBounds(mn, mx, tmin, tmax, lim).normalized(now)
    # normalized bounds are always a valid scan range
    assert 0 <= b.min_sequence <= b.max_sequence <= MAX_SEQUENCE
    assert 0 < b.limit <= MAX_CONSUME_ENTRIES
    if now is not None:
        assert b.max_ts <= now  # never read past "now"
        assert b.min_ts <= now
    # idempotence: normalizing twice changes nothing
    assert b.normalized(now) == b


@given(st.lists(st.tuples(ts, st.booleans()), min_size=0, max_size=20), ts)
@settings(max_examples=200, deadline=None)
def test_watermark_fence_never_exceeds_min_active(ops, now):
    """However begins/ends interleave, the safe timestamp is always
    min(active fences) - 1, and now when idle."""
    wm = SpaceWatermarks()
    active = {}
    for fence, do_end in ops:
        tok = wm.begin("s", fence)
        active[tok] = fence
        if do_end and active:
            victim = next(iter(active))
            wm.end("s", victim)
            del active[victim]
    safe = wm.safe_max_timestamp("s", now)
    if not active:
        assert safe == now
    else:
        assert safe == min(active.values()) - 1
        # no active fence is readable
        assert all(safe < f for f in active.values())


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=3),
)
@settings(max_examples=10, deadline=None)
def test_produce_consume_roundtrip_property(spark_session_holder, n, batches):
    """Random batch sizes/counts: consume always returns 1..N in order and
    invariants hold."""
    import tempfile

    from streamkit_spark.operators import invariants
    from streamkit_spark.operators.consume import consume_segment
    from streamkit_spark.operators.produce import Store

    spark = spark_session_holder
    store = Store(spark, tempfile.mkdtemp() + "/s")
    seq = 1
    for b in range(batches):
        store.produce(
            "sp", "seg", [(seq + i, b"x", None) for i in range(n)],
            now_ms=1000 + b,
        )
        seq += n
    out = consume_segment(store.events(), "sp", "seg").collect()
    assert [r["sequence"] for r in out] == list(range(1, seq))
    assert invariants.check_all(store.events()) == {
        "i1_contiguity": 0, "i2_density": 0, "i3_trx_monotonic": 0,
    }


# hypothesis can't take pytest fixtures directly; bridge via a module fixture
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark


items_lists = st.lists(
    st.integers(min_value=0, max_value=30).map(lambda i: f"u{i}"),
    min_size=0,
    max_size=400,
)


@given(items_lists, st.integers(min_value=1, max_value=12))
@settings(max_examples=200, deadline=None)
def test_misra_gries_guarantees(items, k):
    from collections import Counter

    from streamkit_spark.streaming.heavyhitters import mg_update

    counters: dict[str, int] = {}
    dec = mg_update(counters, items, k)
    true = Counter(items)
    n = len(items)
    assert len(counters) <= k
    assert dec * (k + 1) <= n  # total decrement bound
    for it, c in true.items():
        if c > n / (k + 1):
            assert it in counters
    for it, c in counters.items():
        assert c <= true[it] <= c + dec
    # incremental == one-shot: splitting the stream anywhere is identical
    half = len(items) // 2
    c2: dict[str, int] = {}
    d2 = mg_update(c2, items[:half], k)
    d2 += mg_update(c2, items[half:], k)
    assert c2 == counters and d2 == dec


def test_plan_cache_sweeps_dead_session_entries(spark):
    """The fixture plan cache drops entries pinned to a STOPPED session
    on the next miss, and never serves a cached plan to a dead caller
    (stopping a real session would kill the shared test JVM, so deadness
    is modeled with a stub whose SparkContext has _jsc = None — exactly
    what SparkContext.stop() leaves behind)."""
    from streamkit_spark import tables
    from tests.conftest import SF_DIR

    class _DeadSC:
        _jsc = None

    class _DeadSession:
        sparkContext = _DeadSC()

    class _DeadDF:
        sparkSession = _DeadSession()

    live = tables.load(spark, SF_DIR, "region")
    assert tables.load(spark, SF_DIR, "region") is live  # warm hit
    fake_key = (-1, "/nowhere", "region")
    tables._PLAN_CACHE[fake_key] = _DeadDF()
    # a miss (fresh=True forces the build path) sweeps the dead entry
    tables.load(spark, SF_DIR, "region", fresh=True)
    assert fake_key not in tables._PLAN_CACHE
    # live entries survive the sweep and still serve warm hits
    assert tables.load(spark, SF_DIR, "region") is not None
    assert not tables._session_alive(_DeadSession())
    assert tables._session_alive(spark)
