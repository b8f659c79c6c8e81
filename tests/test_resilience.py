"""Retry policy behavior (T12) + concurrent high-volume produce
(reference: test/high_volume_integration_test.go:16-80 semantics —
concurrent producers on separate segments, single winner per segment)."""

from __future__ import annotations

import threading

import pytest

from streamkit_spark.errors import (
    ConcurrentWriteError,
    SequenceMismatchError,
    ValidationError,
)
from streamkit_spark.operators import invariants
from streamkit_spark.operators.produce import Store
from streamkit_spark.resilience import (
    NO_JITTER_POLICY,
    RetryPolicy,
    with_retries,
)


def test_transient_retries_then_succeeds():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise ConcurrentWriteError("lost race")
        return "ok"

    assert with_retries(flaky, NO_JITTER_POLICY) == "ok"
    assert len(calls) == 3


def test_permanent_fails_fast():
    calls = []

    def bad():
        calls.append(1)
        raise ValidationError("malformed")

    with pytest.raises(ValidationError):
        with_retries(bad, NO_JITTER_POLICY)
    assert len(calls) == 1


def test_exhaustion_reraises_last():
    def always():
        raise ConcurrentWriteError("nope")

    with pytest.raises(ConcurrentWriteError):
        with_retries(always, RetryPolicy(max_attempts=3, base_delay_s=0, jitter=0))


def test_backoff_schedule_deterministic():
    p = RetryPolicy(max_attempts=5, base_delay_s=0.1, max_delay_s=1.0,
                    multiplier=2.0, jitter=0.0)
    assert [p.delay(i) for i in range(5)] == [0.1, 0.2, 0.4, 0.8, 1.0]


def test_concurrent_producers_distinct_segments(spark, tmp_path):
    """4 threads × distinct segments: all succeed; invariants hold
    (per-segment writes serialize, cross-segment writes parallelize —
    docs/production.md:85-91)."""
    store = Store(spark, str(tmp_path / "store"))
    errors: list[Exception] = []

    def producer(seg: str):
        try:
            for batch in range(3):
                store.produce(
                    "hv", seg,
                    [(batch * 20 + i + 1, b"p", None) for i in range(20)],
                    now_ms=1000 + batch,
                )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=producer, args=(f"seg{i}",)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    ev = store.events()
    assert ev.count() == 4 * 3 * 20
    assert invariants.check_all(ev) == {
        "i1_contiguity": 0, "i2_density": 0, "i3_trx_monotonic": 0,
    }


def test_retry_loop_resolves_produce_race(spark, tmp_path):
    """The documented client pattern: on SequenceMismatch, re-peek and
    retry — both writers' records land exactly once."""
    store = Store(spark, str(tmp_path / "store"))
    store.produce("s", "g", [(1, b"seed", None)], now_ms=1)

    def append_with_retry(payload: bytes):
        def attempt():
            last, _ = store._last_state("s", "g")
            try:
                store.produce("s", "g", [(last + 1, payload, None)], now_ms=2)
            except SequenceMismatchError as e:
                raise ConcurrentWriteError(str(e)) from e

        with_retries(attempt, RetryPolicy(max_attempts=5, base_delay_s=0, jitter=0))

    threads = [
        threading.Thread(target=append_with_retry, args=(f"w{i}".encode(),))
        for i in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    ev = store.events()
    assert ev.count() == 4
    assert invariants.check_all(ev) == {
        "i1_contiguity": 0, "i2_density": 0, "i3_trx_monotonic": 0,
    }
