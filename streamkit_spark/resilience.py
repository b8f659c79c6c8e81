"""Retry policies (SURVEY §2.9 T12).

Mirrors the reference's taxonomy-driven retry
(/root/reference/pkg/client/resilience.go:31-241): transient errors retry
with exponential backoff + jitter; permanent errors fail fast.  Policy
defaults match the reference (default: 5 attempts, 100ms→5s ×2.0;
aggressive: 8 attempts, 200ms→15s ×1.5; ±25% jitter), with a
deterministic no-jitter mode for tests (reference:
STREAMKIT_TEST_NO_JITTER, resilience.go:206-216).

Spark already retries *tasks*; this wraps engine-level operations —
produce conflicts, flaky object-store calls — where the retry decision
depends on the error type.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable
from dataclasses import dataclass
from typing import TypeVar

from streamkit_spark.errors import StreamkitError

T = TypeVar("T")


@dataclass(frozen=True)
class RetryPolicy:
    max_attempts: int = 5
    base_delay_s: float = 0.1
    max_delay_s: float = 5.0
    multiplier: float = 2.0
    jitter: float = 0.25  # ±fraction; 0 = deterministic

    def delay(self, attempt: int, rng: random.Random | None = None) -> float:
        d = min(self.base_delay_s * (self.multiplier ** attempt), self.max_delay_s)
        if self.jitter and rng is not None:
            d *= 1 + rng.uniform(-self.jitter, self.jitter)
        elif self.jitter:
            d *= 1 + random.uniform(-self.jitter, self.jitter)
        return d


DEFAULT_POLICY = RetryPolicy()
AGGRESSIVE_POLICY = RetryPolicy(
    max_attempts=8, base_delay_s=0.2, max_delay_s=15.0, multiplier=1.5
)
NO_JITTER_POLICY = RetryPolicy(jitter=0.0, base_delay_s=0.0, max_delay_s=0.0)


def is_transient(exc: BaseException) -> bool:
    if isinstance(exc, StreamkitError):
        return exc.transient
    # unknown infrastructure errors default to retryable, like the
    # reference's azure classifier treating 5xx/timeouts as transient
    return not isinstance(exc, (ValueError, TypeError, KeyError))


def with_retries(
    fn: Callable[[], T],
    policy: RetryPolicy = DEFAULT_POLICY,
    classify: Callable[[BaseException], bool] = is_transient,
    sleep: Callable[[float], None] = time.sleep,
    on_retry: Callable[[int, BaseException], None] | None = None,
) -> T:
    """Run ``fn``; retry transient failures per policy; re-raise permanent
    ones immediately and the last transient one after exhaustion."""
    last: BaseException | None = None
    for attempt in range(policy.max_attempts):
        try:
            return fn()
        except BaseException as exc:  # noqa: BLE001 — classified below
            if not classify(exc):
                raise
            last = exc
            if attempt + 1 >= policy.max_attempts:
                break
            if on_retry is not None:
                on_retry(attempt, exc)
            sleep(policy.delay(attempt))
    assert last is not None
    raise last
