"""Typed error taxonomy, mirroring the reference's transient/permanent split
(/root/reference/pkg/api/errors.go:1-120, pkg/client/resilience.go:31-241).

Spark already retries tasks; these errors cover the *engine API* layer —
produce validation, conflict detection, malformed requests.
"""

from __future__ import annotations


class StreamkitError(Exception):
    """Base error. ``transient`` advises the caller whether a retry can help."""

    transient = False


class TransientError(StreamkitError):
    transient = True


class PermanentError(StreamkitError):
    transient = False


class SequenceMismatchError(PermanentError):
    """Expected-sequence precondition failed (optimistic concurrency loss or
    non-contiguous input — reference: pebblekit/store.go:248-250)."""

    def __init__(self, space: str, segment: str, expected: int, got: int):
        self.space, self.segment, self.expected, self.got = space, segment, expected, got
        super().__init__(
            f"sequence mismatch in {space}/{segment}: expected {expected}, got {got}"
        )


class ConcurrentWriteError(TransientError):
    """Another producer won the append race; re-peek and retry
    (reference single-winner contract, docs/limitations.md:57-60)."""


class ValidationError(PermanentError):
    """Malformed record: empty space/segment, zero sequence/ts, nil payload
    (reference client filter, pkg/client/client.go:955-969)."""
