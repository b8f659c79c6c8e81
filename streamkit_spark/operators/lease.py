"""TTL lease store — the coordination-hint analog of the reference's
``internal/lease/lease.go`` (T10).

The reference keeps an in-memory map of key → (holder, expiresAt) with
Acquire / Renew / Release and a background sweeper; it is explicitly "not
for correctness; multiple workers use it to avoid redundant work on the
same key" (lease.go:30-31).  The Spark-side analog serves the same role
for jobs sharing a Store on one driver host — e.g. skipping a compaction
another driver already started — and therefore:

* persists the lease table as one small JSON file next to the store, so
  independent driver PROCESSES coordinate (the reference's per-node map
  only coordinates goroutines);
* guards every mutation with the same advisory flock the Store write path
  uses — acquire/renew/release are atomic read-modify-write;
* sweeps expired leases inline on every operation (lease.go
  ``removeExpiredLocked``) instead of a background goroutine — a Spark
  driver has no long-lived daemon to host one, and inline sweeping gives
  the same observable semantics;
* takes an injectable ``clock`` (epoch ms) so tests exercise expiry
  without sleeping.

Scale note: leases are driver-scale metadata (one row per contended
resource — segments being compacted, spaces being ingested), never
row-scale data.  Nothing here touches an executor; ``to_df`` exists only
as a diagnostics view.

Semantics parity with lease.go:
* Acquire: unowned, expired, or same-holder → grant and set expiry
  (lease.go:88-101).
* Renew: current holder + unexpired only (lease.go:104-117).
* Release: current holder only; expired-but-unswept leases can still be
  released by their holder (lease.go:119-130).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from streamkit_spark.operators.produce import _flock


def _now_ms() -> int:
    return int(time.time() * 1000)


@dataclass
class Lease:
    key: str
    holder: str
    expires_at: int  # epoch ms


class LeaseStore:
    """File-backed TTL lease table with flock-atomic operations."""

    def __init__(self, path: str, clock=None):
        self._path = os.path.join(path, "_leases.json")
        self._lock_path = os.path.join(path, "_leases.lock")
        self._clock = clock or _now_ms
        os.makedirs(path, exist_ok=True)

    # -- persistence ------------------------------------------------------

    def _read(self) -> dict[str, dict]:
        try:
            with open(self._path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {}

    def _write(self, leases: dict[str, dict]) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(leases, f)
        os.replace(tmp, self._path)  # atomic on POSIX

    @staticmethod
    def _sweep(leases: dict[str, dict], now: int) -> dict[str, dict]:
        return {k: v for k, v in leases.items() if v["expires_at"] > now}

    # -- lease.go surface -------------------------------------------------

    def acquire(self, key: str, holder: str, ttl_ms: int) -> bool:
        """Grant if unowned, expired, or re-acquired by the same holder.

        The expired-lease sweep persists even on the refusal path —
        lease.go's ``removeExpiredLocked`` mutates state before the
        holder check, so e.g. a failed renew at t ≥ expiry REMOVES the
        expired lease and a subsequent release by the old holder fails
        (caught by the model-based property test)."""
        with _flock(self._lock_path, exclusive=True):
            now = self._clock()
            leases = self._sweep(self._read(), now)
            cur = leases.get(key)
            if cur is not None and cur["holder"] != holder:
                self._write(leases)
                return False
            leases[key] = {"holder": holder, "expires_at": now + ttl_ms}
            self._write(leases)
            return True

    def renew(self, key: str, holder: str, ttl_ms: int) -> bool:
        """Extend only the current holder's unexpired lease.  The sweep
        persists on failure too (see :meth:`acquire`)."""
        with _flock(self._lock_path, exclusive=True):
            now = self._clock()
            leases = self._sweep(self._read(), now)
            cur = leases.get(key)
            if cur is None or cur["holder"] != holder:
                self._write(leases)
                return False
            leases[key] = {"holder": holder, "expires_at": now + ttl_ms}
            self._write(leases)
            return True

    def release(self, key: str, holder: str) -> bool:
        """Drop the lease if held by ``holder`` (expired-but-unswept
        included, matching lease.go Release which never checks expiry)."""
        with _flock(self._lock_path, exclusive=True):
            leases = self._read()
            cur = leases.get(key)
            if cur is None or cur["holder"] != holder:
                return False
            del leases[key]
            self._write(leases)
            return True

    def sweep(self) -> int:
        """Remove expired leases; returns how many were dropped (the
        explicit analog of the reference's background cleanup tick)."""
        with _flock(self._lock_path, exclusive=True):
            leases = self._read()
            now = self._clock()
            kept = self._sweep(leases, now)
            self._write(kept)
            return len(leases) - len(kept)

    # -- diagnostics ------------------------------------------------------

    def size(self) -> int:
        """Live (unexpired) lease count — lease.go Size()."""
        return len(self._sweep(self._read(), self._clock()))

    def snapshot(self) -> list[Lease]:
        now = self._clock()
        return sorted(
            (
                Lease(key=k, holder=v["holder"], expires_at=v["expires_at"])
                for k, v in self._sweep(self._read(), now).items()
            ),
            key=lambda l: l.key,
        )

    def to_df(self, spark):
        """Diagnostics DataFrame: (key, holder, expires_at_ms)."""
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        schema = StructType(
            [
                StructField("key", StringType(), False),
                StructField("holder", StringType(), False),
                StructField("expires_at_ms", LongType(), False),
            ]
        )
        rows = [(l.key, l.holder, l.expires_at) for l in self.snapshot()]
        return spark.createDataFrame(rows, schema)
