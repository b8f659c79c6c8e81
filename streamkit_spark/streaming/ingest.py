"""Streaming ingestion into an engine Store (SURVEY §2.1 S5 streaming
form + §2.9 T11): records arrive on a stream and are appended with full
produce semantics — per-segment contiguous sequencing, chunk TRX lineage,
single-writer validation.

``foreachBatch`` gives exactly the reference's commit model: one atomic
commit point per micro-batch per segment, statuses observable after each
batch.  Exactly-once is achieved with a write-ahead epoch plan: before
appending, the batch's per-segment base sequences are persisted under the
epoch id; a replayed batch reuses the SAME plan, so its appends collide
with the already-landed rows (SequenceMismatch) and are skipped instead of
re-sequenced — the engine-side equivalent of Delta's txnAppId/txnVersion
(reference analog: the Azure WAL, azurekit/store.go:553-786).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamkit_spark.errors import SequenceMismatchError
from streamkit_spark.operators.produce import Store


def _plan_path(store: Store, query_name: str, epoch_id: int) -> str:
    d = os.path.join(store.root, "_ingest_plans", query_name)
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{epoch_id}.json")


def ingest_batch(
    store: Store,
    batch: DataFrame,
    now_ms: int | None = None,
    plan_path: str | None = None,
) -> dict:
    """Append one (micro-)batch of raw records to the store.

    ``batch`` columns: space, segment, payload, metadata (no sequence —
    sequencing is assigned here, per segment, continuing from the stored
    tail).  Ordering within a batch follows an ``__order`` column when
    present, else deterministic payload order.

    With ``plan_path``, the per-segment base sequences are read from (or
    first persisted to) the plan file, making a replay of the same batch
    idempotent.  Returns {(space, segment): n_appended} with 0 marking an
    idempotent skip."""
    order_col = "__order" if "__order" in batch.columns else "payload"
    # Bounded collect: distinct (space, segment) pairs TOUCHED BY THIS
    # MICRO-BATCH — segments an ingest source feeds per trigger, not the
    # store's inventory.  Same for the per-group row collect below: one
    # micro-batch's rows for one segment (produce() itself needs the
    # records driver-side to assign contiguous sequences).
    groups = [
        (r["space"], r["segment"])
        for r in batch.select("space", "segment").distinct().collect()
    ]
    plan: dict[str, int] = {}
    if plan_path is not None and os.path.exists(plan_path):
        with open(plan_path) as f:
            plan = json.load(f)

    # first attempt: fix the bases now, persist BEFORE appending
    if plan_path is not None and not plan:
        for space, segment in sorted(groups):
            last, _ = store._last_state(space, segment)
            plan[f"{space}\x00{segment}"] = last + 1
        tmp = plan_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(plan, f)
        os.replace(tmp, plan_path)

    results: dict = {}
    plan_dirty = False
    for space, segment in sorted(groups):
        rows = (
            batch.filter(
                (F.col("space") == space) & (F.col("segment") == segment)
            )
            .orderBy(order_col)
            .select("payload", "metadata")
            .collect()
        )
        key = f"{space}\x00{segment}"
        if plan:
            base = plan.get(key)
            if base is None:
                # group absent from the persisted plan (source replayed a
                # superset batch): fall back to the store tail and extend
                # the plan so a further replay of THIS group is idempotent
                base = store._last_state(space, segment)[0] + 1
                plan[key] = base
                plan_dirty = True
        else:
            base = store._last_state(space, segment)[0] + 1
        records = [
            (base + i, bytes(r["payload"]), r["metadata"])
            for i, r in enumerate(rows)
        ]
        if plan_path is not None and plan_dirty:
            tmp = plan_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(plan, f)
            os.replace(tmp, plan_path)
            plan_dirty = False
        try:
            store.produce(space, segment, records, now_ms=now_ms)
            results[(space, segment)] = len(records)
        except SequenceMismatchError:
            # The planned span is occupied — but only OUR OWN rows make it
            # a replay.  A foreign writer landing in the planned range
            # would otherwise be silently misread as one (silent loss of
            # this batch), so verify per-sequence payload fingerprints
            # before skipping (bounded read: the batch's own span).
            if _span_matches(store, space, segment, base, records):
                results[(space, segment)] = 0
            else:
                raise
    return results


def _span_matches(
    store: Store, space: str, segment: str, base: int, records: list
) -> bool:
    """True iff events[base .. base+n-1] for this segment hold exactly the
    payloads this batch planned to write (md5 per sequence)."""
    import hashlib

    if not records:
        return True
    end = base + len(records) - 1
    stored = {
        r["sequence"]: r["h"]
        for r in (
            store.events()
            .filter(
                (F.col("space") == space)
                & (F.col("segment") == str(segment))
                & F.col("sequence").between(base, end)
            )
            .select("sequence", F.md5(F.col("payload")).alias("h"))
            .collect()
        )
    }
    ours = {
        seq: hashlib.md5(payload).hexdigest()
        for seq, payload, _ in records
    }
    return stored == ours


def stream_into_store(
    stream: DataFrame,
    store: Store,
    checkpoint: str,
    query_name: str = "ingest",
):
    """Start a streaming query appending ``stream`` into ``store`` with
    produce semantics; checkpoint + epoch plans give exactly-once."""

    def run(batch: DataFrame, epoch_id: int) -> None:
        ingest_batch(
            store, batch, plan_path=_plan_path(store, query_name, epoch_id)
        )

    return (
        stream.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .start()
    )
