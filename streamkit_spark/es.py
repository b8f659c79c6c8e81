"""Event sourcing over the engine store (SURVEY §2.10 U1/U2).

Reference: /root/reference/pkg/eskit/store.go — domain events are JSON
envelopes in the payload; an aggregate is rehydrated by reading its
segment from a minimum sequence and folding events in order; saves are
optimistic appends validated against the expected version.  Mapping table
(docs/event-sourcing.md:7-13): TenantID→store, Area→space,
aggregateID→segment, version→sequence.

Spark-first: load_events is a consume_segment + from_json projection; the
fold is per-aggregate and arbitrary Python → applyInPandas (one group =
one aggregate, ordered within the group); bulk rehydration of *all*
aggregates of a space is a single grouped operation, which is the scale
win over the reference's one-aggregate-at-a-time loop.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streamkit_spark.errors import SequenceMismatchError
from streamkit_spark.operators.consume import ConsumeBounds, consume_segment
from streamkit_spark.operators.produce import Store

# JSON envelope: {"type": "...", "data": {...}} — the reference's
# polymorphic envelope (eskit/store.go:42-46) with the discriminator kept
# as a plain field.
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType(), True),
        T.StructField("data", T.StringType(), True),  # nested JSON, app-typed
    ]
)


def envelope(event_type: str, data: dict[str, Any]) -> bytes:
    return json.dumps({"type": event_type, "data": json.dumps(data)}).encode()


def load_events(
    store: Store, space: str, aggregate_id: str, min_sequence: int = 1
) -> DataFrame:
    """U1 — one aggregate's ordered event stream with decoded envelopes."""
    raw = consume_segment(
        store.events(),
        space,
        aggregate_id,
        ConsumeBounds(min_sequence=min_sequence),
    )
    env = F.from_json(F.col("payload").cast("string"), ENVELOPE_SCHEMA)
    return raw.select(
        "space",
        F.col("segment").alias("aggregate_id"),
        F.col("sequence").alias("version"),
        "ts",
        env.getField("type").alias("event_type"),
        env.getField("data").alias("event_data"),
    )


def save_events(
    store: Store,
    space: str,
    aggregate_id: str,
    expected_version: int,
    events: list[tuple[str, dict[str, Any]]],
    now_ms: int | None = None,
) -> list[dict]:
    """U2 — optimistic append: first new version must be
    ``expected_version + 1`` (eskit/store.go:74-151)."""
    records = [
        (expected_version + 1 + i, envelope(et, data), None)
        for i, (et, data) in enumerate(events)
    ]
    try:
        return store.produce(space, aggregate_id, records, now_ms=now_ms)
    except SequenceMismatchError as e:
        raise SequenceMismatchError(
            space, aggregate_id, e.expected, e.got
        ) from e


def rehydrate_all(
    store: Store,
    space: str,
    fold: Callable[[str, list[tuple[str, str]]], dict[str, Any]],
    state_schema: str,
) -> DataFrame:
    """Fold EVERY aggregate of a space in one distributed pass.

    ``fold(aggregate_id, [(event_type, event_data_json), ...])`` receives
    events in version order and returns the aggregate's state dict
    (must match ``state_schema``).  One group = one aggregate —
    applyInPandas keeps each aggregate's history together and the space's
    aggregates spread across the cluster."""
    env = F.from_json(F.col("payload").cast("string"), ENVELOPE_SCHEMA)
    events = (
        store.events()
        .filter(F.col("space") == space)
        .select(
            F.col("segment").alias("aggregate_id"),
            F.col("sequence").alias("version"),
            env.getField("type").alias("event_type"),
            env.getField("data").alias("event_data"),
        )
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("version")
        agg_id = pdf["aggregate_id"].iloc[0]
        state = fold(
            agg_id, list(zip(pdf["event_type"], pdf["event_data"]))
        )
        return pd.DataFrame([state])

    return events.groupBy("aggregate_id").applyInPandas(run, schema=state_schema)
