"""Wire adapter (SURVEY §2.1 S8): the envelope codec that carries entry
streams over byte-oriented transports.

The reference moves entries over WebSocket / in-proc muxers with a binary
codec (pkg/api/bidi_stream_enumerator.go; internal/codec/codec.go) — the
transport loop itself is what Spark's exchange + source framework already
owns.  What a Spark engine genuinely needs is the CODEC: a deterministic,
self-describing line format any byte-stream source can carry, so the same
parse/format pair serves

* ``spark.readStream.format("socket")``   (the WebSocket analog),
* ``spark.readStream.text(dir)``          (file tailing),
* kafka ``value`` columns,

batch or streaming alike (both are plain column expressions).

Format: one JSON object per line, payload base64-encoded (JSON is not
8-bit-clean; the reference's codec solves the same problem with explicit
length-prefixed binary framing — codec.go:55-138).  Field set == the
envelope schema, so parse(format(x)) == x exactly; round-trip parity is
tested batch and stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streamkit_spark.schema import EVENTS_SCHEMA

# envelope-on-the-wire: payload carried as base64 text
_WIRE_SCHEMA = T.StructType(
    [
        f if f.name != "payload" else T.StructField("payload", T.StringType(), False)
        for f in EVENTS_SCHEMA.fields
    ]
)


def format_envelope_lines(events: DataFrame, out_col: str = "value") -> DataFrame:
    """events → one JSON line per entry (the wire representation).

    Deterministic: fields serialize in schema order, payload as base64 —
    equal rows produce byte-identical lines."""
    cols = [
        F.base64(F.col(f.name)).alias(f.name) if f.name == "payload" else F.col(f.name)
        for f in EVENTS_SCHEMA.fields
    ]
    return events.select(F.to_json(F.struct(*cols)).alias(out_col))


def parse_envelope_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON lines → typed envelope rows (the receive side).

    Malformed lines surface as nulls in required fields (from_json
    PERMISSIVE mode) — filter or route them to a dead-letter sink; the
    reference's codec raises per-frame decode errors at the same spot."""
    parsed = lines.select(
        F.from_json(F.col(value_col), _WIRE_SCHEMA).alias("e")
    ).select("e.*")
    return parsed.withColumn("payload", F.unbase64(F.col("payload")))


def wire_roundtrip(events: DataFrame) -> DataFrame:
    """parse(format(events)) — identity by construction; used by parity
    tests batch-side and stream-side."""
    return parse_envelope_lines(format_envelope_lines(events))
