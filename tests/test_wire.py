"""Wire adapter (S8 analog): JSON-lines envelope codec round-trip parity,
batch and streaming, including binary payloads and metadata maps."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamkit_spark.operators.produce import Store
from streamkit_spark.streaming.wire import (
    format_envelope_lines,
    parse_envelope_lines,
    wire_roundtrip,
)


def _norm(rows):
    out = []
    for r in rows:
        d = r.asDict()
        d["payload"] = bytes(d["payload"]).hex()
        if d.get("metadata") is not None:
            d["metadata"] = tuple(sorted(d["metadata"].items()))
        out.append(tuple((k, repr(v)) for k, v in sorted(d.items())))
    return sorted(out)


def _store(spark, tmp_path):
    store = Store(spark, str(tmp_path / "store"))
    store.produce(
        "s0",
        "g0",
        [
            (1, b"\x00\x01binary\xff", {"k": "v", "k2": "v2"}),
            (2, b"plain", None),
        ],
        now_ms=100,
    )
    store.produce("s1", "g0", [(1, b"{}", {"json": "true"})], now_ms=200)
    return store


def test_batch_roundtrip_is_identity(spark, tmp_path):
    events = _store(spark, tmp_path).events()
    assert _norm(wire_roundtrip(events).collect()) == _norm(events.collect())


def test_wire_lines_are_deterministic_json(spark, tmp_path):
    events = _store(spark, tmp_path).events()
    a = sorted(r["value"] for r in format_envelope_lines(events).collect())
    b = sorted(r["value"] for r in format_envelope_lines(events).collect())
    assert a == b
    assert all(line.startswith('{"store_id"') for line in a)


def test_stream_receive_side_parses_lines(spark, tmp_path):
    """The codec over a real byte-stream source: lines land in a dir
    (socket/kafka deliver the same single-string rows), the streaming
    parse yields typed envelope rows equal to the originals."""
    events = _store(spark, tmp_path).events()
    wire_dir = str(tmp_path / "wire")
    format_envelope_lines(events).coalesce(1).write.mode("overwrite").text(wire_dir)

    lines = spark.readStream.text(wire_dir)
    out = parse_envelope_lines(lines)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("wire_rx")
        .start()
    )
    try:
        q.processAllAvailable()
        got = _norm(spark.sql("SELECT * FROM wire_rx").collect())
    finally:
        q.stop()
    assert got == _norm(events.collect())


def test_malformed_lines_surface_as_nulls(spark):
    bad = spark.createDataFrame([("not json",), ('{"space": 3}',)], "value string")
    rows = parse_envelope_lines(bad).collect()
    assert all(r["sequence"] is None for r in rows)


def test_wire_to_store_ingestion_end_to_end(spark, tmp_path):
    """Full receive pipeline: entries formatted to wire lines (transport),
    parsed back, and ingested into a SECOND store with produce semantics —
    the engine's replication-over-the-wire analog of the reference's
    bidi-stream consume→produce loop."""
    from streamkit_spark.operators import invariants
    from streamkit_spark.streaming.ingest import stream_into_store

    src_store = _store(spark, tmp_path)
    wire_dir = str(tmp_path / "wire2")
    format_envelope_lines(src_store.events()).coalesce(1).write.mode(
        "overwrite"
    ).text(wire_dir)

    dst = Store(spark, str(tmp_path / "dst"))
    lines = spark.readStream.text(wire_dir)
    incoming = parse_envelope_lines(lines).select(
        "space", "segment", "payload", "metadata",
        F.col("sequence").alias("__order"),
    )
    q = stream_into_store(incoming, dst, str(tmp_path / "wire_ckpt"), "wire_rt")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    def key_rows(store):
        return {
            (r["space"], r["segment"], r["sequence"]): (
                bytes(r["payload"]),
                tuple(sorted(r["metadata"].items())) if r["metadata"] else None,
            )
            for r in store.events().collect()
        }

    assert key_rows(dst) == key_rows(src_store)
    assert invariants.check_all(dst.events()) == {
        "i1_contiguity": 0, "i2_density": 0, "i3_trx_monotonic": 0,
    }
