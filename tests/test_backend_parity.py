"""Storage-backend parity (SURVEY §2.1 S7, §5): the same declared queries
must return identical results regardless of the storage format backing the
events table — the engine analog of the reference's pebble/azure matrix
("Both backends must pass the same integration test matrix",
docs/storage.md:89)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamkit_spark.operators.consume import ConsumeBounds, consume_space, peek_all
from streamkit_spark.operators.produce import Store
from streamkit_spark.operators.status import segment_status
from streamkit_spark.schema import EVENTS_SCHEMA
from streamkit_spark.sources.registry import read_source


@pytest.fixture(scope="module")
def backends(spark, tmp_path_factory):
    """One events dataset materialized through three formats."""
    root = tmp_path_factory.mktemp("backends")
    store = Store(spark, str(root / "store"))
    store.produce("s0", "g0", [(i, f"payload-{i}".encode(), {"k": str(i)}) for i in range(1, 8)], now_ms=100)
    store.produce("s0", "g1", [(1, b"solo", None)], now_ms=200)
    store.produce("s1", "g0", [(1, b"other-space", None)], now_ms=300)
    parquet_df = store.events()

    json_path = str(root / "events_json")
    parquet_df.write.mode("overwrite").json(json_path)
    orc_path = str(root / "events_orc")
    parquet_df.write.mode("overwrite").orc(orc_path)

    return {
        "parquet": parquet_df,
        "json": read_source(spark, "json", json_path, schema=EVENTS_SCHEMA),
        "orc": read_source(spark, "orc", orc_path, schema=EVENTS_SCHEMA),
    }


def _norm(rows):
    out = []
    for r in rows:
        d = r.asDict()
        if d.get("payload") is not None:
            d["payload"] = bytes(d["payload"]).hex()
        if d.get("metadata") is not None:
            d["metadata"] = tuple(sorted(d["metadata"].items()))
        out.append(tuple((k, repr(v)) for k, v in sorted(d.items())))
    return sorted(out)


@pytest.mark.parametrize("fmt", ["json", "orc"])
def test_consume_space_identical_across_backends(backends, fmt):
    base = _norm(consume_space(backends["parquet"], "s0").collect())
    other = _norm(consume_space(backends[fmt], "s0").collect())
    assert base == other


@pytest.mark.parametrize("fmt", ["json", "orc"])
def test_status_identical_across_backends(backends, fmt):
    base = _norm(segment_status(backends["parquet"]).collect())
    other = _norm(segment_status(backends[fmt]).collect())
    assert base == other


@pytest.mark.parametrize("fmt", ["json", "orc"])
def test_peek_and_bounds_identical_across_backends(backends, fmt):
    b = ConsumeBounds(min_sequence=2, max_sequence=5, min_ts=50, max_ts=250)
    base = _norm(
        consume_space(backends["parquet"], "s0", b).collect()
    ) + _norm(peek_all(backends["parquet"]).collect())
    other = _norm(
        consume_space(backends[fmt], "s0", b).collect()
    ) + _norm(peek_all(backends[fmt]).collect())
    assert base == other


def test_binary_payload_and_map_roundtrip(backends):
    """X2/X5: binary payloads and metadata maps survive every backend."""
    for fmt in ("parquet", "json", "orc"):
        row = (
            backends[fmt]
            .filter((F.col("segment") == "g0") & (F.col("sequence") == 3) & (F.col("space") == "s0"))
            .first()
        )
        assert bytes(row["payload"]) == b"payload-3", fmt
        assert row["metadata"] == {"k": "3"}, fmt


def test_csv_backend_flat_table_parity(spark, tmp_path):
    """CSV is in BATCH_FORMATS for FLAT tables only (no binary/map/array
    columns — Spark's CSV source cannot represent them; the events table
    therefore never uses it).  Parity check on the documents table."""
    from streamkit_spark import tables
    from streamkit_spark.functions.text import text_stats
    from tests.conftest import SF_DIR

    docs = tables.load(spark, SF_DIR, "documents").filter(F.col("doc_id") < 50)
    path = str(tmp_path / "docs_csv")
    docs.write.option("header", "true").mode("overwrite").csv(path)
    csv_docs = read_source(spark, "csv", path, schema=docs.schema)

    base = _norm(text_stats(docs).collect())
    other = _norm(text_stats(csv_docs).collect())
    assert base == other and len(base) == 50
