"""Incremental near-dup index (streaming/neardup.NearDupIndex): batches
checked against accumulated state; idempotent replay; streaming attach."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamkit_spark.streaming.neardup import NearDupIndex

DOC_A = "the quick brown fox jumps over the lazy dog again and again today"
DOC_A_NEAR = "the quick brown fox jumps over the lazy dog again and again tonight"
DOC_B = "a completely different document about spark query engines and scale"
DOC_C = "yet another unrelated text mentioning embeddings and lsh buckets loudly"


@pytest.fixture()
def index(spark, tmp_path):
    return NearDupIndex(spark, str(tmp_path / "ndx"), threshold=0.5)


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_batches_checked_against_accumulated_state(spark, index):
    b1 = index.process_batch(_mkdocs(spark, [(1, DOC_A), (2, DOC_B)])).collect()
    assert {r["doc_id"]: r["dup_of"] for r in b1} == {1: None, 2: None}

    # near-dup of doc 1 arrives in a LATER batch alongside a novel doc
    b2 = {
        r["doc_id"]: r
        for r in index.process_batch(
            _mkdocs(spark, [(3, DOC_A_NEAR), (4, DOC_C)])
        ).collect()
    }
    assert b2[3]["dup_of"] == 1 and b2[3]["est_jaccard"] >= 0.5
    assert b2[4]["dup_of"] is None
    # only novel docs were registered
    assert sorted(r["doc_id"] for r in index.sigs().collect()) == [1, 2, 4]


def test_within_batch_duplicates_point_to_smaller_id(spark, index):
    out = {
        r["doc_id"]: r["dup_of"]
        for r in index.process_batch(
            _mkdocs(spark, [(7, DOC_A), (9, DOC_A_NEAR), (8, DOC_B)])
        ).collect()
    }
    assert out == {7: None, 9: 7, 8: None}


def test_replay_is_idempotent(spark, index):
    docs = _mkdocs(spark, [(1, DOC_A), (2, DOC_B)])
    index.process_batch(docs)
    n_sigs = index.sigs().count()
    replay = {r["doc_id"]: r["dup_of"] for r in index.process_batch(docs).collect()}
    # a replayed doc meets its own registration — recognized, not a dup,
    # and the state must not grow
    assert index.sigs().count() == n_sigs
    assert index.band_rows().count() == n_sigs * index.bands
    assert replay[1] is None and replay[2] is None


def test_streaming_attach_annotates_and_registers(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    batch = _mkdocs(spark, [(1, DOC_A), (2, DOC_B), (3, DOC_A_NEAR)])
    batch.repartition(1).write.mode("append").parquet(str(src))
    idx = NearDupIndex(spark, str(tmp_path / "ndx2"), threshold=0.5)
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    q = idx.attach(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = {
        r["doc_id"]: r["dup_of"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert out == {1: None, 2: None, 3: 1}
    assert sorted(r["doc_id"] for r in idx.sigs().collect()) == [1, 2]
