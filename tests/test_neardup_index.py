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


def test_embedding_index_cross_batch(spark, tmp_path):
    import random

    from streamkit_spark.streaming.neardup import EmbeddingDupIndex

    rng = random.Random(7)

    def vec(seed=None, base=None, jitter=0.0):
        if base is None:
            return [rng.gauss(0, 1) for _ in range(16)]
        return [x + rng.gauss(0, jitter) for x in base]

    v1, v2 = vec(), vec()
    idx = EmbeddingDupIndex(
        spark, str(tmp_path / "edx"), dim=16, threshold=0.95, bits=6, n_tables=6
    )
    b1 = idx.process_batch(
        spark.createDataFrame(
            [(1, v1), (2, v2)], "vec_id long, embedding array<double>"
        )
    ).collect()
    assert all(r["dup_of"] is None for r in b1)

    # near-copy of v1 in a later batch + an unrelated vector
    b2 = {
        r["vec_id"]: r
        for r in idx.process_batch(
            spark.createDataFrame(
                [(3, vec(base=v1, jitter=0.01)), (4, vec())],
                "vec_id long, embedding array<double>",
            )
        ).collect()
    }
    assert b2[3]["dup_of"] == 1 and b2[3]["cos"] > 0.95
    assert b2[4]["dup_of"] is None
    assert sorted(r["vec_id"] for r in idx.vecs().collect()) == [1, 2, 4]

    # replay of batch 2 is recognized, state unchanged
    n = idx.vecs().count()
    replay = {
        r["vec_id"]: r["dup_of"]
        for r in idx.process_batch(
            spark.createDataFrame(
                [(4, b2[4]["embedding"])], "vec_id long, embedding array<double>"
            )
        ).collect()
    }
    assert replay[4] is None and idx.vecs().count() == n


def test_embedding_index_streaming_attach(spark, tmp_path):
    import random

    from streamkit_spark.streaming.neardup import EmbeddingDupIndex

    rng = random.Random(11)
    v1 = [rng.gauss(0, 1) for _ in range(16)]
    v2 = [rng.gauss(0, 1) for _ in range(16)]
    near1 = [x + rng.gauss(0, 0.01) for x in v1]
    batch = spark.createDataFrame(
        [(1, v1), (2, v2), (3, near1)], "vec_id long, embedding array<double>"
    )
    src = tmp_path / "vsrc"
    src.mkdir()
    batch.repartition(1).write.mode("append").parquet(str(src))
    idx = EmbeddingDupIndex(
        spark, str(tmp_path / "edx2"), dim=16, threshold=0.95, bits=6, n_tables=6
    )
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    q = idx.attach(stream, str(tmp_path / "vout"), str(tmp_path / "vckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = {
        r["vec_id"]: r["dup_of"]
        for r in spark.read.parquet(str(tmp_path / "vout")).collect()
    }
    assert out == {1: None, 2: None, 3: 1}
    assert sorted(r["vec_id"] for r in idx.vecs().collect()) == [1, 2]
