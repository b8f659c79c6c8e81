"""Streaming curation (streaming/curation.curate_stream): quality gate +
content dedup on a document stream; batch==stream parity."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from streamkit_spark import tables
from streamkit_spark.functions import curation as C
from streamkit_spark.streaming.curation import curate_stream
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs_stream(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("docs_stream")
    shutil.copy(f"{SF_DIR}/documents.parquet", d / "documents.parquet")
    batch = tables.load(spark, SF_DIR, "documents")
    return spark.readStream.schema(batch.schema).parquet(str(d))


def _run(spark, stream_df, name):
    q = stream_df.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()


def test_stream_equals_batch_curation(spark, docs_stream):
    batch_docs = tables.load(spark, SF_DIR, "documents")
    expected = {
        (r["doc_id"], r["fp"])
        for r in curate_stream(batch_docs).select("doc_id", "fp").collect()
    }
    got = {
        (r["doc_id"], r["fp"])
        for r in _run(spark, curate_stream(docs_stream), "curated_docs")
    }
    assert got == expected
    assert len(got) > 0


def test_stream_dedups_replayed_content(spark, tmp_path):
    batch_docs = tables.load(spark, SF_DIR, "documents").limit(20)
    # stage the same docs TWICE under different ids (content duplicates)
    dupes = batch_docs.withColumn("doc_id", F.col("doc_id") + 100_000)
    staged = str(tmp_path / "replayed")
    batch_docs.unionByName(dupes).write.parquet(staged)
    stream = spark.readStream.schema(batch_docs.schema).parquet(staged)
    rows = _run(spark, curate_stream(stream), "curated_replay")
    fps = [r["fp"] for r in rows]
    assert len(fps) == len(set(fps))  # one survivor per distinct content
    # every passing content appears exactly once, not twice
    n_pass = curate_stream(batch_docs).count()
    assert len(fps) == n_pass


def test_row_local_metrics_match_batch_aggregate_form(spark):
    """quality_metric_columns (streaming variant) must agree with the
    groupBy-based quality_rules on every metric, doc for doc."""
    docs = tables.load(spark, SF_DIR, "documents")
    agg_form = C.quality_rules(docs)
    cols = C.quality_metric_columns("text")
    row_form = docs.select(
        "doc_id", *[c.alias(n) for n, c in cols.items()]
    )
    mismatch = (
        agg_form.alias("a")
        .join(row_form.alias("r"), "doc_id")
        .filter(
            (F.col("a.n_words") != F.col("r.n_words"))
            | (F.col("a.mean_word_len") != F.col("r.mean_word_len"))
            | (F.col("a.frac_unique_words") != F.col("r.frac_unique_words"))
            | (F.col("a.stopword_hits") != F.col("r.stopword_hits"))
            | (F.col("a.top_bigram_frac") != F.col("r.top_bigram_frac"))
            | (F.col("a.passes") != F.col("r.passes"))
        )
    )
    assert mismatch.count() == 0


def test_watermarked_dedup_bounds_state(spark, tmp_path):
    """With an event-time column the stream uses watermarked dedup (state
    evictable); output still deduplicates in-window duplicates."""
    batch_docs = (
        tables.load(spark, SF_DIR, "documents")
        .limit(10)
        .withColumn("arrived", F.current_timestamp())
    )
    dupes = batch_docs.withColumn("doc_id", F.col("doc_id") + 100_000)
    staged = str(tmp_path / "wm")
    batch_docs.unionByName(dupes).write.parquet(staged)
    stream = spark.readStream.schema(batch_docs.schema).parquet(staged)
    rows = _run(
        spark,
        curate_stream(stream, watermark_col="arrived", delay="10 minutes"),
        "curated_wm",
    )
    fps = [r["fp"] for r in rows]
    assert len(fps) == len(set(fps))


def test_stream_classifier_gate_parity_and_zero_state(spark, docs_stream):
    """classifier_cutoff: pure in-row gate — stream output equals batch
    output, and the surviving scores match the batch helper exactly."""
    batch_docs = tables.load(spark, SF_DIR, "documents")
    cutoff = 0.02
    expected = {
        (r["doc_id"], r["clf_score"])
        for r in curate_stream(batch_docs, classifier_cutoff=cutoff)
        .select("doc_id", "clf_score")
        .collect()
    }
    got = {
        (r["doc_id"], r["clf_score"])
        for r in _run(
            spark,
            curate_stream(docs_stream, classifier_cutoff=cutoff),
            "curated_clf",
        )
    }
    assert got == expected and 0 < len(got)
    # scores agree with the batch quality_classifier_score helper
    helper = {
        r["doc_id"]: r["score"]
        for r in C.quality_classifier_score(batch_docs).collect()
    }
    for doc_id, s in got:
        assert s == helper[doc_id]
        assert s >= cutoff
