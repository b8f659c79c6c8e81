"""Streaming corpus curation: quality-gate + content-dedup a document
stream as it lands — the training-data analog of the reference's
subscription pipeline (continuous rows in → filtered, deduplicated rows
out) built from stateless expressions plus Spark's streaming dedup state.

Why this exists: batch curation (``pipeline.curation_report``,
``functions/curation.quality_rules``) re-reads the corpus; a 100 TB/day
ingest wants documents scored and deduplicated in the micro-batch they
arrive in, with only the dedup fingerprints as state.

* Quality gate: :func:`curation.quality_metric_columns` — row-local, no
  aggregation, so it composes with ANY output mode and adds zero state.
* Dedup: exact content dedup via md5 fingerprint ``dropDuplicates`` —
  at-least-once across restarts (same contract as T7
  ``at_least_once_dedup``; reference: docs/limitations.md:9-17).  State
  grows with #distinct fingerprints; bound it with
  ``watermark_col``/``delay`` when the stream carries an event-time
  column (duplicates separated by more than the delay then both survive,
  the standard Spark trade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamkit_spark.functions.curation import (
    classifier_score_column,
    quality_metric_columns,
)
from streamkit_spark.functions.text import fingerprint


def curate_stream(
    docs: DataFrame,
    rules: dict | None = None,
    text_col: str = "text",
    watermark_col: str | None = None,
    delay: str = "1 hour",
    keep_metrics: bool = True,
    classifier_cutoff: float | None = None,
) -> DataFrame:
    """Score → filter → dedup a (streaming or batch) document DataFrame.

    Returns the surviving documents with ``fp`` (content fingerprint) and,
    when ``keep_metrics``, the quality metric columns.  The same call on a
    batch DataFrame computes the identical result (parity-tested), so one
    definition serves both ingestion modes."""
    metrics = quality_metric_columns(text_col, rules)
    out = docs
    for name, col in metrics.items():
        out = out.withColumn(name, col)
    out = out.filter(F.col("passes")).withColumn("fp", fingerprint(text_col))
    if classifier_cutoff is not None:
        # the hashed-feature linear score is a pure in-row expression
        # (stand-in-weight path) — streaming-safe, zero state
        out = out.withColumn(
            "clf_score", F.round(classifier_score_column(text_col), 4)
        ).filter(F.col("clf_score") >= F.lit(float(classifier_cutoff)))
    if watermark_col is not None and out.isStreaming:
        # state bounded by the watermark delay: duplicates farther apart
        # than `delay` both survive (documented trade)
        out = out.withWatermark(watermark_col, delay)
        out = out.dropDuplicatesWithinWatermark(["fp"])
    else:
        out = out.dropDuplicates(["fp"])
    if not keep_metrics:
        out = out.drop(*[n for n in metrics if n != "passes"]).drop("passes")
    return out
