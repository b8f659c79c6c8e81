"""Corpus health report — the distributional diagnostics a data team
runs BEFORE spending compute on a new crawl or source:

    1. Zipf spectrum fit        (text.zipf_fit over shingle df counts)
    2. Heaps vocabulary growth  (text.heaps_fit)
    3. Benford first-digit audit of numeric metadata
                                (analytics.benford_profile)
    4. cross-source shingle overlap (train/test-leakage matrix,
                                sketch.kmv_overlap)
    5. dedup impact per source  (minhash clusters -> source rollup)

A natural corpus reads: Zipf slope near -1 with high r2, Heaps beta in
0.4-0.8, Benford-ish digits on organic quantities, low cross-source
overlap, low dup rate.  Template-generated or contaminated data breaks
one or more of these — cheap to check (every diagnostic here is one
corpus scan plus a bounded finisher), expensive to discover after
training.  Run directly:

    python examples/corpus_diagnostics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from streamkit_spark import tables  # noqa: E402
from streamkit_spark.functions import dedup as D  # noqa: E402
from streamkit_spark.functions import text as TX  # noqa: E402
from streamkit_spark.functions.analytics import benford_profile  # noqa: E402
from streamkit_spark.functions.sketch import kmv_overlap  # noqa: E402
from streamkit_spark.session import get_spark  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="corpus_diagnostics")
    docs = tables.load(spark, sf_dir, "documents")
    events = tables.load(spark, sf_dir, "events")

    print("== Zipf spectrum (3-gram shingle document frequency) ==")
    counts = (
        docs.select(F.explode(TX.word_ngrams(F.col("text"), 3)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    TX.zipf_fit(counts).show(truncate=False)

    print("== Heaps vocabulary growth ==")
    TX.heaps_fit(docs).show(truncate=False)

    print("== Benford first-digit audit (event values) ==")
    benford_profile(events, "value").show(truncate=False)

    print("== Cross-source shingle overlap (KMV, k=256) ==")
    sh = docs.select(
        "source", F.explode(TX.word_ngrams(F.col("text"), 3)).alias("sh3")
    )
    kmv_overlap(sh, "sh3", "source", k=256).show(truncate=False)

    print("== Dedup impact per source ==")
    cl = D.duplicate_clusters(D.minhash_lsh_pairs(docs, threshold=0.6))
    flagged = docs.join(
        cl.select("doc_id", F.lit(1).alias("dup")), "doc_id", "left"
    )
    (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce(F.col("dup"), F.lit(0))).alias("n_dup"),
        )
        .withColumn(
            "dup_rate", F.round(F.col("n_dup") / F.col("n_docs"), 4)
        )
        .orderBy("source")
        .show(truncate=False)
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
