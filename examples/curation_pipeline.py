"""End-to-end LLM training-data curation over the fixture corpus.

The pipeline a 100 TB pretraining prep would run, at toy scale:

    1. exact + near-dup + verbatim-substring dedup   (functions/dedup)
    2. benchmark decontamination                      (curation.decontaminate)
    3. quality gate                                   (pipeline.curate)
    4. temperature-rebalanced language mix            (curation.temperature_sample)
    5. sequence packing for the trainer               (curation.pack_sequences)

Every stage is a lazy DataFrame builder — one action at the end executes
the whole DAG.  Run directly:

    python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from streamkit_spark import tables  # noqa: E402
from streamkit_spark.functions import curation as C  # noqa: E402
from streamkit_spark.pipeline import CurationConfig, curate  # noqa: E402
from streamkit_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curation_example")
    docs = tables.load(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1+3: dedup (exact, MinHash-LSH near-dup, quote-inclusion
    # containment, winnowing substring) + quality
    cfg = CurationConfig(substring_min_shared=3, containment_threshold=0.8)
    clean = curate(docs, cfg)

    # observability: where did the docs go?  (same stage frames
    # curate() executes — pipeline.curation_funnel)
    from streamkit_spark.pipeline import curation_funnel

    curation_funnel(docs, cfg).show()

    # 2: drop anything overlapping the held-out benchmark slice
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    clean = C.decontaminate(clean, bench, n=4, max_shared=0)

    # 4: flatten the language distribution toward the budget
    sampled = C.temperature_sample(
        clean, alpha=0.5, budget_docs=int(n0 * 0.6)
    )

    # 5: pack into fixed-length training sequences
    packed = C.pack_sequences(sampled, budget=512, bucket_width=64)

    n_packed = packed.count()
    # max() is NULL on an empty frame (everything filtered out) — coalesce
    # so the arithmetic below stays an int
    n_seq = packed.agg(F.coalesce(F.max("pack_id"), F.lit(-1))).collect()[0][0]
    print(f"docs in:      {n0}")
    print(f"after curate+decontaminate+sample: {sampled.count()}")
    print(f"packed rows:  {n_packed} into {n_seq + 1} sequences of 512 tokens")
    sampled.groupBy("lang").count().orderBy("lang").show()


if __name__ == "__main__":
    main()
