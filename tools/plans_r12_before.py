"""Capture plans/r12/<entry>_before.txt for the entries touched this
round, from the git-HEAD (pre-r12) implementations loaded as sibling
modules — the working tree already carries the new code, so the before
plans come from HEAD sources, built into the exact bench/query shapes.

Usage: python tools/plans_r12_before.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ab_r12 import _load_old  # noqa: E402 — one loader definition

SF = "/root/testdata/sf0.1"


def main() -> None:
    paths: list[str] = []
    try:
        OLD_D, p1 = _load_old(
            "streamkit_spark/functions/dedup.py", "_old_dedup_r12"
        )
        paths.append(p1)
        OLD_S, p2 = _load_old(
            "streamkit_spark/functions/similarity.py", "_old_similarity_r12"
        )
        paths.append(p2)
        capture(OLD_D, OLD_S)
    finally:
        for p in paths:
            if os.path.exists(p):
                os.remove(p)


def capture(OLD_D, OLD_S) -> None:
    from pyspark.sql import functions as F

    from streamkit_spark import tables
    from streamkit_spark.functions import curation as C
    from streamkit_spark.session import get_spark

    spark = get_spark(app_name="plans_r12_before")
    docs = tables.load(spark, SF, "documents")
    emb = tables.load(spark, SF, "embeddings")

    def jacc():
        out = OLD_D.ngram_jaccard_pairs(docs, n=3, threshold=0.6)
        return out.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))

    def cont():
        return OLD_D.containment_pairs(docs, threshold=0.6)

    def edit():
        return OLD_D.editdist_pairs(docs, threshold=0.9, max_df=32)

    def tfidf():
        return OLD_D.tfidf_cosine_pairs(docs, threshold=0.3, max_df=64, ngram=3)

    def efftok():
        pairs = OLD_D.ngram_jaccard_pairs(docs, threshold=0.6)
        return C.effective_token_report(docs, pairs)

    def lp_ivf():
        edges = OLD_S.knn_graph(emb, k=5, method="ivf", n_centroids=16, nprobe=2)
        seeds = emb.filter(F.col("vec_id") % 5 == 0).select("vec_id", "label")
        return OLD_S.label_propagation(edges, seeds, emb.select("vec_id"), n_iter=3)

    entries = {
        "dedup_ngram_jaccard": jacc,
        "dedup_containment": cont,
        "dedup_editdist": edit,
        "tfidf_cosine": tfidf,
        "effective_tokens": efftok,
        "label_propagation_ivf": lp_ivf,
    }
    plans_dir = os.path.join(REPO, "plans", "r12")
    os.makedirs(plans_dir, exist_ok=True)
    for name, fn in entries.items():
        df = fn()
        with open(os.path.join(plans_dir, f"{name}_before.txt"), "w") as f:
            f.write(
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
        print(f"# wrote {name}_before.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
