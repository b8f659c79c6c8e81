"""r12 interleaved A/B: OLD (git HEAD) vs NEW (working tree) for the
operators touched this round, alternated within ONE session so external
load bursts hit both arms equally.

Loads the HEAD versions of dedup.py / similarity.py as sibling modules in
the same package (relative imports keep working), builds each bench-shaped
query with both implementations, and times noop-sink execs alternating
O,N,O,N,... per entry.  Also proves candidate/output identity.

Usage: python tools/ab_r12.py [--runs 4] [--sf /root/testdata/sf0.1]
       [--only jaccard,containment,labelprop]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_old(rel: str, name: str):
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"HEAD:{rel}"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = os.path.join(REPO, "streamkit_spark", "functions", f"{name}.py")
    with open(path, "w") as f:
        f.write(src)
    import importlib

    try:
        mod = importlib.import_module(f"streamkit_spark.functions.{name}")
    except BaseException:
        # the file is written BEFORE the import — an import failure
        # (HEAD source referencing a since-renamed symbol) must not
        # strand a stale module copy in the committed package dir
        if os.path.exists(path):
            os.remove(path)
        raise
    return mod, path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    # load INSIDE the try so a failed second load / interrupt can never
    # strand a stale module copy in the committed package directory
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
        run(args, only, OLD_D, OLD_S)
    finally:
        for p in paths:
            if os.path.exists(p):
                os.remove(p)


def run(args, only, OLD_D, OLD_S) -> None:
    from pyspark.sql import functions as F

    from streamkit_spark import tables
    from streamkit_spark.functions import dedup as NEW_D
    from streamkit_spark.functions import similarity as NEW_S
    from streamkit_spark.session import get_spark

    spark = get_spark(app_name="ab_r12")
    sf = args.sf
    docs = tables.load(spark, sf, "documents")
    emb = tables.load(spark, sf, "embeddings")
    for t in tables.TABLE_NAMES:
        tables.load(spark, sf, t).count()

    def jacc(mod):
        out = mod.ngram_jaccard_pairs(docs, n=3, threshold=0.6)
        return out.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))

    def cont(mod):
        return mod.containment_pairs(docs, threshold=0.6)

    def labelprop(simmod):
        edges = simmod.knn_graph(emb, k=5, method="ivf", n_centroids=16, nprobe=2)
        seeds = emb.filter(F.col("vec_id") % 5 == 0).select("vec_id", "label")
        return simmod.label_propagation(
            edges, seeds, emb.select("vec_id"), n_iter=3
        )

    def edit(mod):
        return mod.editdist_pairs(docs, threshold=0.9, max_df=32)

    def tfidf(mod):
        return mod.tfidf_cosine_pairs(docs, threshold=0.3, max_df=64, ngram=3)

    entries = {
        "jaccard": (lambda: jacc(OLD_D), lambda: jacc(NEW_D)),
        "containment": (lambda: cont(OLD_D), lambda: cont(NEW_D)),
        "labelprop": (lambda: labelprop(OLD_S), lambda: labelprop(NEW_S)),
        "editdist": (lambda: edit(OLD_D), lambda: edit(NEW_D)),
        "tfidf": (lambda: tfidf(OLD_D), lambda: tfidf(NEW_D)),
    }

    for name, (old_fn, new_fn) in entries.items():
        if only and name not in only:
            continue
        # identity proof first (build once each, exceptAll both ways)
        o_df, n_df = old_fn(), new_fn()
        d1 = o_df.exceptAll(n_df).count()
        d2 = n_df.exceptAll(o_df).count()
        print(f"# {name}: identity exceptAll old-new={d1} new-old={d2}",
              file=sys.stderr, flush=True)
        olds, news = [], []
        for r in range(args.runs):
            for tag, fn, acc in (("old", old_fn, olds), ("new", new_fn, news)):
                spark.sparkContext.setJobDescription(f"ab:{name}:{tag}:{r}")
                t0 = time.perf_counter()
                df = fn()
                df.write.format("noop").mode("overwrite").save()
                acc.append(time.perf_counter() - t0)
        om = sorted(olds)[len(olds) // 2]
        nm = sorted(news)[len(news) // 2]
        print(
            f"# {name}: old med {om:.2f}s new med {nm:.2f}s "
            f"(old {[round(x,2) for x in sorted(olds)]}, "
            f"new {[round(x,2) for x in sorted(news)]}) "
            f"loadavg {os.getloadavg()}",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
