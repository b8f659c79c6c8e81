"""Containment candidate-growth probe (VERDICT r9 item #3): measure how
the PPJoin-prefix candidate set of ``dedup.containment_pairs`` grows with
corpus size, the way round 6 probed editdist blocking.

For each subsample size N of the sf0.1 documents fixture this reports
  - n_candidates: distinct (id_a, id_b) candidate pairs BEFORE verify
    (the df×prefix fan-out term the operator documents honestly)
  - n_pairs: verified pairs at threshold
  - wall_s: end-to-end operator wall time
and fits the log-log slope of n_candidates vs N (slope ~1 = linear
blocking, ~2 = quadratic).  Results are printed as ONE JSON object to
stdout; merge into BENCH_scaling.json under "containment_growth_probe".

Usage: python tools/probe_containment_growth.py [--threshold 0.8]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument(
        "--sizes", default="500,1000,2000,3500,5000",
        help="comma-separated subsample sizes (docs ordered by doc_id)",
    )
    ap.add_argument(
        "--max-df", type=int, default=None,
        help="probe the df-cut candidate path instead of exact recall",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from streamkit_spark import tables
    from streamkit_spark.functions.dedup import (
        containment_candidates,
        containment_pairs,
    )
    from streamkit_spark.session import get_spark

    spark = get_spark(app_name="containment_growth_probe")
    docs_all = tables.load(spark, args.sf_dir, "documents")
    total = docs_all.count()

    points = []
    for n in [int(s) for s in args.sizes.split(",") if int(s) <= total]:
        sub = docs_all.orderBy("doc_id").limit(n).localCheckpoint()
        t0 = time.perf_counter()
        n_cand = containment_candidates(
            sub, threshold=args.threshold, max_df=args.max_df
        ).count()
        t_cand = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_pairs = containment_pairs(
            sub, threshold=args.threshold, max_df=args.max_df
        ).count()
        t_full = time.perf_counter() - t0
        points.append(
            {
                "n_docs": n,
                "n_candidates": n_cand,
                "n_pairs": n_pairs,
                "cand_wall_s": round(t_cand, 3),
                "full_wall_s": round(t_full, 3),
            }
        )
        print(f"# n={n}: cand={n_cand} pairs={n_pairs} "
              f"cand_wall={t_cand:.2f}s full_wall={t_full:.2f}s",
              file=sys.stderr)

    # log-log least-squares slope of candidates vs corpus size
    xs = [math.log(p["n_docs"]) for p in points if p["n_candidates"] > 0]
    ys = [math.log(p["n_candidates"]) for p in points if p["n_candidates"] > 0]
    slope = None
    if len(xs) >= 2:
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        sxx = sum((x - mx) ** 2 for x in xs)
        sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        slope = round(sxy / sxx, 3) if sxx > 0 else None

    # the tail slope (last 3 points) is the scale-relevant exponent: the
    # smallest subsample is degenerate (near-zero candidates) and drags
    # the global fit
    txs, tys = xs[-3:], ys[-3:]
    tail_slope = None
    if len(txs) >= 2:
        mx, my = sum(txs) / len(txs), sum(tys) / len(tys)
        sxx = sum((x - mx) ** 2 for x in txs)
        sxy = sum((x - mx) * (y - my) for x, y in zip(txs, tys))
        tail_slope = round(sxy / sxx, 3) if sxx > 0 else None

    print(json.dumps({
        "metric": "containment_candidate_growth",
        "threshold": args.threshold,
        "max_df": args.max_df,
        "points": points,
        "loglog_slope_candidates": slope,
        "tail_slope_candidates": tail_slope,
    }))


if __name__ == "__main__":
    main()
