"""VERDICT r11 item #5: re-certify the contention-shaped 32-core
'regressions' — run each named query 7x solo at the session core count,
record loadavg + co-tenant JVMs before/after each loop, and write the
sorted runs to a committed sidecar so the next PERF diff can discount
them mechanically (max/min < 1.5 certifies the entry; a fat tail is the
burst signature, not a plan property).

Usage: python tools/recert_r12.py [--runs 7] [--sf /root/testdata/sf0.1]
       [--out BENCH_recert_r12.json] [--only a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from streamkit_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

NAMES = [
    "calibration_ece",
    "xcorr_daily",
    "jsd_sources",
    "embedding_drift",
    "rbo_sources",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_recert_r12.json"))
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    names = [n for n in args.only.split(",") if n] or NAMES

    spark = get_spark(app_name="recert_r12")
    from streamkit_spark import tables

    for t in tables.TABLE_NAMES:
        tables.load(spark, args.sf, t).count()
    queries = entry.queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = queries.get(name) or bench.EXTRA.get(name)
        if fn is None:
            print(f"# SKIP unknown {name}", file=sys.stderr)
            continue
        env0 = bench._env_snapshot()
        runs = []
        for r in range(args.runs):
            spark.sparkContext.setJobDescription(f"recert:{name}:{r}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        env1 = bench._env_snapshot()
        runs_sorted = sorted(runs)
        med = runs_sorted[len(runs_sorted) // 2]
        out[name] = {
            "runs_sorted": runs_sorted,
            "median": med,
            "max_over_min": round(runs_sorted[-1] / runs_sorted[0], 2),
            "env_start": env0,
            "env_end": env1,
        }
        print(f"# {name}: med {med}s runs {runs_sorted} "
              f"load {env1['loadavg']}", file=sys.stderr, flush=True)
    payload = {
        "metric": "recert_solo_runs_sec",
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "sf": args.sf,
        "queries": out,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({"written": args.out}))


if __name__ == "__main__":
    main()
