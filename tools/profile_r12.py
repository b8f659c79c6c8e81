"""r12 optimization profiler: per-headline-entry build time, noop-sink
exec medians, and explain("formatted") capture.

Separates PLAN BUILD (python fn call, py4j round trips, any eager
checkpoint jobs) from EXEC (noop sink: evaluates every column of every
row — guide §1.4) so an optimization targets the right half.  Writes
plans to plans/r12/<name>_<tag>.txt.

Usage:
  python tools/profile_r12.py [--tag before] [--only name1,name2]
         [--runs 3] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamkit_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--only", default="")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    names = [n for n in args.only.split(",") if n] or (
        bench.HEADLINE + list(bench.EXTRA)
    )
    queries = entry.queries()
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
    )
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name="profile_r12")
    from streamkit_spark import tables

    for t in tables.TABLE_NAMES:
        tables.load(spark, args.sf, t).count()
    tables.load(spark, args.sf, "events").orderBy("event_id").limit(10).count()

    print(f"# loadavg {os.getloadavg()}", file=sys.stderr)
    out: dict[str, dict] = {}
    for name in names:
        fn = queries.get(name) or bench.EXTRA.get(name)
        if fn is None:
            print(f"# SKIP unknown {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        builds, execs = [], []
        for r in range(args.runs):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            if r == 0 and not args.no_plans:
                with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
        b_med = sorted(builds)[len(builds) // 2]
        e_med = sorted(execs)[len(execs) // 2]
        out[name] = {
            "build": round(b_med, 3),
            "exec": round(e_med, 3),
            "total": round(b_med + e_med, 3),
            "build_runs": [round(x, 3) for x in sorted(builds)],
            "exec_runs": [round(x, 3) for x in sorted(execs)],
        }
        print(
            f"# {name}: build {b_med:.2f}s exec {e_med:.2f}s "
            f"(builds {[round(x,2) for x in sorted(builds)]}, "
            f"execs {[round(x,2) for x in sorted(execs)]})",
            file=sys.stderr,
        )
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"tag": args.tag, "loadavg": list(os.getloadavg()),
                      "profile": out}))


if __name__ == "__main__":
    main()
