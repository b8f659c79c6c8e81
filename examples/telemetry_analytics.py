"""Event-telemetry analytics over the fixture event stream.

The read-side companion to examples/curation_pipeline.py: the reports an
operations/product team runs over the same streamkit event table the
engine serves (space=event_type, segment=user_id), each one a
scale-shaped block from functions/analytics, functions/sketch and
functions/layout:

    1. behavioural flow      event_transitions (per-user lag window)
    2. retention             retention_cohorts (integer day math)
    3. distribution health   value_histogram + quantile_report (order
                             statistics + sketch-accuracy contract)
    4. anomalies             iqr_outliers (Tukey fences, no double sums)
    5. big-join hygiene      bloom_report (semi-join pre-filter accounting)
    6. layout audit          zorder_stats (2-D pruning spans)

Run directly:

    python examples/telemetry_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from streamkit_spark import tables  # noqa: E402
from streamkit_spark.functions import analytics as A  # noqa: E402
from streamkit_spark.functions import sketch as SK  # noqa: E402
from streamkit_spark.functions.layout import zorder_stats  # noqa: E402
from streamkit_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="telemetry_example")
    ev = tables.load(spark, sf_dir, "events")

    print("== top behavioural transitions ==")
    A.event_transitions(ev).orderBy(F.desc("n")).show(5, truncate=False)

    print("== weekly retention by first-day cohort ==")
    evd = ev.select("user_id", F.expr("ts div 1000000").alias("ts_ms"))
    A.retention_cohorts(evd, "user_id", "ts_ms").show(10)

    print("== value distribution per event type ==")
    A.quantile_report(ev, "value", "event_type").show()

    print("== Tukey-fence outliers ==")
    A.iqr_outliers(ev, "value", "event_type").show()

    print("== Bloom pre-filter accounting (BUILDING customers ⋉ orders) ==")
    cust = tables.load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = tables.load(spark, sf_dir, "orders")
    SK.bloom_report(orders, "o_custkey", cust, "c_custkey").show()

    print("== Z-order pruning spans over (user, day) ==")
    evz = ev.select("user_id", F.expr("ts div 1000000 div 86400000").alias("day"))
    zorder_stats(evz, ["user_id", "day"], bits=16, bucket_shift=8).show(8)


if __name__ == "__main__":
    main()
