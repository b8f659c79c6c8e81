"""Analytics blocks (transitions, cohorts, histogram, outliers, quantile
contract) + Bloom pre-filter semantics and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamkit_spark import tables
from streamkit_spark.functions.analytics import (
    event_transitions,
    iqr_outliers,
    quantile_report,
    retention_cohorts,
    value_histogram,
)
from streamkit_spark.functions.sketch import bloom_build, bloom_filter, bloom_report
from tests.conftest import SF_DIR


# --------------------------------------------------------------------- bloom

def test_bloom_no_false_negatives_and_bounded_fp(spark):
    cust = tables.load(spark, SF_DIR, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = tables.load(spark, SF_DIR, "orders")
    row = bloom_report(
        orders, "o_custkey", cust, "c_custkey", m=65536, h=3, hash_fn="md5"
    ).first()
    assert row["false_pos"] >= 0, "Bloom filters have no false negatives"
    assert row["bloom_pass"] >= row["exact_pass"]
    # n≈30 keys at sf0.001 / m=65536 → fpr well under 1%
    assert row["false_pos"] <= max(10, 0.01 * row["bloom_pass"])


def test_bloom_hash_paths_agree_on_semantics(spark):
    cust = tables.load(spark, SF_DIR, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = tables.load(spark, SF_DIR, "orders")
    exact = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")).distinct(),
        "o_custkey",
        "semi",
    ).count()
    for hash_fn in ("md5", "xxhash64"):
        r = bloom_report(
            orders, "o_custkey", cust, "c_custkey", m=65536, h=3, hash_fn=hash_fn
        ).first()
        assert r["exact_pass"] == exact
        assert r["bloom_pass"] >= exact


def test_bloom_filter_preserves_duplicate_rows(spark):
    keys = spark.createDataFrame([(1,), (2,)], "k long")
    big = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (9, "c")], "k long, v string"
    )
    bloom = bloom_build(keys, "k")
    got = bloom_filter(big, "k", bloom).collect()
    # both (1, "a") duplicates survive — semi-join, not groupBy
    assert sorted((r["k"], r["v"]) for r in got).count((1, "a")) == 2


def test_bloom_filter_plan_is_broadcast_semi_no_shuffle(spark):
    cust = tables.load(spark, SF_DIR, "customer").limit(50)
    orders = tables.load(spark, SF_DIR, "orders")
    bloom = bloom_build(cust, "c_custkey", m=65536, h=3)
    plan = (
        bloom_filter(orders, "o_custkey", bloom, m=65536, h=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # the big side must never shuffle: no sort-merge join, no hash
    # repartitioning of the probe stream
    assert "SortMergeJoin" not in plan


# ----------------------------------------------------------------- analytics

def test_event_transitions_counts_and_probabilities(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),
            (2, 1, "a"), (2, 2, "b"),
        ],
        "user_id long, ts long, event_type string",
    )
    got = {
        (r["prev_type"], r["next_type"]): (r["n"], r["p"])
        for r in event_transitions(df, "user_id", "event_type", ("ts",)).collect()
    }
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_retention_cohorts_buckets(spark):
    day = 86400000
    df = spark.createDataFrame(
        # user 1: days 0, 1, 8 → cohort 0, buckets 0 (d0, d1) and 1 (d8)
        # user 2: day 9 only → cohort 9, bucket 0
        [(1, 0), (1, day), (1, 8 * day), (2, 9 * day)],
        "user_id long, ts_ms long",
    )
    got = {
        (r["cohort_day"], r["offset_bucket"]): r["n_active"]
        for r in retention_cohorts(df, "user_id", "ts_ms", 7).collect()
    }
    assert got == {(0, 0): 1, (0, 1): 1, (9, 0): 1}


def test_value_histogram_buckets_exact(spark):
    df = spark.createDataFrame(
        [("x", 0.0), ("x", 49.9), ("x", 50.0), ("y", 120.0)],
        "event_type string, value double",
    )
    got = {
        (r["event_type"], r["bucket"]): (r["lo"], r["n"])
        for r in value_histogram(df, "value", "event_type", 50.0).collect()
    }
    assert got == {("x", 0): (0.0, 2), ("x", 1): (50.0, 1), ("y", 2): (100.0, 1)}


def test_iqr_outliers_matches_numpy_fences(spark):
    import numpy as np

    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    df = spark.createDataFrame(
        [("x", v) for v in vals], "event_type string, value double"
    )
    p25, p75 = np.percentile(vals, [25, 75])  # linear interpolation
    fence = p75 + 1.5 * (p75 - p25)
    r = iqr_outliers(df, "value", "event_type", 1.5).first()
    assert r["p25"] == round(p25, 4) and r["p75"] == round(p75, 4)
    assert r["hi_fence"] == round(fence, 4)
    assert r["n_outliers"] == sum(v > fence for v in vals)
    assert r["max_value"] == 100.0


def test_quantile_contract_holds_on_fixture(spark):
    ev = tables.load(spark, SF_DIR, "events")
    rows = quantile_report(ev, "value", "event_type").collect()
    assert len(rows) == 5
    assert all(r["approx_ok"] for r in rows), [
        (r["event_type"], r["approx_ok"]) for r in rows
    ]
    for r in rows:
        assert r["p50"] <= r["p90"] <= r["p99"]


def test_column_stats_exact_values(spark):
    from streamkit_spark.functions.analytics import column_stats

    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, None), (3, 40.0)],
        "user_id long, value double",
    )
    got = {r["col_name"]: r for r in column_stats(df, ("user_id", "value")).collect()}
    u = got["user_id"]
    assert (u["ndv"], u["null_count"], u["min_value"], u["max_value"]) == (3, 0, 1.0, 3.0)
    v = got["value"]
    assert (v["ndv"], v["null_count"], v["min_value"], v["max_value"]) == (3, 1, 10.0, 40.0)
    import numpy as np

    vals = [10.0, 20.0, 40.0]
    assert v["p50"] == round(float(np.percentile(vals, 50)), 4)
    assert v["p25"] == round(float(np.percentile(vals, 25)), 4)


def test_key_skew_report_flags_hot_key(spark):
    from streamkit_spark.functions.analytics import key_skew_report

    rows = [(1,)] * 90 + [(k,) for k in range(2, 12)]
    df = spark.createDataFrame(rows, "k long")
    top = key_skew_report(df, "k", top_n=3).collect()
    assert top[0]["key"] == "1"
    assert top[0]["n"] == 90 and top[0]["share"] == 0.9
    # 11 keys, 100 rows → mean 100/11; key 1 at 90 → skew ≈ 9.9
    assert top[0]["skew_x"] == round(90 * 11 / 100, 2)


def test_group_balance_gini_known_distributions(spark):
    from streamkit_spark.functions.analytics import group_balance

    even = spark.createDataFrame(
        [(f"g{i}", j) for i in range(4) for j in range(10)], "g string, x long"
    )
    r = group_balance(even, "g").first()
    assert r["gini"] == 0.0 and r["top1_share"] == 0.25
    assert r["n_groups"] == 4 and r["total"] == 40
    skewed = spark.createDataFrame(
        [("a", j) for j in range(97)] + [("b", 0), ("c", 0), ("d", 0)],
        "g string, x long",
    )
    r2 = group_balance(skewed, "g").first()
    # counts [1,1,1,97]: G = Σ(2i-n-1)x_i / (nΣx) = (-3-1+1+3*97)/400
    assert r2["gini"] == round((-3 - 1 + 1 + 3 * 97) / 400, 4)
    assert r2["top1_share"] == 0.97


def test_period_growth_math(spark):
    from streamkit_spark.functions.analytics import period_growth

    day = 86400000
    rows = (
        [("a", i * day) for i in range(0, 4)]       # week 0: 4 events
        + [("a", (7 + i) * day) for i in range(0, 6)]   # week 1: 6
        + [("a", 14 * day)]                              # week 2: 1
    )
    df = spark.createDataFrame(rows, "event_type string, ts_ms long")
    got = {r["period"]: (r["n"], r["growth"])
           for r in period_growth(df, "event_type", "ts_ms", 7).collect()}
    assert got[0] == (4, None)
    assert got[1] == (6, 0.5)
    assert got[2] == (1, round(1 / 6 - 1, 4))


# ----------------------------------------------------------------------- hll

def test_hll_distinct_accuracy_on_fixture(spark):
    from streamkit_spark.functions.sketch import hll_distinct

    ev = tables.load(spark, SF_DIR, "events")
    rows = hll_distinct(
        ev, "user_id", ["event_type"], include_exact=True
    ).collect()
    assert len(rows) > 0
    for r in rows:
        # m=256 → standard error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
        assert r["rel_err"] <= 0.20, r
        assert r["hll_estimate"] > 0


def test_hll_branch_beyond_linear_counting(spark):
    """With distinct >> m every register fills: the harmonic-mean branch
    (not linear counting) produces the estimate, still within 3 sigma."""
    from streamkit_spark.functions.sketch import hll_distinct

    n = 20000
    df = spark.range(n).select((F.col("id") * 7 + 13).alias("v"))
    est = hll_distinct(df, "v").first()["hll_estimate"]
    assert abs(est - n) / n < 0.20, est


def test_hll_registers_bounded_and_mergeable(spark):
    """Register table is ≤ 2^b rows and merges associatively: registers
    of two halves max-merged equal the whole — the property that makes
    HLL a one-pass partial agg at any scale."""
    from streamkit_spark.functions.sketch import hll_registers

    df = spark.range(5000).select(F.col("id").alias("v"))
    whole = hll_registers(df, "v", b=8)
    assert whole.count() <= 256
    lo = hll_registers(df.filter("v < 2500"), "v", b=8)
    hi = hll_registers(df.filter("v >= 2500"), "v", b=8)
    merged = (
        lo.unionByName(hi)
        .groupBy("bucket")
        .agg(F.max("r").alias("r"))
    )
    got = {(r["bucket"], r["r"]) for r in merged.collect()}
    want = {(r["bucket"], r["r"]) for r in whole.collect()}
    assert got == want


def test_hll_duplicates_and_nulls_ignored(spark):
    """Estimate is a function of the distinct value set: duplicating
    every row and adding NULLs changes nothing."""
    from streamkit_spark.functions.sketch import hll_distinct

    base = spark.range(300).select(F.col("id").alias("v"))
    noisy = base.union(base).union(
        spark.range(5).select(F.lit(None).cast("long").alias("v"))
    )
    e1 = hll_distinct(base, "v").first()["hll_estimate"]
    e2 = hll_distinct(noisy, "v").first()["hll_estimate"]
    assert e1 == e2


def test_hll_empty_input_estimates_zero(spark):
    from streamkit_spark.functions.sketch import hll_distinct

    df = spark.range(0).select(F.col("id").alias("v"))
    assert hll_distinct(df, "v").first()["hll_estimate"] == 0.0


# ----------------------------------------------------------------------- kmv

def test_kmv_overlap_accuracy_on_fixture(spark):
    """Jaccard / union / intersection estimates vs exact set arithmetic
    over the (user, day) activity sets — within the k=256 error budget."""
    from streamkit_spark.functions.sketch import kmv_overlap

    ev = tables.load(spark, SF_DIR, "events")
    uday = F.concat(
        F.col("user_id").cast("string"),
        F.lit(":"),
        F.expr("(ts div 1000000) div 86400000").cast("string"),
    )
    df = ev.select("event_type", uday.alias("v"))
    got = {(r["g_a"], r["g_b"]): r for r in
           kmv_overlap(df, "v", "event_type", k=256).collect()}
    sets: dict[str, set] = {}
    for r in df.distinct().collect():
        sets.setdefault(r["event_type"], set()).add(r["v"])
    assert len(got) == len(sets) * (len(sets) - 1) // 2
    for (a, b), r in got.items():
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        true_j = inter / union
        # sigma(J) ~ sqrt(J(1-J)/k) ~ 0.026 here; allow ~4 sigma
        assert abs(r["jaccard_est"] - true_j) < 0.1, (a, b, r)
        assert abs(r["union_est"] - union) / union < 0.2
        if inter >= 50:
            assert abs(r["inter_est"] - inter) / inter < 0.35
        else:
            # tiny/empty true intersections (possible on a regenerated
            # fixture): only require the estimate stays small too
            assert r["inter_est"] <= 50 + 0.35 * union


def test_kmv_exact_when_sets_fit_in_sketch(spark):
    """Union smaller than k: every estimator degenerates to the exact
    answer (the sketch IS the set)."""
    from streamkit_spark.functions.sketch import kmv_overlap

    rows = [("a", i) for i in range(60)] + [("b", i) for i in range(40, 100)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kmv_overlap(df, "v", "g", k=256).first()
    assert r["jaccard_est"] == round(20 / 100, 4)
    assert r["union_est"] == 100.0
    assert r["inter_est"] == 20.0


def test_kmv_sketch_bounded_and_merge_property(spark):
    """Sketch ≤ k rows per group, and the k smallest of two merged
    sketches equal the sketch of the concatenated input — the property
    kmv_overlap's union estimator stands on."""
    from streamkit_spark.functions.sketch import kmv_sketch

    lo = spark.range(2000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    hi = spark.range(1500, 4000).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    k = 64
    sk_lo = kmv_sketch(lo, "v", ["g"], k=k)
    sk_hi = kmv_sketch(hi, "v", ["g"], k=k)
    assert sk_lo.count() <= k and sk_hi.count() <= k
    merged = sorted(
        {r["h"] for r in sk_lo.collect()} | {r["h"] for r in sk_hi.collect()}
    )[:k]
    whole = [
        r["h"]
        for r in kmv_sketch(lo.union(hi), "v", ["g"], k=k)
        .orderBy("h")
        .collect()
    ]
    assert merged == whole


# ----------------------------------------------------------------------- cms

def test_cms_never_underestimates(spark):
    from streamkit_spark.functions.sketch import cms_build, cms_lookup

    ev = tables.load(spark, SF_DIR, "events")
    sk = cms_build(ev, "user_id", d=4, w=4096)
    est = {
        int(r["user_id"]): r["cms_n"]
        for r in cms_lookup(sk, ev, "user_id", d=4, w=4096).collect()
    }
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(est) == set(exact)
    n_total = sum(exact.values())
    for u, n in exact.items():
        assert est[u] >= n, (u, est[u], n)
        # epsilon = e/w error bound, generous slack for the tiny fixture
        assert est[u] <= n + max(10, 0.01 * n_total)


def test_cms_sketch_bounded_and_skews_only_up(spark):
    """Sketch never exceeds d*w rows; a skewed key's estimate is exact
    unless another key collides on ALL d rows (prob ~ (1/w)^d)."""
    from streamkit_spark.functions.sketch import cms_build, cms_lookup

    rows = [("hot",)] * 500 + [(f"k{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "v string")
    sk = cms_build(df, "v", d=4, w=4096)
    assert sk.count() <= 4 * 4096
    est = {r["v"]: r["cms_n"] for r in
           cms_lookup(sk, df, "v", d=4, w=4096).collect()}
    assert est["hot"] == 500
    assert all(v >= 1 for v in est.values())


def test_cms_nulls_skipped(spark):
    from streamkit_spark.functions.sketch import cms_build

    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,)], "v string"
    )
    sk = cms_build(df, "v", d=2, w=16)
    # only 'a' contributes: every counter row sums to 2
    assert sorted(r["c"] for r in sk.collect()) == [2, 2]


def test_hll_daily_merge_equals_one_pass(spark):
    """Max-merging the day-partitioned register cube over a range gives
    EXACTLY the estimate of a one-pass sketch over that range's rows —
    the associativity that makes the cube answer any date range without
    a rescan."""
    from streamkit_spark.functions.sketch import (
        hll_daily_registers,
        hll_distinct,
        hll_merge_estimate,
    )

    ev = tables.load(spark, SF_DIR, "events")
    day = F.expr("(ts div 1000000) div 86400000")
    evd = ev.withColumn("__day", day)
    d0 = evd.agg(F.min("__day")).first()[0]
    # anchored at d0: day d0 has rows by definition of min, so the
    # range is non-empty on any regenerated fixture length
    lo, hi = d0, d0 + 2
    regs = hll_daily_registers(
        ev, "user_id", F.expr("ts div 1000000"), ["event_type"]
    )
    merged = {
        (r["event_type"], r["hll_estimate"])
        for r in hll_merge_estimate(
            regs.filter(F.col("day").between(lo, hi)).select(
                "event_type", "bucket", "r"
            ),
            ["event_type"],
        ).collect()
    }
    direct = {
        (r["event_type"], r["hll_estimate"])
        for r in hll_distinct(
            evd.filter(F.col("__day").between(lo, hi)),
            "user_id",
            ["event_type"],
        ).collect()
    }
    assert merged == direct and len(merged) > 0


def test_cms_lookup_plan_is_broadcast_no_probe_shuffle(spark):
    """The documented contract: the sketch broadcasts and the probe
    side never shuffles — must hold structurally, not via AQE luck."""
    from streamkit_spark.functions.sketch import cms_build, cms_lookup

    ev = tables.load(spark, SF_DIR, "events")
    sk = cms_build(ev, "user_id", d=4, w=4096)
    plan = (
        cms_lookup(sk, ev, "user_id", d=4, w=4096)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
