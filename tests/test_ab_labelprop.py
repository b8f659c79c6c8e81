"""Round-5 batch D: Welch A/B z-test report (analytics.ab_test_report)
and graph label propagation (similarity.label_propagation)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from streamkit_spark import tables
from streamkit_spark.functions.analytics import ab_test_report
from streamkit_spark.functions.similarity import knn_graph, label_propagation
from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# ab_test_report
# ---------------------------------------------------------------------------

def _welch(vals_g, vals_r):
    n, m = len(vals_g), len(vals_r)
    mg, mr = sum(vals_g) / n, sum(vals_r) / m
    vg = sum((x - mg) ** 2 for x in vals_g) / (n - 1)
    vr = sum((x - mr) ** 2 for x in vals_r) / (m - 1)
    return (mg - mr) / math.sqrt(vg / n + vr / m)


def test_ab_report_matches_python_welch(spark):
    ev = tables.load(spark, SF_DIR, "events").select("event_type", "value")
    got = {r["event_type"]: r for r in ab_test_report(ev, "event_type", "value").collect()}
    rows = ev.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for t, vals in by_type.items():
        rest = [v for r2 in rows if r2["event_type"] != t for v in [r2["value"]]]
        g = got[t]
        assert g["n"] == len(vals) and g["n_rest"] == len(rest)
        assert g["mean"] == pytest.approx(sum(vals) / len(vals), abs=1e-4)
        assert g["z"] == pytest.approx(_welch(vals, rest), abs=1e-3)


def test_ab_report_null_z_guards(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 1.0), ("c", 5.0)],
        ["g", "v"],
    )
    got = {r["g"]: r for r in ab_test_report(df, "g", "v").collect()}
    # c has n=1 → z NULL
    assert got["c"]["z"] is None
    # a vs rest {1,1,5}: both sides have variance-feeding rows → finite z
    # b mirrors a; a constant group against a constant complement → se=0:
    df2 = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 1.0)], ["g", "v"]
    )
    got2 = {r["g"]: r for r in ab_test_report(df2, "g", "v").collect()}
    assert got2["a"]["z"] is None and got2["b"]["z"] is None


def test_ab_report_negative_cancellation_variance_is_null_not_nan(spark):
    # constant non-dyadic value: exact decimal moments, but the double
    # subtraction sqd − svd²/n cancels to ~−2.7e-20 — sqrt would be NaN
    # (and DuckDB would raise); the guard must fire BEFORE the sqrt
    df = spark.createDataFrame([("a", 0.01)] * 5 + [("b", 0.01)] * 5, ["g", "v"])
    for r in ab_test_report(df, "g", "v").collect():
        assert r["z"] is None, r


def test_ab_report_null_values_excluded_from_moments(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", 2.0), ("b", 2.0)],
        "g string, v double",
    )
    got = {r["g"]: r for r in ab_test_report(df, "g", "v").collect()}
    assert got["a"]["n"] == 2 and got["a"]["mean"] == 2.0
    assert got["b"]["n_rest"] == 2


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------

def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, cos double")


def test_labelprop_chain_propagates_by_depth(spark):
    # 1 → 2 → 3 → 4 chain (edges point src→dst, votes flow dst→src)
    edges = _edges(
        spark, [(2, 1, 0.9), (3, 2, 0.9), (4, 3, 0.9)]
    )
    seeds = spark.createDataFrame([(1, 7)], "vec_id long, label int")
    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "vec_id long")

    def labs(n_iter):
        out = label_propagation(edges, seeds, nodes, n_iter=n_iter)
        return {r["vec_id"]: (r["label"], r["origin"]) for r in out.collect()}

    l1 = labs(1)
    assert l1[1] == (7, "seed") and l1[2] == (7, "propagated")
    assert l1[3][0] is None and l1[3][1] == "unlabeled"
    l3 = labs(3)
    assert l3[2] == (7, "propagated") and l3[3] == (7, "propagated")
    assert l3[4] == (7, "propagated")
    assert l3[5] == (None, "unlabeled")  # isolated node never labels


def test_labelprop_argmax_and_tie_break(spark):
    # node 10 hears label 1 with total 1.4, label 2 with 0.9 → takes 1;
    # node 20 hears 1 and 2 with EQUAL votes → tie breaks to min label
    edges = _edges(
        spark,
        [
            (10, 1, 0.7), (10, 2, 0.7), (10, 3, 0.9),
            (20, 1, 0.8), (20, 3, 0.8),
        ],
    )
    seeds = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2)], "vec_id long, label int"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 20)], "vec_id long"
    )
    out = {
        r["vec_id"]: r["label"]
        for r in label_propagation(edges, seeds, nodes, n_iter=1).collect()
    }
    assert out[10] == 1  # 0.7+0.7=1.4 votes for 1 beats 0.9 for 2
    assert out[20] == 1  # 0.8 vs 0.8 → min label wins


def test_labelprop_null_weight_votes_rank_last(spark):
    # A label whose edges all carry NULL weights must never beat a label
    # with real votes — the r11 window shape ordered votes desc (NULLS
    # LAST) and the r12 min(struct) argmax must preserve that (struct
    # ordering alone would sort the NULL first).  A node hearing ONLY
    # null-weighted votes still takes that label (the single-row case).
    edges = _edges(
        spark,
        [(10, 1, None), (10, 2, 0.1), (20, 1, None), (20, 2, None)],
    )
    seeds = spark.createDataFrame(
        [(1, 1), (2, 2)], "vec_id long, label int"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 10, 20)], "vec_id long"
    )
    out = {
        r["vec_id"]: r["label"]
        for r in label_propagation(edges, seeds, nodes, n_iter=1).collect()
    }
    assert out[10] == 2  # real 0.1 vote beats the NULL-weight label 1
    assert out[20] == 1  # only NULL votes: tie on NULL → min label


def test_labelprop_seeds_stay_clamped(spark):
    edges = _edges(spark, [(1, 2, 0.99), (2, 1, 0.99)])
    seeds = spark.createDataFrame([(1, 5), (2, 9)], "vec_id long, label int")
    nodes = spark.createDataFrame([(1,), (2,)], "vec_id long")
    out = {
        r["vec_id"]: (r["label"], r["origin"])
        for r in label_propagation(edges, seeds, nodes, n_iter=4).collect()
    }
    assert out[1] == (5, "seed") and out[2] == (9, "seed")


def test_labelprop_fixture_full_coverage(spark):
    emb = tables.load(spark, SF_DIR, "embeddings")
    edges = knn_graph(emb, k=5, method="brute")
    seeds = emb.filter(F.col("vec_id") % 5 == 0).select("vec_id", "label")
    out = label_propagation(edges, seeds, emb.select("vec_id"), n_iter=3)
    counts = {r["origin"]: r["cnt"] for r in out.groupBy("origin").agg(F.count("*").alias("cnt")).collect()}
    assert counts["seed"] == 100
    # k=5 brute graph at 500 nodes: 3 hops from 20% seeds reaches everyone
    assert counts.get("unlabeled", 0) == 0
    seed_labels = {r["label"] for r in seeds.collect()}
    out_labels = {r["label"] for r in out.collect()}
    assert out_labels <= seed_labels
