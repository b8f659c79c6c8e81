"""Poisson bootstrap CI: magnitude pins (Spark-free) + behavioral tests.

The magnitude-pin layer (the AD/chi2/Burrows lesson): the hash-weight
construction is verified against an INDEPENDENT recomputation of the
Poisson(1) inverse CDF and against the distribution's known H0 moments
(mean = var = lambda = 1), not just engine==oracle equality.
"""

from __future__ import annotations

import hashlib
import math

from streamkit_spark.functions.analytics import POISSON1_T24


def _weight(salt: str, b: int, doc_id) -> int:
    """Pure-python mirror of the engine/oracle weight expression."""
    hx = hashlib.md5(f"{salt}:{b}:{doc_id}".encode()).hexdigest()
    h = int(hx[:6], 16)
    return sum(1 for t in POISSON1_T24 if h >= t)


def test_thresholds_match_independent_poisson_cdf():
    """POISSON1_T24 == floor(CDF_Poisson(1)(k) * 2^24), recomputed here
    from math.exp/factorial — the literals can't drift from the
    distribution they claim to encode."""
    cdf = 0.0
    expect = []
    for k in range(8):
        cdf += math.exp(-1) / math.factorial(k)
        expect.append(math.floor(cdf * (1 << 24)))
    assert list(POISSON1_T24) == expect
    # truncation mass beyond k=8 is negligible and documented
    assert 1.0 - cdf < 2e-5


def test_weight_moments_pin_poisson_lambda_one():
    """H0 magnitude pin: over many deterministic hashes the weight's
    mean and variance must sit at the Poisson(1) values (1, 1) — a
    dropped threshold or a wrong hash width moves them far outside
    these bands."""
    n = 20_000
    ws = [_weight("boot", b, i) for b in range(4) for i in range(n // 4)]
    mean = sum(ws) / len(ws)
    var = sum((w - mean) ** 2 for w in ws) / len(ws)
    assert abs(mean - 1.0) < 0.02, mean
    assert abs(var - 1.0) < 0.04, var
    # the support actually exercises multi-counts, not just 0/1
    assert max(ws) >= 3 and min(ws) == 0


def test_ci_rank_arithmetic():
    """ceil-rank formula pins: B_eff=200 at alpha=0.05 selects ranks
    5 and 195; small B degrades to the extremes without hitting 0."""
    for b_eff, lo, hi in [(200, 5, 195), (100, 3, 98), (10, 1, 10),
                          (2, 1, 2)]:
        assert (25 * b_eff + 999) // 1000 == lo
        assert (975 * b_eff + 999) // 1000 == hi


def test_bootstrap_ci_behavior(spark):
    from pyspark.sql import functions as F

    from streamkit_spark.functions.analytics import poisson_bootstrap_ci

    rows = [(i, "const", 7) for i in range(40)]
    rows += [(100 + i, "low", 8 + (i % 5)) for i in range(40)]
    rows += [(200 + i, "high", 95 + (i % 11)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string, v long")
    out = {
        r["source"]: r
        for r in poisson_bootstrap_ci(
            df, "source", "v", id_col="doc_id", b=200
        ).collect()
    }
    # constant group: every replicate mean is exactly the constant
    c = out["const"]
    assert c["mean"] == c["ci_lo"] == c["ci_hi"] == 7.0
    # CI brackets the point estimate; disjoint populations -> disjoint CIs
    for g in ("low", "high"):
        assert out[g]["ci_lo"] <= out[g]["mean"] <= out[g]["ci_hi"]
        # n=40 with P(empty replicate) = e^-40: all 200 contribute
        assert out[g]["b_eff"] == 200
        assert out[g]["n_docs"] == 40
    assert out["low"]["ci_hi"] < out["high"]["ci_lo"]


def test_bootstrap_ci_matches_python_replay(spark):
    """Full pure-python replay of one small group: weights, replicate
    means, and the exact order-statistic CI must match the engine
    bit-for-bit."""
    from streamkit_spark.functions.analytics import poisson_bootstrap_ci

    vals = {i: 3 + (i * 7) % 13 for i in range(25)}
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in vals.items()],
        "doc_id long, source string, v long",
    )
    got = poisson_bootstrap_ci(
        df, "source", "v", id_col="doc_id", b=50
    ).collect()[0]

    means = []
    for b in range(50):
        n = s = 0
        for i, v in vals.items():
            w = _weight("boot", b, i)
            n += w
            s += w * v
        if n > 0:
            means.append((s / n, b))
    means.sort()
    b_eff = len(means)
    lo = means[(25 * b_eff + 999) // 1000 - 1][0]
    hi = means[(975 * b_eff + 999) // 1000 - 1][0]
    point = sum(vals.values()) / len(vals)
    assert got["b_eff"] == b_eff
    assert got["mean"] == round(point, 4)
    assert got["ci_lo"] == round(lo, 4)
    assert got["ci_hi"] == round(hi, 4)


def test_bootstrap_ci_input_validation(spark):
    import pytest

    from streamkit_spark.functions.analytics import poisson_bootstrap_ci

    df = spark.createDataFrame(
        [(1, "a", 1)], "doc_id long, source string, v long"
    )
    with pytest.raises(ValueError):
        poisson_bootstrap_ci(df, "source", "v", b=1)
    with pytest.raises(ValueError):
        poisson_bootstrap_ci(df, "source", "v", alpha=0.0)
    with pytest.raises(ValueError):
        poisson_bootstrap_ci(df, "source", "v", alpha=0.0001)
    # alpha/2 must be a whole per-mille: 0.003 -> 1.5 per-mille would
    # silently round the rank, so it raises instead
    with pytest.raises(ValueError, match="multiple of 0.002"):
        poisson_bootstrap_ci(df, "source", "v", alpha=0.003)
    # representable alphas still construct the plan
    poisson_bootstrap_ci(df, "source", "v", alpha=0.002)
    poisson_bootstrap_ci(df, "source", "v", alpha=0.1)


def test_xxhash_weight_moments_pin_poisson_lambda_one(spark):
    """The production (xxhash64) weight variate must sit on the same
    Poisson(1) H0 moments as the declared md5 path: one group of N ids
    makes each replicate total n_b ~ Poisson(N), so mean(n_b)/N and
    var(n_b)/N both pin to 1.  A wrong bit width or threshold drift
    moves them far outside these bands (the magnitude-pin discipline,
    through the engine expression itself)."""
    from streamkit_spark.functions.analytics import bootstrap_replicates

    n, b = 500, 100
    df = spark.createDataFrame(
        [(i, "g", 1) for i in range(n)], "doc_id long, source string, v long"
    )
    rep = bootstrap_replicates(
        df, "source", "v", id_col="doc_id", b=b, hash_fn="xxhash64"
    )
    totals = [
        r["n_b"] for r in rep.filter("__b >= 0").collect()
    ]
    assert len(totals) == b
    mean = sum(totals) / b
    var = sum((t - mean) ** 2 for t in totals) / b
    # sqrt(N/B) ~ 2.2 SE on the mean; chi2 band on the variance ratio
    assert abs(mean / n - 1.0) < 0.02, mean / n
    assert abs(var / n - 1.0) < 0.45, var / n


def test_xxhash_ci_agrees_with_md5_path(spark):
    """Accuracy contract (the approx_distinct precedent, not an oracle):
    the two hash variates feed identical thresholds, so at matched B
    they are two independent Monte-Carlo draws of the SAME bootstrap —
    point rows identical bit-for-bit (w ≡ 1 there), CIs within the
    resampling noise of each other, both bracketing the group mean."""
    from streamkit_spark.functions.analytics import poisson_bootstrap_ci

    vals = {i: 50 + ((i * 13) % 21) for i in range(200)}
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in vals.items()],
        "doc_id long, source string, v long",
    )
    outs = {}
    for hf in ("md5", "xxhash64"):
        outs[hf] = poisson_bootstrap_ci(
            df, "source", "v", id_col="doc_id", b=200, hash_fn=hf
        ).collect()[0]
    a, b = outs["md5"], outs["xxhash64"]
    # the point row never touches the hash: identical by construction
    assert a["mean"] == b["mean"] and a["n_docs"] == b["n_docs"] == 200
    assert a["b_eff"] == b["b_eff"] == 200
    true_mean = sum(vals.values()) / len(vals)
    for o in (a, b):
        assert o["ci_lo"] <= true_mean <= o["ci_hi"]
    # CI endpoints differ only by quantile Monte-Carlo noise: bound the
    # disagreement by half the (wider) interval's width, with sanity
    # floor against the degenerate all-equal case
    width = max(a["ci_hi"] - a["ci_lo"], b["ci_hi"] - b["ci_lo"])
    assert width > 0
    assert abs(a["ci_lo"] - b["ci_lo"]) <= 0.5 * width
    assert abs(a["ci_hi"] - b["ci_hi"]) <= 0.5 * width


def test_xxhash_path_plan_has_no_md5(spark):
    """The production path must actually BE the cheap path: no md5 /
    conv / substring digest machinery in the physical plan, the seeded
    xxhash64 primitive present."""
    from streamkit_spark.functions.analytics import bootstrap_replicates

    df = spark.createDataFrame(
        [(1, "g", 1)], "doc_id long, source string, v long"
    )
    plan = (
        bootstrap_replicates(
            df, "source", "v", id_col="doc_id", b=4, hash_fn="xxhash64"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "xxhash64" in plan
    assert "md5" not in plan
