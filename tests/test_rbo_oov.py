"""Rank-biased overlap drift matrix + OOV-rate audit: closed-form
fixed points, tie-break determinism, truncated-list edges."""

from __future__ import annotations

from streamkit_spark.functions.text import oov_by_group, rbo_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def test_rbo_identical_rankings_hit_the_truncated_maximum(spark):
    # same text -> same ranking; truncated RBO@k maxes at 1 - p^k
    df = _docs(spark, [("a", "x x y z"), ("b", "x x y z")])
    row = rbo_pairs(df, k=3, p=0.9).collect()[0]
    want = sum((1.0 - 0.9) * 0.9 ** (d - 1) for d in range(1, 4))
    assert row["rbo"] == round(want, 4)
    assert row["k"] == 3


def test_rbo_disjoint_heads_score_zero(spark):
    df = _docs(spark, [("a", "x y"), ("b", "u v")])
    row = rbo_pairs(df, k=2, p=0.9).collect()[0]
    assert row["rbo"] == 0.0


def test_rbo_hand_computed_partial_overlap(spark):
    # a: x(2) y(1) -> [x, y]; b: x(2) z(1) -> [x, z]
    # k=2, p=0.5: w = [0.5, 0.25]; d=1 ov=1 -> 0.5; d=2 ov=1 -> 0.25*(1/2)
    df = _docs(spark, [("a", "x x y"), ("b", "x x z")])
    row = rbo_pairs(df, k=2, p=0.5).collect()[0]
    assert row["rbo"] == 0.625


def test_rbo_count_ties_break_by_token_ascending(spark):
    # every token count 1: ranking is pure lexicographic on both sides,
    # so equal bags of words give the truncated maximum, deterministically
    df = _docs(spark, [("a", "c b a"), ("b", "a c b")])
    row = rbo_pairs(df, k=3, p=0.9).collect()[0]
    want = sum((1.0 - 0.9) * 0.9 ** (d - 1) for d in range(1, 4))
    assert row["rbo"] == round(want, 4)


def test_rbo_rankings_shorter_than_k_use_their_prefix(spark):
    # both sources have only 1 distinct token; depths past the list end
    # intersect the full (1-element) prefixes
    df = _docs(spark, [("a", "x x"), ("b", "x")])
    row = rbo_pairs(df, k=3, p=0.5).collect()[0]
    # d=1: ov 1 -> w1*1; d=2: ov 1 -> w2*(1/2); d=3: ov 1 -> w3*(1/3)
    w = [(1.0 - 0.5) * 0.5 ** (d - 1) for d in range(1, 4)]
    want = w[0] * 1.0 + w[1] * 0.5 + w[2] * (1.0 / 3.0)
    assert row["rbo"] == round(want, 4)


def test_rbo_pair_count_and_ordering(spark):
    df = _docs(spark, [("a", "x"), ("b", "x"), ("c", "x")])
    rows = rbo_pairs(df, k=1, p=0.9).collect()
    assert [(r["group_a"], r["group_b"]) for r in rows] == [
        ("a", "b"), ("a", "c"), ("b", "c"),
    ]


def test_oov_hand_computed(spark):
    # global counts: x=4, y=2, z=1 -> vocab_k=2 keeps {x, y}
    df = _docs(
        spark,
        [("a", "x x y z"), ("b", "x x y")],
    )
    rows = {r["source"]: r for r in oov_by_group(df, vocab_k=2).collect()}
    assert rows["a"]["n_tokens"] == 4 and rows["a"]["n_oov"] == 1
    assert rows["a"]["oov_rate"] == 0.25
    assert rows["b"]["n_tokens"] == 3 and rows["b"]["n_oov"] == 0
    assert rows["b"]["oov_rate"] == 0.0


def test_oov_all_out_of_vocabulary_group(spark):
    # vocab_k=1 keeps only the global top token; source b never uses it
    df = _docs(spark, [("a", "x x x"), ("b", "q r")])
    rows = {r["source"]: r for r in oov_by_group(df, vocab_k=1).collect()}
    assert rows["b"]["oov_rate"] == 1.0
    assert rows["a"]["oov_rate"] == 0.0


def test_oov_vocab_ties_break_by_token_ascending(spark):
    # x and y tie at count 2; vocab_k=1 must pick 'x' (token ASC)
    df = _docs(spark, [("a", "x y"), ("b", "y x")])
    rows = {r["source"]: r for r in oov_by_group(df, vocab_k=1).collect()}
    assert rows["a"]["n_oov"] == 1 and rows["b"]["n_oov"] == 1


def test_coverage_curve_hand_counts_and_exact_boundary(spark):
    from streamkit_spark.functions.text import coverage_by_group

    # s1: a x6, b x3, c x1 (n=10).  50% -> rank 1 (cum 6); 90% -> rank 2
    # (cum 9, EXACT boundary: 9*100 == 90*10); 99% -> rank 3.
    rows = [
        ("s1", "a a a a a a b b b c"),
        # s2: four equal-count tokens -> tie-break is (count DESC, token
        # ASC); 50% needs 2 types, 90% needs 4 (cum 3*100 < 90*4)
        ("s2", "w x y z"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r["source"], r["pct"]): (
            r["tokens_needed"], r["vocab_size"], r["total_tokens"]
        )
        for r in coverage_by_group(df).collect()
    }
    assert got == {
        ("s1", 50): (1, 3, 10),
        ("s1", 90): (2, 3, 10),
        ("s1", 99): (3, 3, 10),
        ("s2", 50): (2, 4, 4),
        ("s2", 90): (4, 4, 4),
        ("s2", 99): (4, 4, 4),
    }


def test_coverage_curve_rejects_bad_percents(spark):
    import pytest as _pytest

    from streamkit_spark.functions.text import coverage_from_cells

    cells = spark.createDataFrame(
        [("s", "a", 1)], "g string, tk string, c long"
    )
    with _pytest.raises(ValueError):
        coverage_from_cells(cells, percents=())
    with _pytest.raises(ValueError):
        coverage_from_cells(cells, percents=(0, 50))
    with _pytest.raises(ValueError):
        coverage_from_cells(cells, percents=(50, 101))
    with _pytest.raises(ValueError):
        coverage_from_cells(cells, percents=(99.5,))
