"""BM25 retrieval + average precision: pure-python mirrors and
magnitude pins (the AD/chi2/Burrows discipline — every textbook port is
checked against an independent reference AND a known closed-form point,
never only engine==oracle equality)."""

from __future__ import annotations

import math

import pytest


# ---------------------------------------------------------------------------
# pure-python references (independent of the engine expression shape)
# ---------------------------------------------------------------------------

def _bm25_ref(docs: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    """Textbook BM25 over whitespace tokens, Lucene positive idf."""
    toks = {d: t.lower().split() for d, t in docs.items()}
    toks = {d: t for d, t in toks.items() if t}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for d, t in toks.items():
        s = 0.0
        hit = 0
        for q in sorted(set(x.lower() for x in terms)):
            tf = t.count(q)
            df = sum(1 for tt in toks.values() if q in tt)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            hit += 1 if tf else 0
        if hit:
            out[d] = (hit, round(s, 4))
    return out


def _ap_ref(pairs: list[tuple[float, int]]) -> float | None:
    """sklearn-style step-interpolated AP from (score, label) samples,
    computed per-threshold from a plain sort — independent of the
    engine's cell/fold shape."""
    r = sum(y for _, y in pairs)
    if r == 0:
        return None
    by_score: dict[float, list[int]] = {}
    for s, y in pairs:
        by_score.setdefault(s, []).append(y)
    tp = nn = 0
    ap = 0.0
    for s in sorted(by_score, reverse=True):
        ys = by_score[s]
        tp += sum(ys)
        nn += len(ys)
        ap += (sum(ys) / r) * (tp / nn)
    return round(ap, 4)


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def test_bm25_matches_python_reference(spark):
    from streamkit_spark.functions.text import bm25_topk

    docs = {
        0: "spark merge table dup merge",
        1: "merge merge merge merge merge merge merge merge",
        2: "table scan filter row",
        3: "dup",
        4: "window window merge spark table scan row filter key agg",
    }
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_hit"], r["score"], r["rank"])
        for r in bm25_topk(df, ["dup", "merge", "window"], top_k=10).collect()
    }
    ref = _bm25_ref(docs, ["dup", "merge", "window"])
    assert set(got) == set(ref)
    for d, (hit, score) in ref.items():
        assert got[d][0] == hit
        assert got[d][1] == pytest.approx(score, abs=1e-4)
    # ranks follow (score desc, doc_id) exactly
    order = sorted(ref.items(), key=lambda kv: (-kv[1][1], kv[0]))
    assert [d for d, _ in order] == [
        d for d, v in sorted(got.items(), key=lambda kv: kv[1][2])
    ]


def test_bm25_rare_term_beats_common_saturation(spark):
    """A doc containing the rare query term must outrank a doc that
    merely repeats a common term (idf spread + tf saturation)."""
    from streamkit_spark.functions.text import bm25_topk

    rows = [(0, "dup scan")] + [
        (i, "merge " * 6 + "scan") for i in range(1, 30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = bm25_topk(df, ["dup", "merge"], top_k=3).collect()
    assert top[0]["doc_id"] == 0


def test_bm25_length_normalization(spark):
    """Equal tf: the shorter document scores higher (b > 0)."""
    from streamkit_spark.functions.text import bm25_topk

    rows = [
        (0, "dup scan"),
        (1, "dup " + "filler " * 40),
        (2, "scan row table key agg"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in bm25_topk(df, ["dup"]).collect()}
    assert got[0] > got[1]
    assert 2 not in got  # no query term -> not a candidate


def test_bm25_empty_query_raises(spark):
    from streamkit_spark.functions.text import bm25_topk

    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, [])


# ---------------------------------------------------------------------------
# average precision
# ---------------------------------------------------------------------------

def _ap_run(spark, pairs):
    from streamkit_spark.functions.analytics import average_precision_report

    df = spark.createDataFrame(
        [(float(s), bool(y)) for s, y in pairs], "score double, y boolean"
    )
    return average_precision_report(df, "score", "y").collect()[0]


def test_ap_matches_python_reference_tie_heavy(spark):
    pairs = [((i * 7) % 5 / 4.0, 1 if (i * 3) % 7 < 3 else 0)
             for i in range(200)]
    row = _ap_run(spark, pairs)
    assert row["ap"] == pytest.approx(_ap_ref(pairs), abs=1e-4)
    assert row["n_pos"] == sum(y for _, y in pairs)
    assert row["n_neg"] == 200 - row["n_pos"]
    assert row["n_thresholds"] == 5


def test_ap_perfect_ranking_is_one(spark):
    pairs = [(1.0 - i / 100.0, 1 if i < 30 else 0) for i in range(100)]
    assert _ap_run(spark, pairs)["ap"] == 1.0


def test_ap_all_positive_is_one_and_none_is_null(spark):
    assert _ap_run(spark, [(i / 10.0, 1) for i in range(10)])["ap"] == 1.0
    assert _ap_run(spark, [(i / 10.0, 0) for i in range(10)])["ap"] is None


def test_ap_h0_magnitude_is_prevalence(spark):
    """Label independent of score: AP concentrates near the prevalence
    p (the PR curve's no-skill floor) — far from both 0 and 1."""
    pairs = [((i * 13) % 97 / 96.0, 1 if (i * 29) % 10 < 2 else 0)
             for i in range(500)]
    p = sum(y for _, y in pairs) / len(pairs)
    ap = _ap_run(spark, pairs)["ap"]
    assert abs(ap - p) < 0.1, (ap, p)


def test_ap_worst_ranking_closed_form(spark):
    """All positives ranked LAST: AP = (1/R)*sum_{j=1..R} j/(N-R+j) —
    the exact closed form, a magnitude pin the engine must hit."""
    n, r = 50, 10
    pairs = [(1.0 - i / 100.0, 0) for i in range(n - r)]
    pairs += [(0.01 - i / 1000.0, 1) for i in range(r)]
    expect = round(sum(j / (n - r + j) for j in range(1, r + 1)) / r, 4)
    assert _ap_run(spark, pairs)["ap"] == pytest.approx(expect, abs=1e-4)


# ---------------------------------------------------------------------------
# reciprocal-rank fusion
# ---------------------------------------------------------------------------

def test_rrf_hand_computed(spark):
    from streamkit_spark.functions.text import rrf_fuse

    a = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(11, 1), (13, 2)], "doc_id long, rank long"
    )
    got = {r["doc_id"]: r for r in rrf_fuse([a, b], k=60).collect()}
    # doc 11 appears in both lists -> top fused
    assert got[11]["n_lists"] == 2
    assert got[11]["score"] == pytest.approx(
        round(1 / 62 + 1 / 61, 6), abs=1e-9
    )
    assert got[10]["score"] == pytest.approx(round(1 / 61, 6), abs=1e-9)
    assert got[13]["score"] == pytest.approx(round(1 / 62, 6), abs=1e-9)
    order = sorted(got.values(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in order][0] == 11
    # doc 12 scores 1/63 (rank 3 in list a only); doc 13 scores 1/62
    assert set(got) == {10, 11, 12, 13}


def test_rrf_tie_breaks_by_id_and_validates(spark):
    import pytest as _pt

    from streamkit_spark.functions.text import rrf_fuse

    a = spark.createDataFrame([(5, 1)], "doc_id long, rank long")
    b = spark.createDataFrame([(3, 1)], "doc_id long, rank long")
    rows = rrf_fuse([a, b], k=60).collect()
    # equal scores 1/61: lower id first
    assert [r["doc_id"] for r in rows] == [3, 5]
    assert [r["rank"] for r in rows] == [1, 2]
    with _pt.raises(ValueError):
        rrf_fuse([])


# ---------------------------------------------------------------------------
# Dirichlet query likelihood
# ---------------------------------------------------------------------------

def _ql_ref(docs: dict[int, str], terms: list[str], mu=100.0):
    toks = {d: t.lower().split() for d, t in docs.items()}
    toks = {d: t for d, t in toks.items() if t}
    c_tot = sum(len(t) for t in toks.values())
    out = {}
    for d, t in toks.items():
        s, hit = 0.0, 0
        for q in sorted(set(x.lower() for x in terms)):
            tf = t.count(q)
            cf = sum(tt.count(q) for tt in toks.values())
            s += math.log((tf + mu * (cf / c_tot)) / (len(t) + mu))
            hit += 1 if tf else 0
        if hit:
            out[d] = (hit, round(s, 4))
    return out


def test_ql_matches_python_reference(spark):
    from streamkit_spark.functions.text import ql_topk

    docs = {
        0: "spark merge table dup merge",
        1: "merge merge merge merge merge merge merge merge",
        2: "table scan filter row",
        3: "dup",
        4: "window window merge spark table scan row filter key agg",
    }
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_hit"], r["score"])
        for r in ql_topk(df, ["dup", "merge", "window"], mu=100.0,
                         top_k=10).collect()
    }
    ref = _ql_ref(docs, ["dup", "merge", "window"])
    assert set(got) == set(ref)
    for d, (hit, score) in ref.items():
        assert got[d][0] == hit
        assert got[d][1] == pytest.approx(score, abs=1e-4)


def test_ql_term_mass_ranks_higher(spark):
    """Two docs of equal length: the one with more query-term mass has
    strictly higher query likelihood."""
    from streamkit_spark.functions.text import ql_topk

    rows = [(0, "dup dup scan row"), (1, "dup scan row key"),
            (2, "scan row key agg")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in ql_topk(df, ["dup"]).collect()}
    assert got[0] > got[1]
    assert 2 not in got
