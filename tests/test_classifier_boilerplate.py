"""Round-5 batch: hashed-feature quality classifier, boilerplate segment
analysis/removal (curation.py) and edit-distance near-dup pairs (dedup.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from streamkit_spark import tables
from streamkit_spark.functions import curation as C
from streamkit_spark.functions.dedup import editdist_pairs
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return tables.load(spark, SF_DIR, "documents")


# ---------------------------------------------------------------------------
# quality_classifier_score
# ---------------------------------------------------------------------------

def _py_bucket(tok: str, salt: str = "qc") -> int:
    return int(hashlib.md5(f"{salt}:{tok}".encode()).hexdigest()[:3], 16)


def _py_weight(b: int) -> float:
    return ((b * 2654435761) % 4096) / 4096.0 - 0.5


def test_classifier_matches_python_reference(spark, docs):
    out = {
        r["doc_id"]: r
        for r in C.quality_classifier_score(docs, bias=0.1).collect()
    }
    for r in docs.select("doc_id", "text").limit(50).collect():
        toks = r["text"].split()
        expect = 0.1 + (
            sum(_py_weight(_py_bucket(t)) for t in toks) / len(toks)
            if toks
            else 0.0
        )
        got = out[r["doc_id"]]
        assert got["n_tokens"] == len(toks)
        assert got["score"] == pytest.approx(expect, abs=1e-4)
        assert got["keep"] == (got["score"] >= 0.0)


def test_classifier_weight_table_path_matches_inrow(spark, docs):
    # materialize the pseudo-model as an explicit weight table: the
    # trained-model join path must score identically to the in-row path
    wt = spark.createDataFrame(
        [(b, _py_weight(b)) for b in range(4096)], ["bucket", "weight"]
    )
    a = C.quality_classifier_score(docs, bias=0.25, cutoff=0.25)
    b = C.quality_classifier_score(docs, weights=wt, bias=0.25, cutoff=0.25)
    assert a.collect() == b.collect()


def test_classifier_empty_text_scores_bias(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   \t\n "), (3, "hello world"), (4, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in C.quality_classifier_score(df, bias=0.5).collect()}
    assert rows[1]["score"] == 0.5 and rows[1]["n_tokens"] == 0
    assert rows[2]["score"] == 0.5 and rows[2]["n_tokens"] == 0
    assert rows[3]["n_tokens"] == 2
    # NULL text scores bias on BOTH paths (map path coalesces to empty)
    assert rows[4]["score"] == 0.5 and rows[4]["n_tokens"] == 0
    wt = spark.createDataFrame([(0, 0.0)], ["bucket", "weight"])
    jrows = {
        r["doc_id"]: r
        for r in C.quality_classifier_score(df, weights=wt, bias=0.5).collect()
    }
    assert jrows[4]["score"] == 0.5 and jrows[4]["n_tokens"] == 0


# ---------------------------------------------------------------------------
# boilerplate segments
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def lined(spark):
    """Synthetic multi-line docs with a planted boilerplate banner."""
    banner = "accept all cookies"
    rows = [
        (i, f"unique opening line {i}\n{banner}\nbody text number {i}")
        for i in range(10)
    ] + [(100, "no banner here\njust body"), (101, "")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_boilerplate_lines_found(spark, lined):
    bp = C.boilerplate_segments(lined, min_df=5).collect()
    assert [(r["segment"], r["n_docs"]) for r in bp] == [
        ("accept all cookies", 10)
    ]


def test_remove_boilerplate_rebuilds_in_order(spark, lined):
    out = {
        r["doc_id"]: r for r in C.remove_boilerplate(lined, min_df=5).collect()
    }
    assert out[3]["clean_text"] == "unique opening line 3\nbody text number 3"
    assert out[3]["n_removed"] == 1 and out[3]["n_segments"] == 3
    assert out[100]["clean_text"] == "no banner here\njust body"
    assert out[100]["n_removed"] == 0
    # empty doc has no segments → no output row (left-joinable by caller)
    assert 101 not in out


def test_block_segments_null_and_empty_text_yield_no_segments(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c")], "doc_id long, text string"
    )
    segs = C.segment_table(df, block_tokens=2).collect()
    assert [(r["doc_id"], r["pos"], r["segment"]) for r in segs] == [
        (3, 0, "a b"),
        (3, 1, "c"),
    ]


def test_block_segments_cover_all_tokens(spark, docs):
    seg = C.segment_table(docs, block_tokens=8)
    n_seg_tokens = seg.select(
        F.sum(F.size(F.split(F.col("segment"), " "))).alias("n")
    ).first()["n"]
    n_doc_tokens = docs.select(
        F.sum(F.size(F.array_remove(F.split(F.lower("text"), r"\s+"), ""))).alias("n")
    ).first()["n"]
    assert n_seg_tokens == n_doc_tokens


def test_block_segment_positions_are_contiguous(spark, docs):
    seg = C.segment_table(docs, block_tokens=8)
    per_doc = seg.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.min("pos").alias("lo"), F.max("pos").alias("hi")
    )
    bad = per_doc.filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
    assert bad.count() == 0


# ---------------------------------------------------------------------------
# editdist_pairs
# ---------------------------------------------------------------------------

def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_editdist_pairs_match_python_dp(spark, docs):
    pairs = editdist_pairs(docs, threshold=0.6, max_df=32).collect()
    assert pairs, "fixture should contain candidate pairs"
    texts = {r["doc_id"]: r["text"].lower()[:512] for r in docs.collect()}
    for r in pairs[:20]:
        a, b = texts[r["id_a"]], texts[r["id_b"]]
        sim = 1.0 - _py_lev(a, b) / max(len(a), len(b))
        assert r["editsim"] == pytest.approx(sim, abs=1e-4)
        assert sim >= 0.6
        assert r["id_a"] < r["id_b"]


def test_editdist_identical_docs_score_one(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "the quick brown fox jumped over the lazy dog"),
            (4, "completely different words entirely here now"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        (r["id_a"], r["id_b"]): r["editsim"]
        for r in editdist_pairs(df, threshold=0.5, max_df=16, n=2).collect()
    }
    assert rows[(1, 2)] == 1.0
    assert rows[(1, 3)] == pytest.approx(1.0 - 2 / 44, abs=1e-4)
    assert (1, 4) not in rows and (2, 4) not in rows


def test_editdist_respects_prefix_cap(spark):
    # identical 600-char prefixes, difference only beyond the cap → 1.0
    base = ("word " * 120).strip()
    df = spark.createDataFrame(
        [(1, base + " tail one"), (2, base + " other ending")],
        ["doc_id", "text"],
    )
    rows = editdist_pairs(df, threshold=0.9, max_df=16, prefix_chars=512).collect()
    assert [(r["id_a"], r["id_b"], r["editsim"]) for r in rows] == [(1, 2, 1.0)]


def test_boilerplate_match_case_insensitive_rebuild_case_preserving(spark):
    rows = [
        (i, f"Unique Opening {i}\nACCEPT all Cookies\nBody Text {i}")
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    bp = C.boilerplate_segments(df, min_df=4).collect()
    # matching is case-insensitive: the banner counts across case variants
    assert [(r["segment"], r["n_docs"]) for r in bp] == [
        ("accept all cookies", 6)
    ]
    out = {r["doc_id"]: r for r in C.remove_boilerplate(df, min_df=4).collect()}
    # the rebuild preserves the ORIGINAL case of surviving lines
    assert out[2]["clean_text"] == "Unique Opening 2\nBody Text 2"
    assert out[2]["n_removed"] == 1
