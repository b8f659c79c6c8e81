"""Round-5 batch F: frequent event sequences (analytics) and per-group
token entropy (text)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from streamkit_spark import tables
from streamkit_spark.functions.analytics import frequent_sequences
from streamkit_spark.functions.text import token_entropy
from tests.conftest import SF_DIR


def test_frequent_sequences_match_python(spark):
    ev = tables.load(spark, SF_DIR, "events")
    got = frequent_sequences(ev, n=3, k=20).collect()
    rows = ev.select("user_id", "ts", "event_id", "event_type").collect()
    hist = {}
    for r in rows:
        hist.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    occ, keys = Counter(), {}
    for u, evs in hist.items():
        types = [t for _, _, t in sorted(evs)]
        for i in range(len(types) - 2):
            s = ">".join(types[i : i + 3])
            occ[s] += 1
            keys.setdefault(s, set()).add(u)
    expect = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["sequence"], r["n_occurrences"]) for r in got] == expect
    for r in got:
        assert r["n_keys"] == len(keys[r["sequence"]])


def test_frequent_sequences_short_histories_skipped(spark):
    df = spark.createDataFrame(
        [(1, 1, 1, "a"), (1, 2, 2, "b"), (2, 1, 3, "a")],
        "user_id long, ts long, event_id long, event_type string",
    )
    assert frequent_sequences(df, n=3, k=5).collect() == []
    two = frequent_sequences(df, n=2, k=5).collect()
    assert [(r["sequence"], r["n_occurrences"]) for r in two] == [("a>b", 1)]


def test_token_entropy_matches_python(spark):
    docs = tables.load(spark, SF_DIR, "documents")
    got = {r["source"]: r for r in token_entropy(docs).collect()}
    rows = docs.select("source", "text").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).extend(r["text"].split())
    for s, toks in by_src.items():
        c = Counter(toks)
        n = len(toks)
        h = -sum((v / n) * math.log(v / n) for v in c.values())
        g = got[s]
        assert g["n_tokens"] == n and g["n_distinct"] == len(c)
        assert g["entropy"] == pytest.approx(h, abs=1e-3)


def test_token_entropy_degenerate_single_token(spark):
    df = spark.createDataFrame(
        [(1, "x x x", "s")], ["doc_id", "text", "source"]
    )
    r = token_entropy(df).collect()[0]
    assert r["entropy"] == 0.0 and r["n_distinct"] == 1
    assert not str(r["entropy"]).startswith("-")
