"""Round-5 batch B: JL random projection, kNN graph (brute + IVF),
mutual-kNN symmetrization (functions/similarity.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from streamkit_spark import tables
from streamkit_spark.functions.similarity import (
    knn_graph,
    mutual_knn_pairs,
    random_hyperplanes,
    random_projection,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return tables.load(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    return {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}


# ---------------------------------------------------------------------------
# random_projection
# ---------------------------------------------------------------------------

def test_projection_matches_numpy(emb, emb_np):
    out = {
        r["vec_id"]: np.array(r["proj"])
        for r in random_projection(emb, out_dim=16, seed=7).collect()
    }
    planes = random_hyperplanes(64, 16, seed=7)
    scale = 1.0 / np.sqrt(16)
    for vid in list(emb_np)[:25]:
        expect = planes @ emb_np[vid] * scale
        np.testing.assert_allclose(out[vid], expect, rtol=1e-9, atol=1e-9)


def test_projection_preserves_distances_jl(emb, emb_np):
    # deterministic (fixed seed + fixture): JL distortion on sampled pairs
    out = {
        r["vec_id"]: np.array(r["proj"])
        for r in random_projection(emb, out_dim=32, seed=11).collect()
    }
    ids = sorted(emb_np)[:40]
    distortions = []
    for a, b in zip(ids[:-1], ids[1:]):
        d_orig = np.linalg.norm(emb_np[a] - emb_np[b])
        d_proj = np.linalg.norm(out[a] - out[b])
        distortions.append(abs(d_proj / d_orig - 1.0))
    assert max(distortions) < 0.6
    assert sum(distortions) / len(distortions) < 0.25


# ---------------------------------------------------------------------------
# knn_graph
# ---------------------------------------------------------------------------

def _np_knn(emb_np, k):
    ids = sorted(emb_np)
    M = np.stack([emb_np[i] for i in ids])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    out = {}
    for r, vid in enumerate(ids):
        # (cos desc rounded 4, id asc) — the engine's tie-break
        cands = [
            (-round(S[r, c], 4), ids[c]) for c in range(len(ids)) if c != r
        ]
        cands.sort()
        out[vid] = [(i, -s) for s, i in cands[:k]]
    return out


def test_knn_brute_matches_numpy(emb, emb_np):
    got = {}
    for r in knn_graph(emb, k=3, method="brute").collect():
        got.setdefault(r["src"], []).append((r["dst"], r["cos"], r["rank"]))
    expect = _np_knn(emb_np, 3)
    assert len(got) == len(expect)
    for vid, lst in list(expect.items())[:50]:
        mine = sorted(got[vid], key=lambda x: x[2])
        assert [m[0] for m in mine] == [e[0] for e in lst]
        for m, e in zip(mine, lst):
            assert m[1] == pytest.approx(e[1], abs=1e-4)


def test_knn_ivf_full_probe_equals_brute(emb):
    # probing every list makes the IVF candidate set exhaustive → exact
    brute = knn_graph(emb, k=3, method="brute").collect()
    ivf = knn_graph(
        emb, k=3, method="ivf", n_centroids=4, nprobe=4
    ).collect()
    assert sorted(map(tuple, ivf)) == sorted(map(tuple, brute))


def test_knn_ivf_partial_probe_recall(emb):
    brute = {
        (r["src"], r["dst"])
        for r in knn_graph(emb, k=3, method="brute").collect()
    }
    ivf = {
        (r["src"], r["dst"])
        for r in knn_graph(
            emb, k=3, method="ivf", n_centroids=8, nprobe=3
        ).collect()
    }
    assert len(ivf & brute) / len(brute) >= 0.5


def test_mutual_knn_pairs(spark):
    edges = spark.createDataFrame(
        [
            (1, 2, 0.9, 1),
            (2, 1, 0.9, 1),  # mutual
            (1, 3, 0.8, 2),  # one-directional
            (3, 4, 0.7, 1),
            (4, 3, 0.7, 2),  # mutual
        ],
        ["src", "dst", "cos", "rank"],
    )
    got = [(r["id_a"], r["id_b"]) for r in mutual_knn_pairs(edges).collect()]
    assert got == [(1, 2), (3, 4)]
