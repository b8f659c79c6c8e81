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


# ---------------------------------------------------------------------------
# IVFADC (residual PQ)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ivfadc(emb):
    from streamkit_spark.functions.similarity import ivfadc_components

    cents, books, _assign = ivfadc_components(emb, n_centroids=8, m=4, k=8, iters=2)
    return cents, books


def _np_spherical_argmax(x, book):
    # dot/||c|| score, tie -> higher code id (struct-max semantics)
    best, best_s = 0, None
    for ci, c in enumerate(book):
        c = np.asarray(c)
        n = np.sqrt(np.sum(c * c))
        s = float(np.dot(x, c) / n)
        if best_s is None or s > best_s or (s == best_s and ci > best):
            best, best_s = ci, s
    return best


def test_ivfadc_encode_matches_numpy(emb, emb_np, ivfadc):
    from streamkit_spark.functions.similarity import ivfadc_encode

    cents, books = ivfadc
    rows = {
        r["vec_id"]: (r["list"], list(r["codes"]))
        for r in ivfadc_encode(emb, cents, books).collect()
    }
    assert len(rows) == len(emb_np)
    C = [np.asarray(c) for c in cents]
    for vid in list(emb_np)[:40]:
        v = emb_np[vid]
        lst, codes = rows[vid]
        # coarse assignment: spherical argmax over centroids
        assert lst == _np_spherical_argmax(v, cents)
        r = v - C[lst]
        for s in range(4):
            rs = r[s * 16 : (s + 1) * 16]
            assert codes[s] == _np_spherical_argmax(rs, books[s]), (vid, s)


def test_ivfadc_centroid_rows_still_encoded(emb, ivfadc):
    from streamkit_spark.functions.similarity import ivfadc_encode

    cents, books = ivfadc
    got = {
        r["vec_id"]: r["codes"]
        for r in ivfadc_encode(emb, cents, books).collect()
    }
    # the 8 coarse-centroid rows have zero residuals: all-tie argmax
    # deterministically picks the highest code id
    for vid in range(8):
        assert list(got[vid]) == [7, 7, 7, 7]


def test_ivfadc_reconstruction_beats_raw_pq_on_clustered_data(spark):
    """The residual advantage needs CLUSTERED vectors (residuals shrink
    toward the origin); the fixture's embeddings are near-random (max
    pairwise cos ≈ 0.5), where residuals against sampled centroids are
    ~√2 larger than the vectors themselves — so the property is
    demonstrated on planted clusters, the workload IVFADC exists for."""
    from streamkit_spark.functions.similarity import (
        ivfadc_components, ivfadc_encode, pq_codebooks, pq_encode)

    # 32 clusters but only k=8 codewords per subspace: raw PQ CANNOT
    # cover 32 distinct subspace patterns with 8 codewords, while 32
    # coarse lists capture every center and leave only the small noise
    # to quantize — the regime IVFADC exists for
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((32, 64)) * 2.0
    rows = []
    for i in range(512):
        v = centers[i % 32] + rng.standard_normal(64) * 0.15
        rows.append((i, [float(x) for x in v]))
    # put the 32 cluster centers first so the deterministic coarse sample
    # picks one per cluster
    head = [(i, [float(x) for x in centers[i]]) for i in range(32)]
    df = spark.createDataFrame(
        head + [(i + 32, v) for i, v in rows], "vec_id long, embedding array<float>"
    )
    vecs = {r[0]: np.array(r[1], dtype=np.float64) for r in head + [(i + 32, v) for i, v in rows]}
    cents, books, _assign = ivfadc_components(df, n_centroids=32, m=4, k=8, iters=2)
    adc_rows = {
        r["vec_id"]: (r["list"], list(r["codes"]))
        for r in ivfadc_encode(df, cents, books).collect()
    }
    raw_books = pq_codebooks(df, m=4, k=8, iters=2, exact_means=True)
    raw_rows = {
        r["vec_id"]: list(r["codes"]) for r in pq_encode(df, raw_books).collect()
    }
    C = [np.asarray(c, dtype=np.float64) for c in cents]
    adc_errs, raw_errs = [], []
    for vid, v in vecs.items():
        lst, codes = adc_rows[vid]
        rec = C[lst].copy()
        for s in range(4):
            rec[s * 16 : (s + 1) * 16] += np.asarray(books[s][codes[s]])
        adc_errs.append(np.linalg.norm(v - rec))
        rec2 = np.concatenate(
            [np.asarray(raw_books[s][raw_rows[vid][s]]) for s in range(4)]
        )
        raw_errs.append(np.linalg.norm(v - rec2))
    mean_adc = sum(adc_errs) / len(adc_errs)
    mean_raw = sum(raw_errs) / len(raw_errs)
    # residual quantization is the whole point: decisively better here
    assert mean_adc < 0.5 * mean_raw


def test_ivfadc_topk_score_decomposition(emb, emb_np, ivfadc):
    from streamkit_spark.functions.similarity import ivfadc_encode, ivfadc_topk

    cents, books = ivfadc
    out = ivfadc_topk(
        emb, emb.filter(F.col("vec_id") < 3), cents, books, k=5, nprobe=3
    ).collect()
    assert out
    enc = {
        r["vec_id"]: (r["list"], list(r["codes"]))
        for r in ivfadc_encode(emb, cents, books).collect()
    }
    C = [np.asarray(c) for c in cents]
    for r in out[:15]:
        q = emb_np[r["query_id"]]
        lst, codes = enc[r["neighbor_id"]]
        expect = float(np.dot(q, C[lst])) + sum(
            float(np.dot(q[s * 16 : (s + 1) * 16], np.asarray(books[s][codes[s]])))
            for s in range(4)
        )
        assert r["score"] == pytest.approx(expect, abs=1e-3)


# ------------------------------------------------------------------ triangles

def _tri_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_count_complete_graph(spark):
    """K4: 6 edges, 4 triangles, 12 wedges, transitivity exactly 1."""
    from streamkit_spark.functions.similarity import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = triangle_count(_tri_df(spark, k4)).first()
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (
        4, 6, 12, 4,
    )
    assert r["global_clustering"] == 1.0


def test_triangle_count_path_graph_has_none(spark):
    from streamkit_spark.functions.similarity import triangle_count

    r = triangle_count(_tri_df(spark, [(1, 2), (2, 3)])).first()
    assert r["n_triangles"] == 0 and r["n_wedges"] == 1
    assert r["global_clustering"] == 0.0


def test_triangle_count_canonicalizes_edges(spark):
    """Reversed duplicates and self-loops collapse to the simple graph."""
    from streamkit_spark.functions.similarity import triangle_count

    noisy = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 1), (2, 2)]
    r = triangle_count(_tri_df(spark, noisy)).first()
    assert (r["n_edges"], r["n_triangles"]) == (3, 1)
    assert r["global_clustering"] == 1.0


def test_triangle_count_matches_bruteforce_on_random_graph(spark):
    """Seeded Erdős–Rényi graph vs an itertools triangle counter."""
    import itertools
    import random

    from streamkit_spark.functions.similarity import triangle_count

    rng = random.Random(7)
    n = 30
    edges = [(a, b) for a in range(n) for b in range(a + 1, n)
             if rng.random() < 0.2]
    adj = {v: set() for v in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want_tri = sum(
        1 for a, b, c in itertools.combinations(range(n), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    want_wedges = sum(
        len(nb) * (len(nb) - 1) // 2 for nb in adj.values()
    )
    r = triangle_count(_tri_df(spark, edges)).first()
    assert r["n_triangles"] == want_tri
    assert r["n_wedges"] == want_wedges
    assert r["n_edges"] == len(edges)


def test_assortativity_path_graph_closed_form(spark):
    """P3 (1-2, 2-3) has the known closed form r = -1: the exact
    magnitude pin for the Newman moment algebra."""
    from streamkit_spark.functions.similarity import degree_assortativity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long"
    )
    row = degree_assortativity(edges).collect()[0]
    assert row["n_nodes"] == 3 and row["n_edges"] == 2
    assert row["r"] == -1.0


def test_assortativity_regular_graph_is_null(spark):
    """A triangle is 2-regular: zero degree variance -> r NULL (never a
    clamp), with the exact-integer denominator hitting 0 exactly."""
    from streamkit_spark.functions.similarity import degree_assortativity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    row = degree_assortativity(edges).collect()[0]
    assert row["r"] is None and row["n_edges"] == 3


def test_assortativity_matches_pearson_reference(spark):
    """Independent reference: Newman's r equals the plain Pearson
    correlation over ordered edge-endpoint degree pairs (each edge
    counted in both directions) — computed here from scratch."""
    from streamkit_spark.functions.similarity import degree_assortativity

    raw = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1), (2, 2), (3, 4)]
    # engine canonicalizes: drop self-loops, dedup undirected
    und = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in und:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n = len(xs)
    mx = sum(xs) / n
    sxy = sum((x - mx) * (y - mx) for x, y in zip(xs, ys))
    sxx = sum((x - mx) ** 2 for x in xs)
    want = round(sxy / sxx, 4)
    edges = spark.createDataFrame(raw, "src long, dst long")
    row = degree_assortativity(edges).collect()[0]
    assert abs(row["r"] - want) < 1e-9, (row["r"], want)
    assert row["n_edges"] == len(und) and row["n_nodes"] == len(deg)
