"""Kneser-Ney bigram scoring: python-reference parity + magnitude pins.

The reference implements Chen & Goodman (1999) eq. 4.25 independently
from the Spark code (dict counting, not SQL), so a dropped margin or a
swapped N1+ direction cannot hide in engine==oracle symmetry (the
AD/chi2/Burrows lesson)."""

from __future__ import annotations

import math


def _kn_counts(texts: dict[int, str]):
    """Bigram count margins shared by the reference scorer and the
    normalization pin — ONE definition so a margin fix can't leave a
    stale copy behind."""
    toks = {i: t.split() for i, t in texts.items()}
    cab: dict[tuple[str, str], int] = {}
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            cab[(a, b)] = cab.get((a, b), 0) + 1
    c_a: dict[str, int] = {}
    n1f: dict[str, int] = {}
    n1b: dict[str, int] = {}
    for (a, b), c in cab.items():
        c_a[a] = c_a.get(a, 0) + c
        n1f[a] = n1f.get(a, 0) + 1
        n1b[b] = n1b.get(b, 0) + 1
    return toks, cab, c_a, n1f, n1b, len(cab)


def _kn_reference(texts: dict[int, str], d: float = 0.75):
    """Independent dict-based interpolated-KN scorer."""
    toks, cab, c_a, n1f, n1b, n_bb = _kn_counts(texts)
    out = {}
    for i, ws in toks.items():
        if len(ws) < 2:
            continue
        lps = []
        for a, b in zip(ws, ws[1:]):
            p = (cab[(a, b)] - d) / c_a[a] + d * n1f[a] / c_a[a] * (
                n1b[b] / n_bb
            )
            lps.append(math.log(p))
        out[i] = (len(lps), round(sum(lps) / len(lps), 4))
    return out


def test_kn_matches_python_reference(spark):
    from streamkit_spark.functions.curation import kn_bigram_logprob

    texts = {
        1: "the cat sat on the mat",
        2: "the dog sat on the log",
        3: "a cat and a dog and a bird",
        4: "san francisco",          # 'francisco' only ever follows 'san'
        5: "the reading glasses",
        6: "one",                    # < 2 tokens: no output row
    }
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["kn_logprob"])
        for r in kn_bigram_logprob(df).collect()
    }
    want = _kn_reference(texts)
    assert got == want
    assert 6 not in got


def test_kn_full_vocab_normalization():
    """Magnitude pin (Spark-free): for every context u the model mass
    sums to 1 EXACTLY over the full vocabulary — the discounted seen
    mass plus d·N1+(u,·)/c(u) times Σ_w P_cont(w) (= 1).  A dropped
    margin or a swapped N1+ direction breaks this identity."""
    texts = {
        1: "the cat sat on the mat",
        2: "the dog sat on the log",
        3: "a cat and a dog and a bird",
    }
    _toks, cab, c_a, n1f, n1b, n_bb = _kn_counts(texts)
    d = 0.75
    # full-vocabulary normalization: sum_w P(w|u) = 1 exactly, because
    # sum_w P_cont(w) = 1 and the discounted seen mass redistributes
    for u in c_a:
        seen = sum(
            (c - d) / c_a[u] for (a, b), c in cab.items() if a == u
        )
        cont_total = d * n1f[u] / c_a[u] * sum(
            n1b[w] / n_bb for w in n1b
        )
        assert abs(seen + cont_total - 1.0) < 1e-9, u


def test_kn_novelty_beats_frequency(spark):
    """The Kneser-Ney point: a word frequent in ONE context only
    ('francisco' after 'san') gets LOW continuation probability in a
    novel context, while an equally-frequent word seen in many contexts
    gets a higher one."""
    from streamkit_spark.functions.curation import kn_bigram_logprob

    base = [
        (i, "san francisco " * 3, "en", "s", 40) for i in range(1, 4)
    ]
    varied = [
        (10, "a nice day", "en", "s", 10),
        (11, "one nice dog", "en", "s", 12),
        (12, "some nice cats", "en", "s", 14),
    ]
    probe = [
        (100, "day francisco", "en", "s", 13),  # novel context for each
        (101, "day nice", "en", "s", 8),
    ]
    df = spark.createDataFrame(
        base + varied + probe,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: r["kn_logprob"]
        for r in kn_bigram_logprob(df).collect()
    }
    # 'nice' (3 distinct left-contexts) outscores 'francisco' (1) after
    # the shared novel context 'day'
    assert got[101] > got[100]
