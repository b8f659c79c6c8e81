"""BPE vocabulary induction: exact parity with a from-scratch python
reference (merges AND segmentation), fertility accounting."""

from __future__ import annotations

from collections import Counter

from streamkit_spark.functions.bpe import (
    END,
    apply_merges,
    bpe_segment_python,
    learn_bpe_merges,
)


def _ascii_tokens(t: str) -> list[str]:
    """The engine tokenizer's whitespace class (Java \\s = ASCII only) —
    python str.split() would also break on U+00A0-style Unicode spaces
    and diverge from text.tokens on such corpora."""
    import re

    t = t.strip(" \t\n\x0b\f\r")
    return re.split(r"[ \t\n\x0b\f\r]+", t) if t else []


def _python_bpe(texts: list[str], n_merges: int, min_pair_count: int = 2):
    """Independent reference: Sennrich-style BPE over a word-count
    vocabulary, deterministic (count desc, pair asc) tiebreak."""
    vocab = Counter()
    for t in texts:
        for w in _ascii_tokens(t.lower()):
            vocab[w] += 1
    syms = {w: list(w) + [END] for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, n in vocab.items():
            s = syms[w]
            for x, y in zip(s, s[1:]):
                pairs[(x, y)] += n
        candidates = [
            (c, p) for p, c in pairs.items() if c >= min_pair_count
        ]
        if not candidates:
            break
        # deterministic: count desc, then pair asc
        top_count = max(c for c, _ in candidates)
        best_pair = min(p for c, p in candidates if c == top_count)
        merges.append(best_pair)
        a, b = best_pair
        for w in syms:
            s, out = syms[w], []
            for ch in s:
                if out and out[-1] == a and ch == b:
                    out[-1] = a + b
                else:
                    out.append(ch)
            syms[w] = out
    return merges


def test_merges_match_python_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new new new",
        "wide wider widest low new",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = _python_bpe(texts, n_merges=8)
    got = learn_bpe_merges(df, n_merges=8)
    assert got == want, (got, want)
    assert len(got) == 8  # this corpus supports at least 8 merges


def test_segmentation_and_fertility(spark):
    texts = ["aaab aaab aaab", "aaab ab"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = learn_bpe_merges(df, n_merges=3)
    out = {r["doc_id"]: r for r in apply_merges(df, merges).collect()}
    # distributed fold == python greedy scan, word by word
    for doc_id, t in enumerate(texts):
        want = sum(
            len(bpe_segment_python(w, merges))
            for w in _ascii_tokens(t.lower())
        )
        assert out[doc_id]["n_subwords"] == want
        assert out[doc_id]["n_words"] == len(_ascii_tokens(t))
    # merges strictly reduce symbol counts vs no merges
    none = {r["doc_id"]: r for r in apply_merges(df, []).collect()}
    for doc_id in out:
        assert out[doc_id]["n_subwords"] < none[doc_id]["n_subwords"]


def test_stops_when_no_pair_reaches_min_count(spark):
    df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    # every word is a single char + END: each pair occurs once < 2
    assert learn_bpe_merges(df, n_merges=5, min_pair_count=2) == []


def test_apply_merges_keeps_empty_docs(spark):
    df = spark.createDataFrame(
        [(0, "hello hello"), (1, ""), (2, "   ")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in apply_merges(df, []).collect()}
    assert set(out) == {0, 1, 2}, "token-less docs must not vanish"
    assert (out[1]["n_words"], out[1]["n_subwords"]) == (0, 0)
    assert (out[2]["n_words"], out[2]["n_subwords"]) == (0, 0)
    assert out[0]["n_words"] == 2
