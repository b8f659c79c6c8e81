"""Byte-pair-encoding vocabulary induction, Spark-first.

Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words with
Subword Units" (ACL'16): repeatedly merge the most frequent adjacent
symbol pair.  The scale insight the naive corpus formulation misses:
BPE statistics live on the WORD VOCABULARY WITH COUNTS, not the corpus —
100 TB of text collapses to a vocab table of (word, count) rows (a few
million) after one aggregate, and every merge iteration is then a small
aggregate over that table.  The corpus is scanned exactly once.

Per iteration:
  1. adjacent-pair counts: in-row pair expansion over each word's symbol
     array, weighted by the word count, map-side combined — shuffle is
     O(distinct pairs), not O(corpus);
  2. argmax pair with a deterministic tiebreak (count desc, pair asc) —
     one 1-row collect;
  3. in-row left-to-right merge fold over every symbol array (the same
     greedy scan the reference python implementation uses);
  4. ``localCheckpoint`` the symbols table — the loop otherwise builds
     an O(iterations)-deep lineage (the duplicate_clusters lesson).

No DuckDB oracle: the loop is iterative/driver-coordinated (same class
as k-means, which IS oracle-checked only because 2 unrolled iterations
fit in SQL).  Validation is exact parity with a from-scratch python
reference implementation (tests/test_bpe.py).  Tokenization is the
engine's ``text.tokens`` (Java ``\\s+`` = ASCII whitespace) — a parity
model must split on the same class, not python ``str.split()``, which
also breaks on U+00A0/U+2009-style Unicode spaces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["word_vocab", "learn_bpe_merges", "apply_merges", "bpe_segment_python"]

END = "</w>"  # end-of-word marker: lets merges distinguish suffixes


def _words(text: Column) -> Column:
    """Lowercased whitespace tokens (``text.tokens`` guarantees no empty
    fragments for any whitespace flavor, including tab/newline padding)."""
    from streamkit_spark.functions.text import tokens

    return tokens(F.lower(text))


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) counts over lowercased whitespace tokens — the ONLY
    corpus-sized aggregate in BPE training."""
    return (
        df.select(F.explode(_words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _chars(word: Column) -> Column:
    """word → [c1, c2, ..., </w>] (empty fragments from the empty-regex
    split stripped — Java's split keeps a trailing one)."""
    return F.concat(
        F.filter(F.split(word, ""), lambda s: s != ""),
        F.array(F.lit(END)),
    )


def _merge_fold(sym: Column, a: str, b: str) -> Column:
    """Left-to-right single-pass merge of adjacent (a, b) → a+b inside a
    symbol array — exactly the reference implementation's greedy scan
    (a freshly-merged symbol never re-merges with the next element in
    the same pass)."""
    a_lit, b_lit, ab = F.lit(a), F.lit(b), F.lit(a + b)
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a_lit)
            & (s == b_lit),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(ab)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe_merges(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn the first ``n_merges`` BPE merges from a corpus.  Returns
    the ordered merge list [(a, b), ...] — apply with
    :func:`apply_merges`.

    Only (pair, count) aggregates and one merge-winner row per iteration
    ever reach the driver."""
    vocab = (
        word_vocab(df, text_col)
        .select(_chars(F.col("word")).alias("sym"), F.col("n"))
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            vocab.filter(F.size("sym") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(sym) - 1),"
                        " i -> struct(sym[i - 1] AS a, sym[i] AS b))"
                    )
                ).alias("p"),
                "n",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
        )
        top = (
            pairs.filter(F.col("cnt") >= min_pair_count)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            _merge_fold(F.col("sym"), a, b).alias("sym"), "n"
        ).localCheckpoint()
    return merges


def apply_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment a corpus with a learned merge list: (id, n_words,
    n_subwords) — the fertility statistics that tell you whether the
    vocabulary fits the corpus.  Map-only: each merge is one in-row fold
    over per-word symbol arrays; nothing shuffles."""
    # explode_outer: a doc with zero tokens keeps its row (null word) and
    # reports (id, 0, 0) instead of silently vanishing from the output
    words = df.select(
        F.col(id_col),
        F.explode_outer(_words(F.col(text_col))).alias("word"),
    )
    sym = _chars(F.col("word"))
    for a, b in merges:
        sym = _merge_fold(sym, a, b)
    n_sym = F.when(F.col("word").isNull(), F.lit(0)).otherwise(F.size(sym))
    has_word = F.when(F.col("word").isNull(), F.lit(0)).otherwise(F.lit(1))
    return (
        words.select(F.col(id_col), n_sym.alias("n_sym"), has_word.alias("w"))
        .groupBy(id_col)
        .agg(
            F.sum("w").cast("long").alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_subwords"),
        )
        .orderBy(id_col)
    )


def bpe_segment_python(
    word: str, merges: list[tuple[str, str]]
) -> list[str]:
    """Reference segmentation of one word (driver-side) — the parity
    model the distributed folds are tested against."""
    sym = list(word) + [END]
    for a, b in merges:
        out: list[str] = []
        for s in sym:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        sym = out
    return sym
