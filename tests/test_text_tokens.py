"""Regression tests for the whitespace-tokenizer fix (round-3 verdict #1).

``text.tokens`` must never emit empty-string tokens — tab/newline-padded
text used to, because ``trim`` strips only 0x20 spaces and Spark's SQL
``split`` keeps edge empties.  The DuckDB oracle mirror is
``list_filter(string_split_regex(text, '\\s+'), x -> x <> '')`` and both
engines must agree on whitespace-hostile corpora, not just the fixture.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamkit_spark.functions.text import token_count, tokens

HOSTILE = [
    (1, "\tfoo\n"),
    (2, " \t \n "),
    (3, ""),
    (4, "a  b\tc"),
    (5, None),
    (6, "\n\nleading blank lines\r\nand crlf\t\ttabs "),
    (7, "plain text"),
    (8, "x y z"),  # NBSP is not regex-\s in Java or RE2: both keep it
]


def _docs(spark):
    return spark.createDataFrame(HOSTILE, "doc_id long, text string")


def test_tokens_never_empty_string(spark):
    rows = _docs(spark).select("doc_id", tokens("text").alias("t")).collect()
    got = {r["doc_id"]: r["t"] for r in rows}
    assert got[1] == ["foo"]
    assert got[2] == []
    assert got[3] == []
    assert got[4] == ["a", "b", "c"]
    assert got[5] is None
    assert got[6] == ["leading", "blank", "lines", "and", "crlf", "tabs"]
    assert got[7] == ["plain", "text"]
    for t in got.values():
        if t is not None:
            assert "" not in t


def test_token_count_on_padded_text(spark):
    rows = (
        _docs(spark)
        .where(F.col("text").isNotNull())
        .select("doc_id", token_count("text").alias("n"))
        .collect()
    )
    got = {r["doc_id"]: r["n"] for r in rows}
    assert got == {1: 1, 2: 0, 3: 0, 4: 3, 6: 6, 7: 2, 8: 2}


def test_tokens_matches_duckdb_mirror(spark, duck):
    """The lockstep contract: Spark tokens() == the oracle mirror expression
    on whitespace-hostile input (the fixture has no such docs, so only this
    test pins the cross-engine behavior)."""
    duck.execute("CREATE OR REPLACE TABLE hostile(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO hostile VALUES (?, ?)", HOSTILE)
    d_rows = duck.execute(
        r"""
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        FROM hostile WHERE text IS NOT NULL ORDER BY doc_id
        """
    ).fetchall()
    s_rows = (
        _docs(spark)
        .where(F.col("text").isNotNull())
        .select("doc_id", tokens("text").alias("t"))
        .orderBy("doc_id")
        .collect()
    )
    assert [(r["doc_id"], r["t"]) for r in s_rows] == [tuple(r) for r in d_rows]
    duck.execute("DROP TABLE hostile")
