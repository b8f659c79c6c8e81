"""Physical-plan inspection: the engine's "did Catalyst do what we
designed for?" toolkit.

Used by the performance test-suite to assert, per operator:
* predicate pushdown reached the parquet scan (PushedFilters);
* column pruning happened (ReadSchema);
* small dimensions joined via BroadcastHashJoin;
* no gratuitous Exchange (shuffle) in map-only pipelines.

At 100 TB these assertions are the difference between touching one
partition and touching the fleet — encoding them as tests keeps plan
regressions from shipping.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain(mode)`` prints)."""
    jdf = df._jdf  # noqa: SLF001 — no public capture API in PySpark
    qe = jdf.queryExecution()
    jvm = df.sparkSession._jvm  # noqa: SLF001
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return qe.explainString(explain_mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan in the plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        # entries look like Name(args,...); split between ")" and the next
        # entry, not on the commas inside the parens
        out.extend(p.strip() for p in re.split(r"(?<=\)),", m.group(1)) if p.strip())
    return out


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    got = " | ".join(pushed_filters(df))
    for frag in fragments:
        assert frag in got, f"filter {frag!r} not pushed; pushed = [{got}]"


def read_schemas(df: DataFrame) -> list[str]:
    text = explain_str(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", text)]


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan."""
    text = explain_str(df, "simple")
    return len(re.findall(r"\bExchange\b", text))


def assert_no_exchange(df: DataFrame) -> None:
    n = count_exchanges(df)
    assert n == 0, f"expected shuffle-free plan, found {n} Exchange(s)"


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def codegen_stage_count(df: DataFrame) -> int:
    """WholeStageCodegen spans — wider is better (fewer pipeline breaks).

    Under AQE the pre-execution plan hides codegen spans, so the query is
    re-planned once with AQE off (via a temp view, which forces fresh
    physical planning under the current conf)."""
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        df.createOrReplaceTempView("__codegen_probe")
        text = explain_str(spark.sql("SELECT * FROM __codegen_probe"), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
        spark.catalog.dropTempView("__codegen_probe")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0
