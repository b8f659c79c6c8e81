"""Shared fixtures: one SparkSession per test run + a DuckDB oracle harness
that mirrors the driver's comparison protocol (row-count, column names,
order-insensitive values)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamkit_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("STREAMKIT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark(
        app_name="streamkit_spark_tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 vs 0.0 and float repr jitter at the comparison layer
        return round(v, 9)
    if isinstance(v, bytes):
        return v.hex()
    return v


def normalize_rows(cols, rows):
    return sorted(
        tuple(_norm_cell(v) for v in row) for row in rows
    )


def compare_query(spark, duck, spark_df, sql):
    """Driver-protocol comparison: column names, row count, sorted values."""
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    d = duck.execute(sql)
    d_cols = [c[0].lower() for c in d.description]
    d_rows = d.fetchall()
    assert s_cols == d_cols, f"columns differ: spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"row counts differ: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn = normalize_rows(s_cols, s_rows)
    dn = normalize_rows(d_cols, d_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sn, dn)) if a != b
    ]
    assert not mismatches, f"value mismatch (first 3): {mismatches[:3]}"
