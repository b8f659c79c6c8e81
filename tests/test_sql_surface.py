"""SQL surface: store views answer the same queries as the DataFrame API."""

from __future__ import annotations

import pytest

from streamkit_spark.operators.produce import Store
from streamkit_spark.operators.status import segment_status
from streamkit_spark.sql import register_fixture_views, register_store_views


def test_store_views_match_dataframe_api(spark, tmp_path):
    store = Store(spark, str(tmp_path / "store"))
    store.produce("s0", "g0", [(i, b"x", None) for i in range(1, 4)], now_ms=10)
    store.produce("s0", "g1", [(1, b"y", None)], now_ms=20)
    register_store_views(spark, store, prefix="sk_")

    via_sql = {
        (r["space"], r["segment"]): (r["first_sequence"], r["last_sequence"])
        for r in spark.sql("SELECT * FROM sk_segment_status").collect()
    }
    via_df = {
        (r["space"], r["segment"]): (r["first_sequence"], r["last_sequence"])
        for r in segment_status(store.events()).collect()
    }
    assert via_sql == via_df

    heads = {
        r["segment"]: r["sequence"]
        for r in spark.sql("SELECT segment, sequence FROM sk_heads").collect()
    }
    assert heads == {"g0": 3, "g1": 1}

    assert spark.sql("SELECT count(*) FROM sk_spaces").first()[0] == 1
    assert spark.sql("SELECT count(*) FROM sk_segments").first()[0] == 2

    # ad-hoc SQL over the envelope works (S1 in SQL form)
    rows = spark.sql(
        "SELECT sequence FROM sk_events WHERE space='s0' AND segment='g0' "
        "AND sequence BETWEEN 2 AND 3 ORDER BY sequence"
    ).collect()
    assert [r["sequence"] for r in rows] == [2, 3]


def test_fixture_views_register(spark):
    from tests.conftest import SF_DIR

    register_fixture_views(spark, SF_DIR)
    n = spark.sql("SELECT count(*) FROM lineitem").first()[0]
    assert n > 0
    joined = spark.sql(
        """
        SELECT r_name, count(*) AS n FROM nation
        JOIN region ON n_regionkey = r_regionkey GROUP BY 1 ORDER BY 1
        """
    ).collect()
    assert len(joined) == 5
