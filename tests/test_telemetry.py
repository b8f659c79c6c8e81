"""Telemetry surface tests: Observation-backed in-job metrics, driver
counters, nested spans with error capture, the flat report DataFrame,
and the bounded streaming progress listener."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from streamkit_spark import tables
from streamkit_spark.telemetry import StreamProgressListener, Telemetry
from tests.conftest import SF_DIR


class TestObserve:
    def test_metrics_match_direct_aggregate(self, spark):
        tel = Telemetry()
        ev = tables.load(spark, SF_DIR, "events")
        observed = tel.observe(
            ev.filter(F.col("value") > 100),
            "hot_scan",
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        n_out = observed.count()  # the action that feeds the observation
        got = tel.metrics("hot_scan")
        direct = (
            ev.filter(F.col("value") > 100)
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            )
            .collect()[0]
        )
        assert got["rows"] == n_out == direct["rows"]
        assert got["sum_value"] == direct["sum_value"]

    def test_default_metric_is_row_count(self, spark):
        tel = Telemetry()
        df = tel.observe(spark.range(37), "rng")
        df.count()
        assert tel.metrics("rng")["rows"] == 37


class TestCountersAndSpans:
    def test_counters_accumulate(self, spark):
        tel = Telemetry()
        tel.counter("produce.appends")
        tel.counter("produce.appends", 2)
        assert tel.counters == {"produce.appends": 3}

    def test_spans_nest_and_record_errors(self, spark):
        tel = Telemetry()
        with tel.span("outer"):
            with tel.span("inner"):
                pass
            with pytest.raises(ValueError):
                with tel.span("boom"):
                    raise ValueError("x")
        spans = tel.spans
        by_name = {s["name"]: s for s in spans}
        # children close before the parent
        assert [s["name"] for s in spans] == ["inner", "boom", "outer"]
        assert by_name["inner"]["parent"] == "outer"
        assert by_name["inner"]["depth"] == 1
        assert by_name["outer"]["parent"] is None
        assert by_name["boom"]["error"] == "ValueError"
        assert by_name["outer"]["error"] is None
        assert all(s["seconds"] >= 0 for s in spans)

    def test_span_deque_is_bounded(self, spark):
        tel = Telemetry(max_spans=5)
        for i in range(9):
            with tel.span(f"s{i}"):
                pass
        assert len(tel.spans) == 5
        assert tel.spans[0]["name"] == "s4"


class TestReport:
    def test_report_shape_and_content(self, spark):
        tel = Telemetry()
        tel.counter("retries", 4)
        df = tel.observe(spark.range(10), "scan")
        df.count()
        with tel.span("work"):
            pass
        rep = {(r["kind"], r["name"], r["metric"]): r for r in tel.report(spark).collect()}
        assert rep[("counter", "retries", "count")]["value"] == 4.0
        assert rep[("observation", "scan", "rows")]["value"] == 10.0
        assert ("span", "work", "seconds") in rep

    def test_non_numeric_and_bool_metrics_not_dropped(self, spark):
        """ADVICE r6: a min/max over a string column must land in the
        report (value NULL, payload in text_value); bools are explicit
        1.0/0.0 with 'true'/'false' text."""
        tel = Telemetry()
        df = spark.createDataFrame(
            [("apple", 1), ("pear", 2)], "word string, n int"
        )
        obs = tel.observe(
            df,
            "mixed",
            F.max("word").alias("max_word"),
            F.bool_and(F.col("n") > 0).alias("all_pos"),
            F.sum("n").alias("total"),
        )
        obs.count()
        rep = {
            (r["kind"], r["name"], r["metric"]): r
            for r in tel.report(spark).collect()
        }
        sm = rep[("observation", "mixed", "max_word")]
        assert sm["value"] is None and sm["text_value"] == "pear"
        bm = rep[("observation", "mixed", "all_pos")]
        assert bm["value"] == 1.0 and bm["text_value"] == "true"
        nm = rep[("observation", "mixed", "total")]
        assert nm["value"] == 3.0 and nm["text_value"] is None

    def test_numeric_looking_string_metric_stays_text(self, spark):
        """max over STRING ids like '00042' must keep its payload in
        text_value — float('00042') succeeding is not numericness
        (r7 review fix)."""
        tel = Telemetry()
        df = spark.createDataFrame(
            [("00042",), ("00007",)], "order_id string"
        )
        obs = tel.observe(df, "ids", F.max("order_id").alias("max_id"))
        obs.count()
        rep = {
            (r["kind"], r["name"], r["metric"]): r
            for r in tel.report(spark).collect()
        }
        m = rep[("observation", "ids", "max_id")]
        assert m["value"] is None and m["text_value"] == "00042"

    def test_unrun_observation_skipped(self, spark):
        tel = Telemetry()
        tel.observe(spark.range(5), "never_run")
        tel.counter("c")
        kinds = {r["kind"] for r in tel.report(spark).collect()}
        assert kinds == {"counter"}


class TestStreamListener:
    def test_progress_captured_and_summarized(self, spark, tmp_path):
        d = tmp_path / "events_stream"
        d.mkdir()
        shutil.copy(f"{SF_DIR}/events.parquet", d / "events.parquet")
        raw = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
        stream = tables.normalize_events(
            spark.readStream.schema(raw).parquet(str(d))
        )
        n_src = spark.read.parquet(f"{SF_DIR}/events.parquet").count()

        lst = StreamProgressListener()
        spark.streams.addListener(lst.listener)
        q = (
            stream.groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("tel_probe")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            spark.streams.removeListener(lst.listener)
        # listener callbacks are async — poll briefly for the events
        import time

        deadline = time.time() + 15
        while time.time() < deadline and not lst.progress():
            time.sleep(0.2)
        s = lst.summary()
        assert s["batches"] >= 1
        assert s["input_rows"] == n_src
        assert s["max_state_rows"] >= 1
