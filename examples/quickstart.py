"""Quickstart for streamkit users switching to streamkit_spark.

Each section pairs a reference client call (left, Go) with the engine
equivalent (right, PySpark).  Run directly:

    python examples/quickstart.py

Reference verb            → engine call
---------------------------------------------------------------
client.Produce            → engine.produce(...) / store.produce(...)
client.Publish            → store.publish(...)
client.ConsumeSegment     → engine.consume_segment(store, space, segment, bounds)
client.ConsumeSpace       → engine.consume_space(store, space, bounds)
client.Consume            → engine.consume(store, [(space, cursor)...])
client.Peek               → engine.peek(store, space, segment)
client.GetSegmentStatus   → engine.get_segment_status(store, space, segment)
client.GetSpaces          → engine.get_spaces(store)
client.GetSegments        → engine.get_segments(store, space)
client.SubscribeToSegmentStatus → engine.subscribe(store, space) (snapshot→live)
eskit.LoadEvents/SaveEvents     → streamkit_spark.es.load_events/save_events
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from streamkit_spark.engine import StreamkitEngine
from streamkit_spark.operators.consume import ConsumeBounds
from streamkit_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="quickstart")
    root = tempfile.mkdtemp(prefix="streamkit_spark_qs_")
    engine = StreamkitEngine(spark, root)
    store_id = "demo"

    # -- write path: Produce (expected-sequence append, I1-I3 validated)
    engine.produce(
        store_id,
        "orders",
        "customer-1",
        [(1, b'{"type":"created"}', {"src": "qs"}),
         (2, b'{"type":"paid"}', None)],
    )
    engine.produce(store_id, "orders", "customer-2", [(1, b'{"type":"created"}', None)])

    # -- read path: ConsumeSegment with bounds (key-range pushdown)
    rows = engine.consume_segment(
        store_id, "orders", "customer-1", ConsumeBounds(min_sequence=1)
    ).collect()
    print(f"consume_segment: {len(rows)} rows, last payload={bytes(rows[-1]['payload'])!r}")

    # -- Peek (stored-status fast path) + status/inventory
    head = engine.peek(store_id, "orders", "customer-1").first()
    print(f"peek: sequence={head['sequence']}")
    print("spaces:", [r["space"] for r in engine.get_spaces(store_id).collect()])
    status = engine.get_segment_status(store_id, "orders", "customer-1").first()
    print(f"status: [{status['first_sequence']}, {status['last_sequence']}]")

    # -- curation ops on any document DataFrame
    docs = spark.createDataFrame(
        [(1, "spark spark spark spark"), (2, "a perfectly normal sentence here")],
        "doc_id long, text string",
    )
    from streamkit_spark.functions.text import repetition_stats

    for r in repetition_stats(docs).collect():
        print(f"doc {r['doc_id']}: dup_word_frac={r['dup_word_frac']}")

    spark.stop()


if __name__ == "__main__":
    main()
