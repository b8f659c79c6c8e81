"""Write path: Produce / Publish (SURVEY §2.1 S5/S6) on an engine-owned
events table.

Reference semantics being reproduced (Go impl:
/root/reference/pkg/storage/pebblekit/store.go:205-304):

* per-(space, segment) strict ordering: sequences are 1-based, contiguous,
  unique (invariants I1/I2); the first record of a produce must be
  ``last_sequence + 1`` or the produce fails with SequenceMismatchError;
* records are committed in chunks of ≤ 10,000 (PRODUCE_CHUNK_SIZE); every
  chunk gets ONE commit timestamp and ONE TRX (uuid, node, number), with
  trx_number strictly increasing per segment (invariant I3);
* a produce returns the resulting SegmentStatus per chunk.

Spark-first design: the store is a partitioned Parquet (or Delta, when
available) table; appends are atomic at file granularity; single-winner
conflict resolution is commit-time re-validation (optimistic concurrency —
the reference's cross-process contract is also error-not-lock,
docs/limitations.md:57-60).  Validation of an incoming batch is a
DataFrame aggregation, not a driver loop — it scales to arbitrarily large
produces.
"""

from __future__ import annotations

import os
import threading
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streamkit_spark.errors import SequenceMismatchError, ValidationError
from streamkit_spark.schema import EVENTS_SCHEMA, PRODUCE_CHUNK_SIZE

# nullable on purpose: malformed input must reach the engine's own
# validation (ValidationError), not fail at DataFrame construction
RECORD_SCHEMA = T.StructType(
    [
        T.StructField("sequence", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


class Store:
    """One streamkit store = one events-table root (tenancy boundary —
    reference: one Pebble dir / Azure prefix per store UUID,
    pkg/storage/interface.go:19-22).

    Layout: ``{root}/events`` partitioned by ``space`` — partition pruning
    makes every space-scoped read touch only its directory; within files,
    rows are sorted by (segment, sequence) at write time so min/max parquet
    stats prune segment scans (the columnar replacement for the reference's
    dual key order, SURVEY §1.3/§4).
    """

    def __init__(self, spark: SparkSession, root: str, store_id: str | None = None):
        self.spark = spark
        self.root = root
        self.store_id = store_id or str(uuid.uuid4())
        self.events_path = os.path.join(root, "events")
        self._node_id = str(uuid.uuid4())
        # per-segment write locks (reference: bounded lock map,
        # pebblekit/store.go:25,57-90): same-segment produces serialize
        # in-process, different segments run fully parallel; cross-process
        # racers are still caught by the optimistic re-validation
        self._seg_locks: dict[tuple[str, str], threading.Lock] = {}
        self._seg_locks_guard = threading.Lock()

    def _segment_lock(self, space: str, segment: str):
        with self._seg_locks_guard:
            return self._seg_locks.setdefault((space, str(segment)), threading.Lock())

    # ------------------------------------------------------------- read

    def events(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], EVENTS_SCHEMA)
        return self.spark.read.schema(EVENTS_SCHEMA).parquet(self.events_path)

    def _exists(self) -> bool:
        # cheap local check; on object stores this is a catalog lookup
        return os.path.isdir(self.events_path) and any(
            not f.startswith((".", "_")) for f in os.listdir(self.events_path)
        )

    def _last_state(self, space: str, segment: str) -> tuple[int, int]:
        """(last_sequence, last_trx_number) — the reference's pre-produce
        Peek (pebblekit/store.go:219-228)."""
        if not self._exists():
            return 0, 0
        row = (
            self.events()
            .filter((F.col("space") == space) & (F.col("segment") == segment))
            .agg(
                F.max("sequence").alias("s"),
                F.max("trx_number").alias("t"),
            )
            .first()
        )
        return (row["s"] or 0, row["t"] or 0)

    # ------------------------------------------------------------ write

    def produce(
        self,
        space: str,
        segment: str,
        records: DataFrame | list,
        now_ms: int | None = None,
    ) -> list[dict]:
        """Append records to one segment; returns one SegmentStatus dict per
        committed chunk.

        ``records``: DataFrame with RECORD_SCHEMA columns, or a list of
        (sequence, payload, metadata) tuples / dicts.
        """
        if not space or not segment:
            raise ValidationError("space and segment must be non-empty")
        df = self._as_records_df(records)

        # -- validate the incoming batch as a whole (distributed, one agg)
        stats = df.agg(
            F.count("*").alias("n"),
            F.min("sequence").alias("min_seq"),
            F.max("sequence").alias("max_seq"),
            F.count_distinct("sequence").alias("n_distinct"),
            F.sum(F.when(F.col("payload").isNull(), 1).otherwise(0)).alias("n_null"),
            F.sum(F.when(F.col("sequence") <= 0, 1).otherwise(0)).alias("n_badseq"),
        ).first()
        n = stats["n"]
        if n == 0:
            return []
        if stats["n_null"] or stats["n_badseq"]:
            raise ValidationError(
                f"{stats['n_null']} null payloads, {stats['n_badseq']} non-positive sequences"
            )
        if stats["n_distinct"] != n or stats["max_seq"] - stats["min_seq"] + 1 != n:
            # gaps or duplicates inside the batch (I1/I2 precondition)
            raise SequenceMismatchError(space, segment, -1, -1)

        with self._segment_lock(space, segment):
            return self._produce_locked(space, segment, df, stats, now_ms)

    def _produce_locked(self, space, segment, df, stats, now_ms) -> list[dict]:
        n = stats["n"]
        last_seq, last_trx = self._last_state(space, segment)
        if stats["min_seq"] != last_seq + 1:
            raise SequenceMismatchError(space, segment, last_seq + 1, stats["min_seq"])

        # -- stamp chunk lineage: chunk index from the sequence itself
        # (deterministic, no window/shuffle); one ts + TRX per chunk.
        base = int(stats["min_seq"])
        ts = now_ms if now_ms is not None else int(time.time() * 1000)
        n_chunks = (n + PRODUCE_CHUNK_SIZE - 1) // PRODUCE_CHUNK_SIZE
        chunk_ids = [str(uuid.uuid4()) for _ in range(n_chunks)]
        chunk_map = F.array(*[F.lit(c) for c in chunk_ids])
        chunk_idx = ((F.col("sequence") - base) / PRODUCE_CHUNK_SIZE).cast("long")
        stamped = (
            df.withColumn("store_id", F.lit(self.store_id))
            .withColumn("space", F.lit(space))
            .withColumn("segment", F.lit(segment))
            # every chunk commits at the same wall-clock in this batch write;
            # ts still nondecreasing in sequence (commit invariant)
            .withColumn("ts", F.lit(ts).cast("long"))
            .withColumn("trx_id", F.element_at(chunk_map, (chunk_idx + 1).cast("int")))
            .withColumn("trx_node", F.lit(self._node_id))
            .withColumn("trx_number", (F.lit(last_trx) + 1 + chunk_idx).cast("long"))
            .select(*[f.name for f in EVENTS_SCHEMA.fields])
        )

        # -- single-winner re-validation then atomic append (optimistic
        # concurrency; Delta MERGE precondition when delta is available)
        cur_seq, _ = self._last_state(space, segment)
        if cur_seq != last_seq:
            raise SequenceMismatchError(space, segment, last_seq + 1, cur_seq + 1)
        self._append_files(stamped)

        # -- SegmentStatus per chunk (reference returns one per commit)
        statuses = []
        for ci in range(n_chunks):
            first = base + ci * PRODUCE_CHUNK_SIZE
            last = min(base + (ci + 1) * PRODUCE_CHUNK_SIZE - 1, int(stats["max_seq"]))
            statuses.append(
                {
                    "space": space,
                    "segment": segment,
                    "first_sequence": 1 if last_seq == 0 else None,
                    "last_sequence": last,
                    "last_ts": ts,
                    "trx_number": last_trx + 1 + ci,
                    "first_in_batch": first,
                }
            )
        return statuses

    def publish(
        self,
        space: str,
        segment: str,
        payload: bytes,
        metadata: dict[str, str] | None = None,
        now_ms: int | None = None,
    ) -> dict:
        """S6 — single-record append: peek → sequence = last+1 → produce
        (reference: pkg/client/client.go:1247-1320)."""
        last_seq, _ = self._last_state(space, segment)
        out = self.produce(
            space, segment, [(last_seq + 1, payload, metadata)], now_ms=now_ms
        )
        return out[0]

    def compact(self, files_per_space: int = 1) -> dict[str, int]:
        """Rewrite the events table into few large files per space, sorted
        by (segment, sequence).

        Streaming appends leave one small file per produce — the classic
        small-file problem; at scale this turns scans into metadata storms.
        Compaction restores the designed layout (space partitions, sorted
        files → parquet min/max stats prune segment scans).  Written to a
        staging dir then atomically swapped, so concurrent readers see
        either the old or the new layout, never a partial one.

        Returns {"files_before": n, "files_after": m}."""
        import shutil

        def count_files(root: str) -> int:
            total = 0
            for _, _, files in os.walk(root):
                total += sum(1 for f in files if f.endswith(".parquet"))
            return total

        if not self._exists():
            return {"files_before": 0, "files_after": 0}
        before = count_files(self.events_path)
        staging = self.events_path + ".compacting"
        (
            self.events()
            .repartition(files_per_space, "space")
            .sortWithinPartitions("space", "segment", "sequence")
            .write.mode("overwrite")
            .partitionBy("space")
            .parquet(staging)
        )
        old = self.events_path + ".old"
        os.rename(self.events_path, old)
        os.rename(staging, self.events_path)
        shutil.rmtree(old)
        return {"files_before": before, "files_after": count_files(self.events_path)}

    # ---------------------------------------------------------- helpers

    def _append_files(self, stamped: DataFrame) -> None:
        """Concurrent-safe append: write to a produce-private staging dir,
        then move the parquet files into the table with unique names.

        The default Hadoop committer stages every concurrent write of one
        table under the SAME ``_temporary/0`` directory — parallel
        producers corrupt each other's staging (observed under the
        high-volume test).  A private staging dir + per-file rename gives
        lock-free cross-segment write parallelism — the reference's model
        (per-segment serialization only, docs/production.md:85-91)."""
        import shutil

        staging = os.path.join(self.root, f".staging-{uuid.uuid4()}")
        try:
            (
                stamped.repartition(1)
                .sortWithinPartitions("segment", "sequence")
                .write.mode("overwrite")
                .partitionBy("space")
                .parquet(staging)
            )
            for entry in os.listdir(staging):
                if not entry.startswith("space="):
                    continue
                dest_dir = os.path.join(self.events_path, entry)
                os.makedirs(dest_dir, exist_ok=True)
                src_dir = os.path.join(staging, entry)
                for f in os.listdir(src_dir):
                    if f.endswith(".parquet"):
                        os.rename(
                            os.path.join(src_dir, f),
                            os.path.join(dest_dir, f"{uuid.uuid4()}.parquet"),
                        )
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    def _as_records_df(self, records: DataFrame | list) -> DataFrame:
        if isinstance(records, DataFrame):
            return records.select("sequence", "payload", "metadata")
        rows = []
        for r in records:
            if isinstance(r, dict):
                rows.append((r["sequence"], r["payload"], r.get("metadata")))
            else:
                seq, payload, *rest = r
                rows.append((seq, payload, rest[0] if rest else None))
        return self.spark.createDataFrame(rows, RECORD_SCHEMA)
