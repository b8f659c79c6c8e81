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
available) table; appends are atomic at file granularity.  Single-winner
semantics for same-segment writers come from three layers: (1) in-process
per-segment mutex (the reference's lock map), (2) cross-process per-segment
flock held for the peek→append window, (3) a post-append tail verification
that detects any write that slipped past both (stale status after a crash,
lock-bypassing foreign writer), rolls back exactly the files this produce
renamed in, repairs the status row, and raises SequenceMismatchError — the
reference's error-not-lock contract for racers (docs/limitations.md:57-60).
Validation of an incoming batch is a DataFrame aggregation, not a driver
loop — it scales to arbitrarily large produces.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
import urllib.parse
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streamkit_spark.errors import SequenceMismatchError, ValidationError
from streamkit_spark.schema import (
    EVENTS_SCHEMA,
    PRODUCE_CHUNK_SIZE,
    SEGMENT_STATUS_SCHEMA,
)

try:  # POSIX file locks for cross-process writer coordination
    import fcntl
except ImportError:  # pragma: no cover - non-POSIX
    fcntl = None


@contextlib.contextmanager
def _flock(path: str, exclusive: bool):
    """Advisory cross-process lock (fcntl.flock).  Producers take the store
    lock SHARED (they may run concurrently across segments) and their
    segment lock EXCLUSIVE; compact takes the store lock EXCLUSIVE, which
    quiesces every producer for the swap.  flock is per open-file-
    description, so two threads of one process also exclude each other."""
    if fcntl is None:  # pragma: no cover
        yield
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd = os.open(path, os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX if exclusive else fcntl.LOCK_SH)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def _parquet_paths(root: str) -> list[str]:
    """Every .parquet file under ``root`` (absolute paths) — the ONE
    file-selection rule, shared by compact and file_stats."""
    out = []
    for d, _, files in os.walk(root):
        out += [os.path.join(d, f) for f in files if f.endswith(".parquet")]
    return out


def _part_dir(space: str, segment: str) -> str:
    """Spark-compatible partition directory for one (space, segment):
    values %-escaped exactly as Spark unescapes them on read."""
    q = lambda v: urllib.parse.quote(str(v), safe="")
    return f"space={q(space)}/segment={q(segment)}"

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
        self.status_path = os.path.join(root, "segment_status")
        self._locks_dir = os.path.join(root, ".locks")
        self._node_id = str(uuid.uuid4())
        # per-segment write locks (reference: bounded lock map,
        # pebblekit/store.go:25,57-90): same-segment produces serialize
        # in-process, different segments run fully parallel.  Cross-process
        # same-segment writers are excluded by a per-segment flock (see
        # _produce), and any writer that bypasses the lock protocol is
        # caught by the post-append verification (rollback + error).
        self._seg_locks: dict[tuple[str, str], threading.Lock] = {}
        self._seg_locks_guard = threading.Lock()

    def _segment_lock(self, space: str, segment: str):
        with self._seg_locks_guard:
            return self._seg_locks.setdefault((space, str(segment)), threading.Lock())

    def _seg_flock_path(self, space: str, segment: str) -> str:
        key = urllib.parse.quote(f"{space}__{segment}", safe="")
        return os.path.join(self._locks_dir, f"seg-{key}.lock")

    @property
    def _store_lock_path(self) -> str:
        return os.path.join(self._locks_dir, "store.lock")

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

    # ----------------------------------------------------------- status

    def statuses(self) -> DataFrame:
        """The maintained segment_status table (A1, incrementally updated
        at write time — reference: pebblekit/store.go:289-302)."""
        if not os.path.isdir(self.status_path):
            return self.spark.createDataFrame([], SEGMENT_STATUS_SCHEMA)
        return self.spark.read.schema(SEGMENT_STATUS_SCHEMA).parquet(self.status_path)

    def last_status(self, space: str, segment: str) -> dict | None:
        """O(1) stored-status lookup: reads the one tiny parquet partition
        for (space, segment) driver-side (pyarrow) — no Spark job.  This is
        the columnar analog of the reference peeking its stored status row
        / LAST_ENTRY pointer (pebblekit/store.go:219-228,294).

        During a concurrent status swap two row versions may coexist for an
        instant; the max-last_sequence row wins (monotone by construction).
        """
        import pyarrow.parquet as pq

        part = os.path.join(self.status_path, _part_dir(space, segment))
        if not os.path.isdir(part):
            return None
        best = None
        for f in os.listdir(part):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(part, f))
            for row in t.to_pylist():
                if best is None or (row["last_sequence"] or 0) > (best["last_sequence"] or 0):
                    best = row
        return best

    def _write_status_row(
        self,
        space: str,
        segment: str,
        first_sequence: int,
        first_ts: int,
        last_sequence: int,
        last_ts: int,
        last_trx_number: int,
    ) -> None:
        """Merge one produce's resulting status into the status table —
        pure driver-side work on values the produce already computed (no
        events scan, no Spark job; VERDICT r1 'incremental status upsert').

        Write order makes readers race-safe without a lock: the new row
        file lands first, old row files are removed after — a concurrent
        reader sees one or both rows and `last_status` resolves by max
        last_sequence."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        part = os.path.join(self.status_path, _part_dir(space, segment))
        os.makedirs(part, exist_ok=True)
        old_files = [f for f in os.listdir(part) if f.endswith(".parquet")]
        table = pa.table(
            {
                "first_sequence": pa.array([first_sequence], pa.int64()),
                "first_ts": pa.array([first_ts], pa.int64()),
                "last_sequence": pa.array([last_sequence], pa.int64()),
                "last_ts": pa.array([last_ts], pa.int64()),
                "last_trx_number": pa.array([last_trx_number], pa.int64()),
            }
        )
        tmp = os.path.join(part, f".tmp-{uuid.uuid4()}.parquet")
        pq.write_table(table, tmp)
        os.rename(tmp, os.path.join(part, f"{uuid.uuid4()}.parquet"))
        for f in old_files:
            with contextlib.suppress(FileNotFoundError):
                os.remove(os.path.join(part, f))

    def _repair_status(self, space: str, segment: str) -> None:
        """Recompute one segment's status row from events (recovery path —
        reference recompute fallback, pebblekit/store.go:368-409)."""
        row = (
            self.events()
            .filter((F.col("space") == space) & (F.col("segment") == segment))
            .agg(
                F.min("sequence").alias("fs"),
                F.min_by("ts", F.col("sequence")).alias("fts"),
                F.max("sequence").alias("ls"),
                F.max_by("ts", F.col("sequence")).alias("lts"),
                F.max("trx_number").alias("lt"),
            )
            .first()
        )
        if row["ls"] is None:
            return
        self._write_status_row(
            space, segment, row["fs"], row["fts"], row["ls"], row["lts"], row["lt"]
        )

    def _last_state(self, space: str, segment: str) -> tuple[int, int]:
        """(last_sequence, last_trx_number) — the reference's pre-produce
        Peek (pebblekit/store.go:219-228).

        Fast path: the maintained status row (driver-side point read, no
        Spark job).  Fallback: events scan (bootstrap / stores written
        before status maintenance existed).  A stale status row — possible
        only after a crash inside the append/status window — is detected by
        the post-append verification, which rolls the write back, repairs
        the status row from events, and raises; the caller's retry then
        sees the correct tail."""
        st = self.last_status(space, segment)
        if st is not None:
            return int(st["last_sequence"] or 0), int(st["last_trx_number"] or 0)
        return self._last_state_scan(space, segment)

    def _last_state_scan(self, space: str, segment: str) -> tuple[int, int]:
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

        # lock order: in-process segment lock → store flock (shared) →
        # segment flock (exclusive).  compact() takes the store flock
        # exclusively, so it never overlaps a produce; same-segment
        # producers in other processes serialize on the segment flock.
        with self._segment_lock(space, segment), _flock(
            self._store_lock_path, exclusive=False
        ), _flock(self._seg_flock_path(space, segment), exclusive=True):
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

        # -- append, then verify the tail actually reads back contiguous.
        # The segment flock already excludes same-segment writers that
        # honor the lock protocol; this check catches everything else —
        # a stale status row after a crash, or a foreign writer bypassing
        # the locks — and rolls the just-renamed files back so the
        # violation is surfaced as an error, not silent duplicate
        # sequences (I1/I2 stay invariant for either racer).  The scan is
        # bounded: `sequence > last_seq` prunes every file whose max
        # sequence stat is below the new tail.
        appended = self._append_files(stamped)
        tail = (
            self.events()
            .filter(
                (F.col("space") == space)
                & (F.col("segment") == segment)
                & (F.col("sequence") > last_seq)
            )
            .agg(
                F.count("*").alias("cnt"),
                F.count_distinct("sequence").alias("dst"),
                F.max("sequence").alias("mx"),
            )
            .first()
        )
        if tail["cnt"] != n or tail["dst"] != n or tail["mx"] != int(stats["max_seq"]):
            for path in appended:
                with contextlib.suppress(FileNotFoundError):
                    os.remove(path)
            self._repair_status(space, segment)
            cur_seq, _ = self._last_state(space, segment)
            raise SequenceMismatchError(space, segment, cur_seq + 1, stats["min_seq"])

        # -- merge the status this produce just created (no events scan)
        prior = None if last_seq == 0 else self.last_status(space, segment)
        if last_seq > 0 and prior is None:
            # legacy store without a status table: one-time bootstrap
            self._repair_status(space, segment)
        else:
            self._write_status_row(
                space,
                segment,
                first_sequence=prior["first_sequence"] if prior else base,
                first_ts=prior["first_ts"] if prior else ts,
                last_sequence=int(stats["max_seq"]),
                last_ts=ts,
                last_trx_number=last_trx + n_chunks,
            )

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

    def file_stats(self, small_file_bytes: int = 32 * 1024 * 1024) -> list[dict]:
        """Per-space physical-layout report — the signal that schedules
        :meth:`compact`: one dict per space with n_files, total_bytes,
        avg_bytes, n_small (files under ``small_file_bytes``), and
        ``needs_compaction`` (more than one file and a majority small).

        Driver-side directory walk: cost is proportional to the FILE
        COUNT (the very thing being measured), no data is read.  Takes
        the store flock SHARED (compatible with producers, excludes
        compact's directory swap); individual files that a concurrent
        produce rollback removes mid-walk are skipped, not crashed on.
        Space names are unquoted from the partition-dir encoding (the
        ``_part_dir`` round trip).  At the 256 MB-target layout of
        docs/SCALE.md, a healthy space reports n_small ≈ 0; a
        streaming-append space drifts upward until the scheduled
        compact."""
        root = self.events_path
        out = []
        if not os.path.isdir(root):
            return out
        with _flock(self._store_lock_path, exclusive=False):
            for entry in sorted(os.listdir(root)):
                spath = os.path.join(root, entry)
                if not (os.path.isdir(spath) and "=" in entry):
                    continue
                sizes = []
                for p in _parquet_paths(spath):
                    try:
                        sizes.append(os.path.getsize(p))
                    except OSError:
                        continue  # rolled back / renamed between walk+stat
                n, total = len(sizes), sum(sizes)
                small = sum(1 for s in sizes if s < small_file_bytes)
                out.append(
                    {
                        "space": urllib.parse.unquote(entry.split("=", 1)[1]),
                        "n_files": n,
                        "total_bytes": total,
                        "avg_bytes": total // n if n else 0,
                        "n_small": small,
                        "needs_compaction": n > 1 and small * 2 > n,
                    }
                )
        return out

    def compaction_plan(self, target_bytes: int = 256 * 1024 * 1024):
        """Bin-packed rewrite plan for the store's parquet files
        (functions/layout.compaction_plan grouped by space): one row per
        file with its target output bin — the finer-grained companion to
        :meth:`compact` (which rewrites whole spaces to N files); this
        plans SIZE-bounded outputs so a petabyte space compacts into
        ~target-sized files instead of one giant one.

        The file walk reuses :meth:`file_stats`' discipline (shared
        flock, skip files removed mid-walk); the plan itself is a
        metadata-scale DataFrame — nothing reads data bytes."""
        from streamkit_spark.functions.layout import compaction_plan

        rows = []
        root = self.events_path
        if os.path.isdir(root):
            with _flock(self._store_lock_path, exclusive=False):
                for entry in sorted(os.listdir(root)):
                    spath = os.path.join(root, entry)
                    if not (os.path.isdir(spath) and "=" in entry):
                        continue
                    space = urllib.parse.unquote(entry.split("=", 1)[1])
                    for p in _parquet_paths(spath):
                        try:
                            rows.append((space, p, os.path.getsize(p)))
                        except OSError:
                            continue  # rolled back mid-walk
        files = self.spark.createDataFrame(
            rows, "space string, file string, bytes long"
        )
        return compaction_plan(
            files, target_bytes, group_cols=("space",)
        )

    def compact(
        self, files_per_space: int = 1, target_bytes: int | None = None
    ) -> dict[str, int]:
        """Rewrite the events table into few large files per space, sorted
        by (segment, sequence).

        Streaming appends leave one small file per produce — the classic
        small-file problem; at scale this turns scans into metadata storms.
        Compaction restores the designed layout (space partitions, sorted
        files → parquet min/max stats prune segment scans).

        ``target_bytes`` switches to SIZE-TARGETED output: the partition
        count comes from current on-disk bytes / target, and rows are
        ``repartitionByRange``d on (space, segment, sequence) — so every
        output file covers a NON-OVERLAPPING sorted key range (hash-split
        files overlap on (segment, sequence) and defeat min/max pruning;
        range-split files don't), and a petabyte space compacts into
        ~target-sized files instead of one giant one.  File sizes track
        the target approximately (row-count-proportional ranges ×
        compression variance).

        Concurrency contract: compact takes the store flock EXCLUSIVELY
        while producers hold it shared, so no produce can rename a
        committed file into the pre-swap directory (which would then be
        deleted — acknowledged-write loss).  The snapshot is read and
        rewritten *inside* the lock.  Readers take no lock: between the
        two renames of the swap the events path briefly does not exist and
        a concurrent reader sees an empty table for that instant — a
        documented read race, never a write loss.  As defense-in-depth
        against writers that bypassed the flock, any parquet file that
        landed in the old directory after the snapshot is moved into the
        new layout instead of deleted.

        Returns {"files_before": n, "files_after": m}."""
        import shutil

        def count_files(root: str) -> int:
            return len(_parquet_paths(root))

        def parquet_files(root: str) -> set[str]:
            return {
                os.path.relpath(p, root) for p in _parquet_paths(root)
            }

        if not self._exists():
            return {"files_before": 0, "files_after": 0}
        with _flock(self._store_lock_path, exclusive=True):
            before = count_files(self.events_path)
            snapshot = parquet_files(self.events_path)
            staging = self.events_path + ".compacting"
            if target_bytes is not None:
                if target_bytes <= 0:
                    raise ValueError("target_bytes must be positive")
                total = sum(
                    os.path.getsize(p)
                    for p in _parquet_paths(self.events_path)
                )
                n_parts = max(1, -(-total // target_bytes))
                laid_out = self.events().repartitionByRange(
                    n_parts, "space", "segment", "sequence"
                )
            else:
                laid_out = self.events().repartition(
                    files_per_space, "space"
                )
            (
                laid_out
                .sortWithinPartitions("space", "segment", "sequence")
                .write.mode("overwrite")
                .partitionBy("space")
                .parquet(staging)
            )
            old = self.events_path + ".old"
            os.rename(self.events_path, old)
            os.rename(staging, self.events_path)
            # straggler sweep: files not in the snapshot were written after
            # the rewrite began (lock-bypassing writer) — merge, don't drop
            for rel in parquet_files(old) - snapshot:
                dest = os.path.join(self.events_path, rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                os.rename(os.path.join(old, rel), dest)
            shutil.rmtree(old)
        return {"files_before": before, "files_after": count_files(self.events_path)}

    def recover(
        self,
        verify_status: bool = False,
        spaces: list[str] | None = None,
        staging_ttl_ms: int = 0,
    ) -> dict:
        """Startup recovery sweep — the analog of the reference's WAL
        orphan recovery (azurekit/store.go:553-612: startup replay of
        orphaned transaction entities + the 5-minute background monitor).

        The parquet Store has no WAL: a produce is atomic at the file
        rename, so a crash can only leave three kinds of debris, each
        swept here under the exclusive store flock (which waits out every
        in-flight produce, so nothing live is touched):

        1. **Orphaned produce staging dirs** (``.staging-*``): a producer
           crashed before its renames — the write was never acknowledged,
           the files never entered the table; delete.  ``staging_ttl_ms``
           adds an age guard for operators who run recover with lockless
           writers around.
        2. **Interrupted compact**: crash between compact's two renames
           leaves no events dir and an ``.old`` — roll back (the rewrite
           in ``.compacting`` may be incomplete; the old layout is the
           acknowledged state).  A crash after the swap but before the
           straggler sweep leaves a complete NEW table plus ``.old``;
           the old dir is reported, not deleted — it only holds unmerged
           stragglers if a lock-bypassing writer raced the compact, and
           that call is an operator's to make.
        3. **Stale/missing status rows** (crash inside the append→status
           window) + orphaned ``.tmp-*`` status files.  With
           ``verify_status=True`` every segment tail is recomputed from
           events (one distributed agg; scope with ``spaces`` at scale)
           and mismatched rows rewritten.  Without it, stale rows also
           self-heal lazily: the next produce's post-append verification
           rolls back, repairs, and retries clean (``_produce_locked``).

        Returns a report dict of what was swept/repaired.
        """
        import shutil

        report = {
            "staging_removed": 0,
            "compact_rolled_back": False,
            "old_dir_present": False,
            "status_tmp_removed": 0,
            "status_repaired": 0,
        }
        with _flock(self._store_lock_path, exclusive=True):
            old = self.events_path + ".old"
            compacting = self.events_path + ".compacting"
            if not os.path.isdir(self.events_path) and os.path.isdir(old):
                # crash mid-swap: the old layout is the acknowledged state
                os.rename(old, self.events_path)
                report["compact_rolled_back"] = True
            if os.path.isdir(compacting):
                shutil.rmtree(compacting, ignore_errors=True)
            report["old_dir_present"] = os.path.isdir(old)

            now_ms = time.time() * 1000
            if os.path.isdir(self.root):
                for e in os.listdir(self.root):
                    if not e.startswith(".staging-"):
                        continue
                    p = os.path.join(self.root, e)
                    if now_ms - os.path.getmtime(p) * 1000 >= staging_ttl_ms:
                        shutil.rmtree(p, ignore_errors=True)
                        report["staging_removed"] += 1

            if os.path.isdir(self.status_path):
                for d, _, files in os.walk(self.status_path):
                    for f in files:
                        if f.startswith(".tmp-"):
                            with contextlib.suppress(FileNotFoundError):
                                os.remove(os.path.join(d, f))
                            report["status_tmp_removed"] += 1

            if verify_status and self._exists():
                ev = self.events()
                if spaces:
                    ev = ev.filter(F.col("space").isin(spaces))
                actual = (
                    ev.groupBy("space", "segment")
                    .agg(
                        F.min("sequence").alias("fs"),
                        F.min_by("ts", F.col("sequence")).alias("fts"),
                        F.max("sequence").alias("ls"),
                        F.max_by("ts", F.col("sequence")).alias("lts"),
                        F.max("trx_number").alias("lt"),
                    )
                    .collect()
                )
                for row in actual:
                    st = self.last_status(row["space"], row["segment"])
                    if (
                        st is None
                        or st["last_sequence"] != row["ls"]
                        or st["last_trx_number"] != row["lt"]
                        or st["first_sequence"] != row["fs"]
                    ):
                        self._write_status_row(
                            row["space"],
                            row["segment"],
                            row["fs"],
                            row["fts"],
                            row["ls"],
                            row["lts"],
                            row["lt"],
                        )
                        report["status_repaired"] += 1
        return report

    # ---------------------------------------------------------- helpers

    def _append_files(self, stamped: DataFrame) -> list[str]:
        """Concurrent-safe append: write to a produce-private staging dir,
        then move the parquet files into the table with unique names.
        Returns the destination paths (so a failed post-append verification
        can roll this exact write back).

        The default Hadoop committer stages every concurrent write of one
        table under the SAME ``_temporary/0`` directory — parallel
        producers corrupt each other's staging (observed under the
        high-volume test).  A private staging dir + per-file rename gives
        lock-free cross-segment write parallelism — the reference's model
        (per-segment serialization only, docs/production.md:85-91)."""
        import shutil

        staging = os.path.join(self.root, f".staging-{uuid.uuid4()}")
        moved: list[str] = []
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
                        dest = os.path.join(dest_dir, f"{uuid.uuid4()}.parquet")
                        os.rename(os.path.join(src_dir, f), dest)
                        moved.append(dest)
            return moved
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
