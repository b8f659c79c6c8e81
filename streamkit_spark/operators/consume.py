"""Read surface: ConsumeSegment / ConsumeSpace / Consume / Peek (SURVEY §2.1).

Semantics are exact parity with the reference:

* sequence bounds are **inclusive** on both ends; ``max_sequence==0`` means
  unbounded; ``max < min`` clamps to ``min``
  (/root/reference/pkg/storage/pebblekit/store.go:431-460).
* timestamp bounds are **exclusive min, inclusive max**
  (pebblekit/store.go:194,486-487); ``max_ts==0`` or future clamps to "now"
  when a now is supplied (store.go:167-181 — "Issue #19 align with Azure").
* segment scans are ordered by ``sequence``; space scans by
  ``(ts, segment, sequence)`` — the space-index key layout
  (pkg/api/messages.go:112-115); multi-space merges add ``space`` to the
  tiebreak for determinism (a strengthening of the reference contract, which
  documents tie non-determinism — messages.go:126-129).
* cursors resume **strictly after** a ``(ts, segment, sequence)`` position
  (docs/concepts.md:73-81).
* limits clamp to 10,000,000 (pkg/server/node.go:100).

Everything is a declarative DataFrame build: Catalyst pushes the
space/segment equality and the sequence/ts ranges into the parquet scan
(PushedFilters + partition pruning when the table is partitioned by space),
and the final ORDER BY is a range-partitioned sort only when the caller
actually needs global order — at 100 TB the common pattern is
``sortWithinPartitions`` after repartitioning by segment, which this module
exposes via ``ordered=False``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streamkit_spark.schema import (
    MAX_CONSUME_ENTRIES,
    MAX_SEQUENCE,
    EventsBinding,
    ts_ms_col,
)


@dataclass(frozen=True)
class ConsumeBounds:
    """Normalized scan bounds (F3 in SURVEY §2.2)."""

    min_sequence: int = 0
    max_sequence: int = 0  # 0 = unbounded
    min_ts: int = 0  # exclusive, epoch ms
    max_ts: int = 0  # inclusive, epoch ms; 0 = unbounded/now
    limit: int = 0  # 0 = unlimited (clamped server-side)

    def normalized(self, now_ms: int | None = None) -> "ConsumeBounds":
        """Apply the reference's bound normalization rules."""
        min_seq = max(self.min_sequence, 0)
        max_seq = self.max_sequence
        if max_seq == 0:
            max_seq = MAX_SEQUENCE
        if max_seq < min_seq:
            max_seq = min_seq  # pebblekit/store.go:455-457
        min_ts = self.min_ts
        max_ts = self.max_ts
        if now_ms is not None:
            # future/zero max clamps to now; future min clamps to now
            if max_ts == 0 or max_ts > now_ms:
                max_ts = now_ms
            if min_ts > now_ms:
                min_ts = now_ms
        elif max_ts == 0:
            max_ts = MAX_SEQUENCE  # unbounded when no wall clock in play
        limit = self.limit
        if limit <= 0 or limit > MAX_CONSUME_ENTRIES:
            limit = MAX_CONSUME_ENTRIES
        return ConsumeBounds(min_seq, max_seq, min_ts, max_ts, limit)


def _bounds_predicate(binding: EventsBinding, b: ConsumeBounds) -> Column:
    seq = F.col(binding.sequence)
    ts = ts_ms_col(binding)
    pred = F.lit(True)
    if b.min_sequence > 0:
        pred = pred & (seq >= F.lit(b.min_sequence))
    if b.max_sequence < MAX_SEQUENCE:
        pred = pred & (seq <= F.lit(b.max_sequence))
    if b.min_ts > 0:
        pred = pred & (ts > F.lit(b.min_ts))  # exclusive min
    if b.max_ts < MAX_SEQUENCE:
        pred = pred & (ts <= F.lit(b.max_ts))  # inclusive max
    return pred


def consume_segment(
    df: DataFrame,
    space: str,
    segment: str,
    bounds: ConsumeBounds = ConsumeBounds(),
    binding: EventsBinding = EventsBinding(),
    now_ms: int | None = None,
    ordered: bool = True,
) -> DataFrame:
    """S1 — bounded scan of one segment in strict sequence order.

    Reference: pebblekit/store.go:431-488, api/messages.go:159-169.
    """
    b = bounds.normalized(now_ms)
    out = df.filter(
        (F.col(binding.space) == F.lit(space))
        & (F.col(binding.segment).cast("string") == F.lit(str(segment)))
        & _bounds_predicate(binding, b)
    )
    if ordered:
        out = out.orderBy(binding.sequence)
    if b.limit < MAX_CONSUME_ENTRIES or bounds.limit > 0:
        out = out.limit(b.limit)
    return out


SpaceCursor = tuple[int, str, int]  # (ts_ms, segment, sequence) — strictly-after


def _cursor_predicate(binding: EventsBinding, cursor: SpaceCursor) -> Column:
    """Strictly-after tuple predicate — the lex-key cursor of the space index
    (Entry.GetSpaceOffset, api/messages.go:112-115) translated to a row
    comparison Catalyst can push partially into the scan (ts >= c_ts)."""
    c_ts, c_seg, c_seq = cursor
    ts = ts_ms_col(binding)
    seg = F.col(binding.segment).cast("string")
    seq = F.col(binding.sequence)
    return (
        (ts > F.lit(c_ts))
        | ((ts == F.lit(c_ts)) & (seg > F.lit(str(c_seg))))
        | ((ts == F.lit(c_ts)) & (seg == F.lit(str(c_seg))) & (seq > F.lit(c_seq)))
    )


def consume_space(
    df: DataFrame,
    space: str,
    bounds: ConsumeBounds = ConsumeBounds(),
    cursor: SpaceCursor | None = None,
    binding: EventsBinding = EventsBinding(),
    now_ms: int | None = None,
    ordered: bool = True,
) -> DataFrame:
    """S2 — scan all segments of a space merged by timestamp.

    Order contract ``(ts, segment, sequence)`` mirrors the space-index key
    layout (SURVEY §1.3).  Reference: pebblekit/store.go:159-196.
    """
    b = bounds.normalized(now_ms)
    out = df.filter(
        (F.col(binding.space) == F.lit(space)) & _bounds_predicate(binding, b)
    )
    if cursor is not None:
        out = out.filter(_cursor_predicate(binding, cursor))
    if ordered:
        out = out.orderBy(
            ts_ms_col(binding).alias("__ts_ms"),
            F.col(binding.segment).cast("string"),
            F.col(binding.sequence),
        )
    if b.limit < MAX_CONSUME_ENTRIES or bounds.limit > 0:
        out = out.limit(b.limit)
    return out


def consume(
    df: DataFrame,
    offsets: dict[str, SpaceCursor | None],
    bounds: ConsumeBounds = ConsumeBounds(),
    binding: EventsBinding = EventsBinding(),
    now_ms: int | None = None,
    ordered: bool = True,
) -> DataFrame:
    """S3 — multi-space timestamp-merge (k-way interleave).

    The reference opens one ConsumeSpace per offsets entry and interleaves by
    Timestamp (pkg/server/node.go:546-563).  Declaratively that is a single
    scan with an OR of per-space cursor predicates + a global timestamp sort:
    one parquet pass, no per-space union (which would re-scan the table k
    times), and the deterministic tiebreak (ts, space, segment, sequence).
    """
    b = bounds.normalized(now_ms)
    spaces = sorted(offsets.keys())
    per_space = None
    for sp in spaces:
        p = F.col(binding.space) == F.lit(sp)
        cur = offsets[sp]
        if cur is not None:
            p = p & _cursor_predicate(binding, cur)
        per_space = p if per_space is None else (per_space | p)
    out = df.filter(per_space & _bounds_predicate(binding, b))
    if ordered:
        out = out.orderBy(
            ts_ms_col(binding).alias("__ts_ms"),
            F.col(binding.space),
            F.col(binding.segment).cast("string"),
            F.col(binding.sequence),
        )
    if b.limit < MAX_CONSUME_ENTRIES or bounds.limit > 0:
        out = out.limit(b.limit)
    return out


def peek(
    df: DataFrame,
    space: str,
    segment: str,
    binding: EventsBinding = EventsBinding(),
    max_ts: int | None = None,
) -> DataFrame:
    """S4 — latest entry of one segment (empty → zero rows; the reference's
    zero-sequence sentinel is an API-layer concern).  ``max_ts`` applies the
    watermark visibility clamp (pkg/server/node.go:259-298).

    Catalyst plan: filter → TakeOrderedAndProject(desc sequence, limit 1) —
    the distributed analog of the reference's reverse seek
    (pebblekit/store.go:137 SeekLT)."""
    out = df.filter(
        (F.col(binding.space) == F.lit(space))
        & (F.col(binding.segment).cast("string") == F.lit(str(segment)))
    )
    if max_ts is not None:
        out = out.filter(ts_ms_col(binding) <= F.lit(max_ts))
    return out.orderBy(F.col(binding.sequence).desc()).limit(1)


def peek_all(
    df: DataFrame,
    binding: EventsBinding = EventsBinding(),
    space: str | None = None,
) -> DataFrame:
    """Top-1 per (space, segment) for every segment at once (W1).

    Uses max_by over a single shuffle-free partial-aggregable groupBy rather
    than a window (a window would sort every partition; max_by is a partial
    aggregate that combines map-side — the right plan at 100 TB)."""
    out = df
    if space is not None:
        out = out.filter(F.col(binding.space) == F.lit(space))
    row = F.struct(*[F.col(c) for c in df.columns])
    return (
        out.groupBy(
            F.col(binding.space).alias("space"),
            F.col(binding.segment).cast("string").alias("segment"),
        )
        .agg(F.max_by(row, F.col(binding.sequence)).alias("entry"))
        .select("space", "segment", "entry.*")
    )


def consume_space_pages(
    df: DataFrame,
    space: str,
    page_size: int,
    binding: EventsBinding = EventsBinding(),
    bounds: ConsumeBounds = ConsumeBounds(),
    max_pages: int = 1_000_000,
):
    """T6 — client-side cursor pagination: yields lists of Rows, resuming
    each page strictly after the last row of the previous one (the batch
    analog of the reference's lex-key offsets, docs/concepts.md:73-81).

    Each page is an independent bounded query — between pages nothing is
    cached or held; a crashed client resumes from its last persisted
    cursor exactly like a reference consumer."""
    cursor: SpaceCursor | None = None
    ts_name = "__cursor_ts"
    for _ in range(max_pages):
        page_bounds = ConsumeBounds(
            bounds.min_sequence, bounds.max_sequence,
            bounds.min_ts, bounds.max_ts, page_size,
        )
        page_df = consume_space(df, space, page_bounds, cursor, binding)
        rows = page_df.withColumn(ts_name, ts_ms_col(binding)).collect()
        if not rows:
            return
        yield [r for r in rows]
        last = rows[-1]
        cursor = (
            last[ts_name],
            str(last[binding.segment]),
            last[binding.sequence],
        )
        if len(rows) < page_size:
            return
