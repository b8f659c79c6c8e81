"""Shared plan-shaping helpers for the functions package."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Row limit under which an id-list (one long per row) is safely
#: broadcastable: ~4M longs ≈ 32 MB serialized, well inside executor
#: memory at default overheads while far above any realistic near-dup
#: cluster table at test scale.
BROADCAST_ROW_LIMIT = 4_000_000


def maybe_broadcast(df: DataFrame, limit: int | None = None) -> DataFrame:
    """Broadcast-hint ``df`` only when it is verifiably small.

    An unconditional ``F.broadcast`` on a table whose size is bounded only
    by corpus properties (duplicate rate, contamination rate, candidate
    count) is a latent OOM at 100 TB: web-scale corpora run 20-50%
    duplicates, so "the losers table" can be billions of ids.  Two safe
    modes:

    * ``limit=None`` — return ``df`` un-hinted.  AQE (on by default since
      Spark 3.2) converts the shuffle join to a broadcast join at runtime
      from the MEASURED size of the built side, so the normal small case
      still broadcasts while the pathological case degrades to a shuffle
      join instead of failing.  Use this when ``df``'s pipeline is too
      expensive to execute twice (e.g. LSH candidate generation).
    * ``limit=N`` — run a bounded count probe (``df.limit(N+1).count()``)
      and hint only when the count is ≤ N.  The probe re-executes the
      plan, so pass a limit ONLY for cheap or already-materialized inputs
      (checkpointed cluster tables, driver-built DataFrames, dimension
      reads).
    """
    if limit is None:
        return df
    if df.limit(limit + 1).count() <= limit:
        return F.broadcast(df)
    return df


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Skew-safe equi-join for a hot-keyed ``left`` against a small-ish
    ``right``: scatter each left key across ``salt`` sub-keys and
    replicate the right side ``salt``× so every sub-key still finds its
    match.  Result rows are identical to ``left.join(right, on, how)``.

    The salt hashes the PHYSICAL row id (``monotonically_increasing_id``),
    not the row content — exact-duplicate hot rows (the common dedup/
    count skew shape) must still scatter, and a content hash would pile
    them all on one sub-key.  The salt is therefore not reproducible
    across runs, but the join RESULT is salt-invariant (every left row
    matches the same replicated right rows whatever its salt), so the
    nondeterminism never reaches the output — including under task
    retries.

    When to reach for it: AQE's skew-join split rescues SORT-MERGE joins
    at runtime, but it cannot split a skewed key inside a single
    shuffle-hash partition feeding an aggregation, and it does nothing
    for engines/paths where AQE is off.  Salting fixes the skew in the
    PLAN: the hot key's rows land on ``salt`` different reducers by
    construction.  Cost: the right side is materialized ``salt``× —
    only use when ``right`` is broadcast-small.

    ``how`` supports ``inner`` and ``left`` (the skewed side must be the
    probe side; a salted right-outer would duplicate unmatched right
    rows across salts)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    keys = [on] if isinstance(on, str) else list(on)
    lsalt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    l = left.withColumn("__salt", lsalt.cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return l.join(r, keys + ["__salt"], how).drop("__salt")
