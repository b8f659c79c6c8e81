"""Skew-aware join utilities.

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled`` is on in the engine session);
``salted_join`` is the explicit fallback for pathological producers —
e.g. one hot space/segment receiving 100× the median traffic — where you
want the split *planned*, not discovered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key salt trick: the big side scatters each
    row into one of ``n_salt`` sub-keys; the small side replicates every
    row to all salts.  The shuffle then spreads a hot key over n_salt
    reducers.  Result is row-identical to ``big.join(small, on, how)``.

    Salt = ``xxhash64(row content, spark_partition_id)``.  The partition
    id term is what scatters EXACT-DUPLICATE hot rows (the dedup/count
    skew shape — a pure content hash piles them all on one sub-key):
    duplicates in different input partitions take different salts, so
    sub-key load balances once partitions ≫ n_salt.  Unlike
    ``rand()``/``monotonically_increasing_id()`` salts this stays
    RETRY-STABLE — a recomputed map task has the same partition index
    and the same rows, so rows re-salt identically and a fetch-failure
    retry cannot silently lose or duplicate join rows (the classic
    nondeterministic-shuffle-key hazard).

    ``how`` supports ``inner`` and ``left`` (the skewed side must be
    the probe side; a salted right-outer would duplicate unmatched
    small-side rows across salts)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns], F.spark_partition_id()),
        F.lit(n_salt),
    ).cast("int")
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = b.join(s, keys + ["__salt"], how)
    return out.drop("__salt")
