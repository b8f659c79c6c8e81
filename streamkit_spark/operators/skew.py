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
    on: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key salt trick: the big side scatters each
    row into one of ``n_salt`` sub-keys (deterministic hash of the whole
    row — reproducible, no rand()); the small side replicates every row to
    all salts.  The shuffle then spreads a hot key over n_salt reducers.

    Result is row-identical to ``big.join(small, on, how)``.
    """
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt)
    ).alias("__salt")
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = b.join(s, [on, "__salt"], how)
    return out.drop("__salt")
