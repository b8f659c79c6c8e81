"""Streaming anomaly detection — per-key EWMA baseline with robust
z-score flagging.

The batch-side Tukey report (functions/analytics.iqr_outliers) needs the
full distribution; a stream needs a constantly-current baseline in O(1)
state.  Classic EWMA control chart: per key keep an exponentially
weighted mean and variance; a point ``z_threshold`` deviations out is
emitted as an anomaly and EXCLUDED from the baseline update (otherwise a
level shift would teach the detector to accept its own outliers).

State per key is three numbers — mean, variance, count — regardless of
stream length; each micro-batch is one ordered pass over its key's rows
(``applyInPandasWithState``).  The first ``min_obs`` observations only
warm the baseline (no flags): variance from two points is noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ewma_anomalies_stream", "subscribe_anomalies", "ewma_step"]


def ewma_step(
    mean: float, var: float, n: int, x: float, alpha: float
) -> tuple[float, float, int]:
    """One EWMA baseline update (pure kernel, unit-testable): standard
    exponentially weighted moments (Roberts' EWMA control chart)."""
    if n == 0:
        return x, 0.0, 1
    d = x - mean
    mean = mean + alpha * d
    var = (1.0 - alpha) * (var + alpha * d * d)
    return mean, var, n + 1


def ewma_anomalies_stream(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    alpha: float = 0.1,
    z_threshold: float = 4.0,
    min_obs: int = 10,
) -> DataFrame:
    """Update stream of anomalies: (key, ts, value, z) for points at
    least ``z_threshold`` EWMA standard deviations from the key's
    running baseline."""
    import pandas as pd  # noqa: PLC0415

    out_cols = [key_col, "ts", "value", "z"]
    out_schema = f"{key_col} string, ts long, value double, z double"
    state_schema = "mean double, var double, n long"

    def update(key, pdfs, state):
        mean, var, n = state.get if state.exists else (0.0, 0.0, 0)
        rows = []
        # a group larger than arrow maxRecordsPerBatch arrives as SEVERAL
        # chunks in arbitrary shuffle order — concatenate and sort ONCE;
        # sorting per chunk would run the EWMA out of time order and
        # corrupt the baseline exactly when the stream is busiest
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        if chunks:
            # secondary key: ts ties arrive in arbitrary chunk order; after
            # (ts, value) any remaining ties are byte-identical rows, so the
            # EWMA trajectory is deterministic regardless of arrival order
            whole = pd.concat(chunks).sort_values(["ts", "value"])
            for ts, x in zip(whole["ts"], whole["value"]):
                x = float(x)
                if n >= min_obs and var > 0:
                    z = (x - mean) / (var**0.5)
                    if abs(z) >= z_threshold:
                        rows.append(
                            {key_col: key[0], "ts": int(ts), "value": x,
                             "z": float(z)}
                        )
                        continue  # outliers never join the baseline
                mean, var, n = ewma_step(mean, var, n, x, alpha)
        state.update((float(mean), float(var), int(n)))
        yield pd.DataFrame(rows, columns=out_cols)

    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: PLC0415

    return (
        events.select(
            F.col(key_col).cast("string"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).alias("value"),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def subscribe_anomalies(
    events: DataFrame,
    sink_name: str,
    **kwargs,
):
    """Attach the anomaly stream to an in-memory update sink."""
    anom = ewma_anomalies_stream(events, **kwargs)
    return (
        anom.writeStream.queryName(sink_name)
        .format("memory")
        .outputMode("update")
        .start()
    )
