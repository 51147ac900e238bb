"""Streaming moving-baseline anomaly scoring — the stateful-stream
mirror of ``operators/temporal.py:anomaly_scores``.

Batch scores a bounded trailing ROWS frame per user; the streaming
contract is identical — each event is z-scored against that user's
previous ``window`` values — but the frame lives in managed state
(``applyInPandasWithState``), so an unbounded feed carries O(window)
doubles per active key, never history. Arrival order inside a
micro-batch is normalized by (ts, id) exactly like the batch orderBy;
cross-batch order is the source's delivery order (the queue relay is
FIFO per §2.7, so batch and stream agree on the same feed — asserted
in tests/test_streaming_state.py by scoring one series both ways).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from quebic_spark.operators.temporal import (
    ANOMALY_MIN_N,
    ANOMALY_WINDOW,
    ANOMALY_Z,
)

_OUT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("baseline_n", T.LongType()),
    T.StructField("z", T.DoubleType()),
    T.StructField("is_anomaly", T.BooleanType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("values", T.ArrayType(T.DoubleType())),
])


def _score_series(values, buf, window, min_n, z_threshold):
    """Score each value against the running buffer; mutates ``buf``.
    Pure driver-free arithmetic shared by every task."""
    out = []
    for v in values:
        n = len(buf)
        z = None
        if n >= min_n:
            s = sum(buf)
            q = sum(x * x for x in buf)
            var = max(0.0, (q - s * s / n) / (n - 1))
            if var > 0:
                z = (v - s / n) / var ** 0.5
        out.append((n, z, bool(z is not None and abs(z) >= z_threshold)))
        buf.append(v)
        del buf[:-window]
    return out


def anomaly_stream(
    stream: DataFrame,
    window: int = ANOMALY_WINDOW,
    min_n: int = ANOMALY_MIN_N,
    z_threshold: float = ANOMALY_Z,
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful per-user anomaly scoring over a streaming frame with
    (event_id, user_id, ts, value) columns. Emits one scored row per
    input event (update mode)."""

    def score(key, pdfs, state: GroupState):
        buf = list(state.get[0]) if state.exists else []
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            state.update((buf,))
            return
        batch = pd.concat(frames).sort_values([ts_col, "event_id"])
        scored = _score_series(
            batch["value"].tolist(), buf, window, min_n, z_threshold
        )
        state.update((buf,))
        yield pd.DataFrame({
            "event_id": batch["event_id"].to_numpy(),
            "user_id": key[0],
            "value": batch["value"].to_numpy(),
            "baseline_n": [n for n, _, _ in scored],
            "z": [z for _, z, _ in scored],
            "is_anomaly": [a for _, _, a in scored],
        })

    return stream.groupBy("user_id").applyInPandasWithState(
        score,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
