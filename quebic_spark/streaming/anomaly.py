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

    The batch operator sums window moments on DECIMAL(18,2); raw float
    sums here would disagree on zero-variance baselines (a constant
    0.1 baseline leaves a ~1e-17 float residual, so var lands
    tiny-positive where the decimal path gets an exact 0 — opposite
    anomaly verdicts; review catch, reproduced). Mirror the batch
    exactly: quantize to 2 decimals HALF_UP (Spark's decimal-cast
    rounding), sum s and q as exact Decimals, convert to double only
    at the same points the batch plan casts, then run the identical
    double expression."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    cent = Decimal("0.01")
    # DECIMAL(18,2) ceiling: 16 integer digits. Batch parity for
    # finite out-of-range values is a LOUD failure — empirically
    # probed this session: under the session's ANSI default,
    # CAST(1e16 AS DECIMAL(18,2)) raises NUMERIC_VALUE_OUT_OF_RANGE
    # (kills the batch job), while NaN AND Infinity cast to NULL.
    # Previously the stream silently folded huge finite values into
    # the moments (opposite verdicts vs a batch that would have
    # failed loud) and DIED with decimal.InvalidOperation on
    # Infinity where batch yields NULL (r16 review).
    dec_max = Decimal("9999999999999999.99")
    out = []
    # NaN/Inf baseline entries (buf holds None): the batch plan's
    # CAST AS DECIMAL is NULL for both — excluded from SUM but
    # counted by COUNT(1) — so mirror exactly: n counts them, the
    # moments skip them. Previously Decimal('NaN') poisoned the sums
    # and max(0.0, nan) silently zeroed the variance, suppressing ALL
    # anomalies for the next `window` events (r13 review, reproduced).
    # The moments are folded ONCE from the carried baseline and
    # updated incrementally per event (r16 review: a fresh
    # O(window) exact-decimal re-sum per event made a micro-batch
    # cost O(n*window); Decimal arithmetic is exact, so
    # add-on-append / subtract-on-evict is bit-identical)
    s_dec = sum((x for x in buf if x is not None), Decimal(0))
    q_dec = sum((x * x for x in buf if x is not None), Decimal(0))
    for v in values:
        n = len(buf)
        z = None
        if n >= min_n:
            s, q, nn = float(s_dec), float(q_dec), float(n)
            if nn < 2:
                # batch parity for min_n < 2 (r14 review): Spark's
                # (q - s*s/nn)/(nn-1) at nn==1 is a NULL divide and
                # greatest(0.0, NULL) skips the NULL -> var 0, z NULL,
                # is_anomaly False; Python's / raised
                # ZeroDivisionError and killed the whole query
                var = 0.0
            else:
                var = max(0.0, (q - s * s / nn) / (nn - 1))
            if var > 0:
                z = (v - s / nn) / var ** 0.5
        # Spark orders NaN above every double, so the batch plan's
        # abs(z) >= threshold is TRUE for a NaN value's z — Python's
        # NaN comparison is False, hence the explicit isnan branch
        out.append((
            n,
            z,
            bool(
                z is not None
                and (math.isnan(z) or abs(z) >= z_threshold)
            ),
        ))
        # repr(v), not v: Spark's cast rounds the double's SHORTEST
        # decimal form (BigDecimal.valueOf/Double.toString), so for
        # 0.285 (binary ≈0.28499999…) the cast yields 0.29 while
        # quantizing the exact binary value yields 0.28 — quantize the
        # shortest repr to match the batch plan bit-for-bit (r7 review
        # catch)
        if math.isnan(v) or math.isinf(v):
            nv = None  # batch: CAST(NaN/Inf AS DECIMAL) is NULL
        else:
            nv = Decimal(repr(v)).quantize(
                cent, rounding=ROUND_HALF_UP
            )
            if abs(nv) > dec_max:
                raise ValueError(
                    f"value {v!r} cannot be represented as "
                    f"DECIMAL(18,2) — batch parity with the ANSI "
                    f"NUMERIC_VALUE_OUT_OF_RANGE cast failure"
                )
            s_dec += nv
            q_dec += nv * nv
        buf.append(nv)
        while len(buf) > window:
            evicted = buf.pop(0)
            if evicted is not None:
                s_dec -= evicted
                q_dec -= evicted * evicted
    return out


def anomaly_stream(
    stream: DataFrame,
    window: int = ANOMALY_WINDOW,
    min_n: int = ANOMALY_MIN_N,
    z_threshold: float = ANOMALY_Z,
    ts_col: str = "ts",
    idle_timeout_ms: int | None = 30 * 24 * 3600 * 1000,
) -> DataFrame:
    """Stateful per-user anomaly scoring over a streaming frame with
    (event_id, user_id, ts, value) columns. Emits one scored row per
    input event (update mode).

    State is bounded in BOTH dimensions: O(window) doubles per key,
    and keys idle for ``idle_timeout_ms`` (processing time, default
    30 days) are EVICTED
    — without eviction the state store grows with every distinct key
    ever seen and an unbounded feed eventually stalls on state alone
    (r13 review). An evicted user simply rebuilds its baseline on its
    next event (min_n gating applies again, exactly like a first-seen
    user). Pass ``idle_timeout_ms=None`` to keep keys forever.

    NaN and Infinity values mirror the batch plan exactly (r13
    review + r16 probe, both reproduced against the batch operator):
    either is counted in the baseline n but excluded from the
    moments (CAST AS DECIMAL yields NULL for both under ANSI), and
    such a value's own z flags is_anomaly=True (Spark orders NaN
    above all doubles; ±Inf has infinite |z|). Finite values too
    large for DECIMAL(18,2) fail LOUD — the same verdict the batch
    job's ANSI cast reaches via NUMERIC_VALUE_OUT_OF_RANGE — rather
    than silently skewing the baseline. One representational caveat:
    the batch emits z=NaN for a NaN row, while the Arrow/pandas
    boundary here surfaces it as NULL — is_anomaly carries the
    verdict identically on both paths."""
    evict = idle_timeout_ms is not None

    def score(key, pdfs, state: GroupState):
        import math
        from decimal import ROUND_HALF_UP, Decimal

        if evict and state.hasTimedOut:
            # idle-key eviction: drop the baseline, emit nothing
            state.remove()
            return
        # state rides as array<double>; re-quantizing on load recovers
        # the exact cents (every 2-decimal value round-trips through
        # its nearest double). NaN entries persist as NaN doubles and
        # reload as the None marker (batch-parity NULLs).
        cent = Decimal("0.01")
        buf = (
            [None if (math.isnan(x) or math.isinf(x))
             else Decimal(repr(x)).quantize(cent, rounding=ROUND_HALF_UP)
             for x in state.get[0]]
            if state.exists else []
        )

        def _save():
            state.update((
                [float("nan") if x is None else float(x) for x in buf],
            ))
            if evict:
                state.setTimeoutDuration(idle_timeout_ms)

        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            _save()
            return
        batch = pd.concat(frames).sort_values([ts_col, "event_id"])
        scored = _score_series(
            batch["value"].tolist(), buf, window, min_n, z_threshold
        )
        _save()
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
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if evict else GroupStateTimeout.NoTimeout
        ),
    )
