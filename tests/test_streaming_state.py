"""Watermark late-data semantics and custom stateful streaming
operators (SURVEY §2.9: withWatermark / mapGroupsWithState provisions).
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from quebic_spark import INTEGER, Queue, REAL, Schema
from quebic_spark.streaming import read_queue_stream


@pytest.fixture
def qpath(tmp_path):
    return str(tmp_path / "q")


def test_watermark_windowed_append_mode(qpath, spark):
    """Windowed agg with a watermark in append mode: only windows the
    watermark has passed are emitted — late-data discipline for the
    100 TB streaming story."""
    q = Queue(qpath, Schema(INTEGER, REAL), capacity=10000)
    base = 1_700_002_800_000  # hour-aligned epoch ms
    # 3 hours of minute events; the final event advances the watermark
    # past the first two hour-windows
    items = [[base + i * 60_000, float(i)] for i in range(180)]
    q.publisher().push_all(items)

    events = read_queue_stream(spark, q).select(
        F.timestamp_millis(F.col("c0")).alias("ts"),
        F.col("c1").alias("v"),
    )
    agg = (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out: list[tuple] = []
    query = (
        agg.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, _: out.extend(
                (r["w"]["start"], r["n"]) for r in df.collect()
            )
        )
        .option("checkpointLocation", os.path.join(qpath, "wm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    # watermark = max(ts) - 30m = 02:29 -> windows [00:00) and [01:00)
    # are final and emitted; [02:00) is still open in append mode
    assert sorted(n for _, n in out) == [60, 60]
    q.dispose()


def test_apply_in_pandas_with_state(qpath, spark):
    """Custom stateful operator: running per-user event count via
    applyInPandasWithState over a queue stream (the §2.10 custom
    stateful path when built-in windows don't fit)."""
    q = Queue(qpath, Schema(INTEGER, INTEGER), capacity=10000)
    # (user_id, value): 3 users x 10 events
    q.publisher().push_all(
        [[u, i] for i in range(10) for u in (1, 2, 3)]
    )

    events = read_queue_stream(spark, q).select(
        F.col("c0").alias("user_id"), F.col("c1").alias("v")
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("running_count", T.LongType()),
            T.StructField("running_sum", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("count", T.LongType()),
            T.StructField("sum", T.LongType()),
        ]
    )

    def track(key, pdfs, state: GroupState):
        count, total = (
            state.get if state.exists else (0, 0)
        )
        for pdf in pdfs:
            count += len(pdf)
            total += int(pdf["v"].sum())
        state.update((count, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "running_count": [count],
                "running_sum": [total],
            }
        )

    result = events.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out: list[tuple] = []
    query = (
        result.writeStream.outputMode("update")
        .foreachBatch(
            lambda df, _: out.extend(
                (r["user_id"], r["running_count"], r["running_sum"])
                for r in df.collect()
            )
        )
        .option("checkpointLocation", os.path.join(qpath, "state_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    final = {u: (c, s) for u, c, s in out}
    assert final == {1: (10, 45), 2: (10, 45), 3: (10, 45)}
    q.dispose()
