"""Watermark late-data semantics and custom stateful streaming
operators (SURVEY §2.9: withWatermark / mapGroupsWithState provisions).
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from quebic_spark import INTEGER, Queue, REAL, Schema, TEXT
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


def test_streaming_anomaly_matches_batch_and_survives_restart(qpath, spark):
    """The streaming anomaly scorer (state = O(window) ring buffer per
    user) must reproduce the batch operator's scores on the same feed,
    INCLUDING across a query restart — the buffer lives in checkpointed
    state, not process memory."""
    from quebic_spark.operators.temporal import anomaly_scores
    from quebic_spark.streaming.anomaly import anomaly_stream

    vals_u1 = [10.0, 12.0, 11.0, 13.0, 9.0, 11.5, 50.0, 11.0, 10.5]
    vals_u2 = [5.0] * 9
    rows = []
    for i, (a, b) in enumerate(zip(vals_u1, vals_u2)):
        rows.append([2 * i, 1, i, a])
        rows.append([2 * i + 1, 2, i, b])

    q = Queue(qpath, Schema(INTEGER, INTEGER, INTEGER, REAL),
              capacity=10000)
    split = 10  # first trigger sees 10 rows, restart sees the rest
    q.publisher().push_all(rows[:split])

    out: list[dict] = []

    def run_once():
        events = read_queue_stream(spark, q).select(
            F.col("c0").alias("event_id"),
            F.col("c1").alias("user_id"),
            F.col("c2").alias("ts"),
            F.col("c3").alias("value"),
        )
        query = (
            anomaly_stream(events).writeStream.outputMode("update")
            .foreachBatch(
                lambda df, _: out.extend(
                    r.asDict() for r in df.collect()
                )
            )
            .option("checkpointLocation", os.path.join(qpath, "an_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)

    run_once()
    q.publisher().push_all(rows[split:])
    run_once()  # fresh query object, same checkpoint -> state resumes

    batch_df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    )
    expect = {
        r.event_id: r for r in anomaly_scores(batch_df).collect()
    }
    got = {r["event_id"]: r for r in out}
    assert set(got) == set(expect)
    for eid, e in expect.items():
        g = got[eid]
        assert g["baseline_n"] == e.baseline_n, eid
        assert g["is_anomaly"] == e.is_anomaly, eid
        if e.z is None:
            assert g["z"] is None, eid
        else:
            assert abs(g["z"] - e.z) < 1e-9, (eid, g["z"], e.z)
    # the spike scored anomalous through the stream, post-restart
    spike = got[12]  # event_id 12 == u1's 50.0
    assert spike["is_anomaly"] and spike["baseline_n"] == 6
    q.dispose()


def test_stream_scorer_matches_batch_on_inexact_floats(spark):
    """Regression (review catch): a constant 0.1 baseline must score
    var == 0 on BOTH paths. Raw float sums leave a ~1e-17 residual ->
    tiny-positive var -> a bogus huge z where the batch DECIMAL path
    returns NULL; the stream scorer quantizes to exact cents first."""
    from quebic_spark.operators.temporal import anomaly_scores
    from quebic_spark.streaming.anomaly import _score_series

    vals = [0.1] * 8 + [9.0, 0.3]
    rows = [(i, 1, i, v) for i, v in enumerate(vals)]
    batch_df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    )
    expect = {r.event_id: r
              for r in anomaly_scores(batch_df, min_n=3).collect()}

    buf: list = []
    got = _score_series(vals, buf, window=20, min_n=3, z_threshold=3.0)
    for i, (n, z, flag) in enumerate(got):
        e = expect[i]
        assert n == e.baseline_n, i
        assert flag == e.is_anomaly, (i, z, e.z)
        if e.z is None:
            assert z is None, (i, z)
        else:
            assert abs(z - e.z) < 1e-12, (i, z, e.z)
    # the constant-baseline row: both sides agree on the SAME tiny
    # residual z (the decimal sums still pass through double casts, so
    # the batch z is ~1e-8, not NULL — what matters is that the stream
    # path lands on the identical value instead of a ~1e9 blowup from
    # raw float sums) and neither side flags it
    assert expect[7].z is not None and abs(expect[7].z) < 1e-6
    assert abs(got[7][1] - expect[7].z) < 1e-12
    assert not expect[7].is_anomaly and not got[7][2]
    # one row later the same residual lands NEGATIVE and the
    # greatest(0, var) clamp zeroes it -> NULL z on BOTH paths (the
    # sign of the double residue is n-dependent; agreement, not a
    # particular sign, is the contract)
    assert expect[8].z is None and got[8][1] is None


def test_stream_stream_join_within_time_bound(tmp_path, spark):
    """Stream-stream inner join with watermarks on both sides and an
    event-time range condition — the Structured Streaming provision
    (SURVEY §2.9) that joins two live feeds with BOUNDED state: each
    side's buffer is evictable once the watermark passes the range.
    Verified against a Python reference over the same feed."""
    clicks_q = Queue(str(tmp_path / "clicks"),
                     Schema(INTEGER, INTEGER, INTEGER), capacity=10000)
    buys_q = Queue(str(tmp_path / "buys"),
                   Schema(INTEGER, INTEGER, INTEGER), capacity=10000)
    base = 1_700_000_000_000
    # (id, user, ts_ms): user 1 clicks at minutes 0..9, buys at 3/8/40;
    # user 2 clicks at minute 5, buys at minute 6
    clicks = [[i, 1, base + i * 60_000] for i in range(10)]
    clicks.append([100, 2, base + 5 * 60_000])
    buys = [[200, 1, base + 3 * 60_000 + 1],
            [201, 1, base + 8 * 60_000],
            [202, 1, base + 40 * 60_000],
            [203, 2, base + 6 * 60_000]]
    clicks_q.publisher().push_all(clicks)
    buys_q.publisher().push_all(buys)

    def stream_of(q, prefix):
        return read_queue_stream(spark, q).select(
            F.col("c0").alias(f"{prefix}_id"),
            F.col("c1").alias(f"{prefix}_user"),
            F.timestamp_millis(F.col("c2")).alias(f"{prefix}_ts"),
        ).withWatermark(f"{prefix}_ts", "30 minutes")

    c, b = stream_of(clicks_q, "c"), stream_of(buys_q, "b")
    joined = c.join(
        b,
        (F.col("c_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("c_ts"))
        & (F.col("b_ts") <= F.col("c_ts") + F.expr("INTERVAL 5 MINUTES")),
    )
    out: list[tuple] = []
    query = (
        joined.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, _: out.extend(
                (r["c_id"], r["b_id"]) for r in df.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    expect = set()
    for cid, cu, cts in clicks:
        for bid, bu, bts in buys:
            if cu == bu and cts <= bts <= cts + 5 * 60_000:
                expect.add((cid, bid))
    assert set(out) == expect and len(expect) >= 6
    clicks_q.dispose()
    buys_q.dispose()


def test_streaming_cms_matches_batch_sketch(qpath, spark):
    """The streaming sketch's state is DEPTH*WIDTH-bounded by
    construction and its final cells must equal the batch sketch of
    the same feed — including across two micro-batch rounds (counts
    accumulate in state, not per-batch)."""
    from quebic_spark.operators.sampling import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_estimate,
        cms_sketch,
    )
    from quebic_spark.streaming.sketch import cms_stream

    q = Queue(qpath, Schema(INTEGER, TEXT), capacity=100000)
    rows = [[i, f"k{i % 37}"] for i in range(500)]
    q.publisher().push_all(rows[:300])

    latest: dict[tuple, int] = {}

    def run_once():
        keys = read_queue_stream(spark, q).select(
            F.col("c1").alias("key")
        )
        query = (
            cms_stream(keys).writeStream.outputMode("update")
            .foreachBatch(
                lambda df, _: latest.update(
                    {(r.row, r.col): r.cell_count for r in df.collect()}
                )
            )
            .option("checkpointLocation", os.path.join(qpath, "cms_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)

    run_once()
    q.publisher().push_all(rows[300:])
    run_once()  # state resumes from the checkpoint and accumulates

    batch = spark.createDataFrame(rows, "i long, key string")
    expect = {
        (r.row, r.col): r.cell_count
        for r in cms_sketch(batch.select("key")).collect()
    }
    assert latest == expect
    assert len(latest) <= CMS_DEPTH * CMS_WIDTH

    # probing the materialized stream cells gives the batch estimates
    cells = spark.createDataFrame(
        [(r, c, n) for (r, c), n in latest.items()],
        "row int, col long, cell_count long",
    )
    probes = spark.createDataFrame(
        [(f"k{i}",) for i in range(37)], "key string"
    )
    got = {
        r.key: r.est_count for r in cms_estimate(cells, probes).collect()
    }
    true = {f"k{i}": sum(1 for _, k in rows if k == f"k{i}")
            for i in range(37)}
    assert all(got[k] >= true[k] for k in true)
    q.dispose()


def test_continuous_retrieval_over_query_stream(
    qpath, spark, sf_dir, tmp_path, monkeypatch
):
    """Continuous retrieval: a queue feed of query vectors is served
    per micro-batch against the persisted IVF index (foreachBatch +
    ivf_search) — results match running the same queries in batch."""
    from quebic_spark.cache import clear_caches
    from quebic_spark.operators.similarity import N_CENTROIDS, ivf_search
    from quebic_spark.schema import TENSOR
    from quebic_spark.tensor import Tensor

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    clear_caches(include_ivf_index=True)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvecs = [(r.vec_id, list(r.embedding))
             for r in emb.limit(4).collect()]

    q = Queue(qpath, Schema(INTEGER, TENSOR), capacity=1000)
    pub = q.publisher()
    for qid, vec in qvecs:
        pub.push([qid, Tensor.from_vector(vec)])

    served: list[tuple] = []

    def on_batch(df, _):
        batch_queries = df.select(
            F.col("c0").alias("query_id"),
            F.col("c1.values").cast("array<float>").alias("embedding"),
        )
        served.extend(
            (r.query_id, r.rank, r.vec_id)
            for r in ivf_search(
                spark, sf_dir, batch_queries, k=3, nprobe=N_CENTROIDS
            ).collect()
        )

    query = (
        read_queue_stream(spark, q)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", os.path.join(qpath, "rag_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    batch_queries = spark.createDataFrame(
        qvecs, "query_id long, embedding array<float>"
    )
    expect = {
        (r.query_id, r.rank, r.vec_id)
        for r in ivf_search(
            spark, sf_dir, batch_queries, k=3, nprobe=N_CENTROIDS
        ).collect()
    }
    assert set(served) == expect and len(expect) == 12
    clear_caches(include_ivf_index=True)
    q.dispose()


def test_continuous_pq_retrieval_over_query_stream(
    qpath, spark, sf_dir, tmp_path, monkeypatch
):
    """The compressed twin of continuous retrieval: a queue feed of
    query vectors is served per micro-batch against the STORED IVF-PQ
    index (foreachBatch + ivf_pq_search). The index and codes are
    built offline first; the stream path must read stored codes (no
    encode work per micro-batch — pq_encode is forbidden) and agree
    with the batch result on the same queries."""
    from quebic_spark.cache import clear_caches
    from quebic_spark.operators import similarity as S
    from quebic_spark.schema import TENSOR
    from quebic_spark.tensor import Tensor

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    clear_caches(include_ivf_index=True)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvecs = [(r.vec_id, list(r.embedding))
             for r in emb.limit(4).collect()]

    # offline build: first compressed search materializes codebooks +
    # the stored (vec_id, cell, codes) table
    S.ivf_pq_topk(spark, sf_dir, nprobe=2).collect()
    monkeypatch.setattr(
        S, "pq_encode",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("stream re-encoded the corpus")
        ),
    )

    q = Queue(qpath, Schema(INTEGER, TENSOR), capacity=1000)
    pub = q.publisher()
    for qid, vec in qvecs:
        pub.push([qid, Tensor.from_vector(vec)])

    served: list[tuple] = []

    def on_batch(df, _):
        batch_queries = df.select(
            F.col("c0").alias("query_id"),
            F.col("c1.values").cast("array<float>").alias("embedding"),
        )
        served.extend(
            (r.query_id, r.rank, r.vec_id)
            for r in S.ivf_pq_search(
                spark, sf_dir, batch_queries, k=3, nprobe=2
            ).collect()
        )

    query = (
        read_queue_stream(spark, q)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", os.path.join(qpath, "pq_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    batch_queries = spark.createDataFrame(
        qvecs, "query_id long, embedding array<float>"
    )
    expect = {
        (r.query_id, r.rank, r.vec_id)
        for r in S.ivf_pq_search(
            spark, sf_dir, batch_queries, k=3, nprobe=2
        ).collect()
    }
    assert set(served) == expect and len(expect) == 12
    clear_caches(include_ivf_index=True)
    q.dispose()


def test_stream_scorer_matches_batch_on_shortest_repr_rounding(spark):
    """Regression (r7 review catch): Spark's decimal(18,2) cast rounds
    the double's SHORTEST decimal form (0.285 -> 0.29), while
    Decimal(v) sees the exact binary value (≈0.28499999…) and rounds
    to 0.28 — the buffered baselines diverged and so did downstream
    z-scores. Values engineered to split the two roundings must agree
    between batch and stream."""
    from quebic_spark.operators.temporal import anomaly_scores
    from quebic_spark.streaming.anomaly import _score_series

    # each of these has binary double strictly BELOW its printed
    # midpoint, so exact-binary rounding goes down while
    # shortest-repr (Spark) rounding goes up
    tricky = [0.285, 0.565, 0.045, 8.285]
    vals = tricky * 2 + [9.0, 0.285]
    rows = [(i, 1, i, v) for i, v in enumerate(vals)]
    batch_df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    )
    expect = {r.event_id: r
              for r in anomaly_scores(batch_df, min_n=3).collect()}

    got = _score_series(vals, [], window=20, min_n=3, z_threshold=3.0)
    for i, (n, z, flag) in enumerate(got):
        e = expect[i]
        assert n == e.baseline_n, i
        assert flag == e.is_anomaly, (i, z, e.z)
        if e.z is None:
            assert z is None, (i, z)
        else:
            assert abs(z - e.z) < 1e-12, (i, z, e.z)


def test_stream_scorer_matches_batch_on_nan_values(spark):
    """NaN parity (r13 review, reproduced): the batch plan CASTs NaN
    to a NULL decimal — counted by COUNT(1), excluded from the moment
    sums — and flags the NaN row itself anomalous (Spark orders NaN
    above every double). The stream scorer previously let
    Decimal('NaN') poison the sums, zeroing the variance and
    suppressing every anomaly for the next `window` events."""
    import math

    from quebic_spark.operators.temporal import anomaly_scores
    from quebic_spark.streaming.anomaly import _score_series

    vals = [1.0, 2.0, 1.5, 1.2, 1.8, float("nan"), 1.4, 9.9, 1.3,
            1.6, 1.1]
    rows = [(i, 1, i, v) for i, v in enumerate(vals)]
    batch_df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    )
    expect = {
        r.event_id: r
        for r in anomaly_scores(batch_df, window=5, min_n=3).collect()
    }
    buf: list = []
    got = _score_series(vals, buf, window=5, min_n=3, z_threshold=3.0)
    for i, (n, z, flag) in enumerate(got):
        e = expect[i]
        assert n == e.baseline_n, i
        assert flag == e.is_anomaly, (i, z, e.z)
        if e.z is None:
            assert z is None, (i, z)
        elif math.isnan(e.z):
            assert z is not None and math.isnan(z), (i, z)
        else:
            assert abs(z - e.z) < 1e-12, (i, z, e.z)
    # the NaN row itself is flagged (batch semantics), and the spike
    # AFTER the NaN is still caught — the old behavior suppressed it
    assert got[5][2] is True
    assert got[7][2] is True and expect[7].is_anomaly
    # the NaN rides the buffer as a None marker while in window
    buf2: list = []
    _score_series(vals, buf2, window=20, min_n=3, z_threshold=3.0)
    assert buf2.count(None) == 1


def test_stream_scorer_min_n_below_two_matches_batch(spark):
    """r14 review: min_n=1 made the variance divide by (nn-1)==0 —
    ZeroDivisionError killing the whole streaming query, where the
    batch plan's NULL divide + greatest(0.0, NULL) quietly yields
    var 0 / z NULL / is_anomaly False. Parity, not a crash."""
    from quebic_spark.operators.temporal import anomaly_scores
    from quebic_spark.streaming.anomaly import _score_series

    vals = [1.0, 50.0, 2.0, 3.0]
    rows = [(i, 1, i, v) for i, v in enumerate(vals)]
    batch_df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    )
    expect = {r.event_id: r
              for r in anomaly_scores(batch_df, min_n=1).collect()}
    buf: list = []
    got = _score_series(vals, buf, window=20, min_n=1, z_threshold=3.0)
    for i, (n, z, flag) in enumerate(got):
        e = expect[i]
        assert n == e.baseline_n, i
        assert flag == e.is_anomaly, (i, z, e.z)
        if e.z is None:
            assert z is None, (i, z)
        else:
            assert abs(z - e.z) < 1e-12, (i, z, e.z)


def test_score_series_inf_matches_batch_null_cast():
    """r16 probe (batch behavior verified empirically this session):
    CAST(Infinity AS DECIMAL(18,2)) is NULL under ANSI, exactly like
    NaN — the stream previously died with decimal.InvalidOperation
    on an Inf value. Inf must enter the baseline as the None marker
    (counted in n, excluded from the moments) and flag its own row
    anomalous (infinite |z|)."""
    from quebic_spark.streaming.anomaly import _score_series

    buf = []
    out = _score_series(
        [10.0, 10.5, 9.5, float("inf"), 10.2, 10.4, 10.1],
        buf, window=50, min_n=3, z_threshold=3.0,
    )
    # the inf row scores against a real 3-value baseline: z = +inf
    n, z, flag = out[3]
    assert n == 3 and z == float("inf") and flag is True
    # the following rows count inf in n but not in the moments:
    # verdicts must be finite and sane, never poisoned
    for n, z, flag in out[4:]:
        assert z is None or (z == z and abs(z) != float("inf"))
    # buf carries the None marker in the inf slot
    assert buf[3] is None and all(
        b is not None for i, b in enumerate(buf) if i != 3
    )


def test_score_series_overflow_fails_loud_like_ansi_batch():
    """r16 probe: under the session's ANSI default the batch job
    RAISES NUMERIC_VALUE_OUT_OF_RANGE for a finite value too large
    for DECIMAL(18,2) (1e16). The stream previously folded the value
    into the moments silently — opposite of the batch verdict. Same
    loud failure now."""
    from quebic_spark.streaming.anomaly import _score_series

    with pytest.raises(ValueError, match="DECIMAL"):
        _score_series([1e16], [], window=50, min_n=3, z_threshold=3.0)
    # the boundary value that still fits must pass
    out = _score_series(
        [9.99e15], [], window=50, min_n=3, z_threshold=3.0
    )
    assert out[0][0] == 0


def test_score_series_incremental_moments_match_fresh_fold():
    """r16 efficiency rewrite: the moments are folded once and
    updated add-on-append / subtract-on-evict. Decimal arithmetic is
    exact, so scoring a series event-by-event with a carried buffer
    must be bit-identical to scoring it in one call — including
    across evictions and None (NaN) markers."""
    import random

    from quebic_spark.streaming.anomaly import _score_series

    rnd = random.Random(7)
    series = [
        float("nan") if i % 11 == 0 else rnd.uniform(-50, 50)
        for i in range(120)
    ]
    buf_once = []
    once = _score_series(series, buf_once, window=9, min_n=3,
                         z_threshold=2.0)
    buf_step = []
    stepped = []
    for v in series:
        stepped.extend(
            _score_series([v], buf_step, window=9, min_n=3,
                          z_threshold=2.0)
        )
    def canon(res):
        # NaN != NaN would fail tuple equality on identical results
        return [
            (n, "nan" if (z is not None and z != z) else z, a)
            for n, z, a in res
        ]

    assert canon(once) == canon(stepped)
    assert buf_once == buf_step
