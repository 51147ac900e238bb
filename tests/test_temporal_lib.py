"""Generic asof_join tests: backward/forward, ties, unmatched rows."""

import datetime

import pytest
from pyspark.sql import functions as F

from quebic_spark.functions.temporal import asof_join


def ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture
def frames(spark):
    trades = spark.createDataFrame(
        [
            (1, ts("2024-01-01T10:00:03"), 100.0),
            (1, ts("2024-01-01T10:00:10"), 101.0),
            (2, ts("2024-01-01T10:00:01"), 50.0),
            (3, ts("2024-01-01T10:00:05"), 7.0),  # no quotes for key 3
        ],
        "key int, trade_ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            (1, ts("2024-01-01T10:00:00"), 99.5),
            (1, ts("2024-01-01T10:00:03"), 99.9),  # tie with 1st trade
            (1, ts("2024-01-01T10:00:07"), 100.5),
            (2, ts("2024-01-01T10:00:02"), 49.5),  # after key-2 trade
        ],
        "key int, quote_ts timestamp, quote double",
    )
    return trades, quotes


def test_backward_asof(frames):
    trades, quotes = frames
    out = asof_join(
        trades, quotes, on=["key"], left_ts="trade_ts",
        right_ts="quote_ts", right_values=["quote"],
    )
    got = {
        (r["key"], r["trade_ts"].isoformat()): r["quote_asof"]
        for r in out.collect()
    }
    assert got[(1, "2024-01-01T10:00:03")] == 99.9  # tie matches (<=)
    assert got[(1, "2024-01-01T10:00:10")] == 100.5
    assert got[(2, "2024-01-01T10:00:01")] is None  # quote is later
    assert got[(3, "2024-01-01T10:00:05")] is None  # no quotes at all
    assert out.count() == 4  # left-join semantics


def test_forward_asof(frames):
    trades, quotes = frames
    out = asof_join(
        trades, quotes, on=["key"], left_ts="trade_ts",
        right_ts="quote_ts", right_values=["quote"],
        direction="forward",
    )
    got = {
        (r["key"], r["trade_ts"].isoformat()): r["quote_asof"]
        for r in out.collect()
    }
    assert got[(1, "2024-01-01T10:00:03")] == 99.9  # tie matches (>=)
    assert got[(1, "2024-01-01T10:00:10")] is None  # nothing later
    assert got[(2, "2024-01-01T10:00:01")] == 49.5


def test_direction_validation(frames):
    trades, quotes = frames
    with pytest.raises(ValueError):
        asof_join(trades, quotes, ["key"], "trade_ts", "quote_ts",
                  ["quote"], direction="nearest")


def test_asof_matches_temporal_query(spark, sf_dir):
    """The generic operator agrees with the hand-built union-window
    query on real events data (inner-match subset)."""
    from quebic_spark.operators.events import _events
    from quebic_spark.operators.temporal import q_asof_click_to_purchase

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    generic = asof_join(
        purchases, clicks, on=["user_id"], left_ts="purchase_ts",
        right_ts="click_ts", right_values=["click_id"],
    )
    expected = {
        (r["user_id"], r["purchase_id"]): r["click_id"]
        for r in q_asof_click_to_purchase(spark, sf_dir).collect()
    }
    got = {
        (r["user_id"], r["purchase_id"]): r["click_id_asof"]
        for r in generic.collect()
    }
    assert got == expected


def test_events_normalizer_scopes_timezone(spark, sf_dir):
    """_events pins UTC only for its own plan construction: a
    user-configured session timezone must survive the call, while the
    normalized ts values stay identical to the UTC-session ones
    because the cast captures UTC at analysis time (r5 ADVICE)."""
    from quebic_spark.operators.events import _events

    key = "spark.sql.session.timeZone"
    prev = spark.conf.get(key)
    baseline = [r["ts"] for r in _events(spark, sf_dir)
                .orderBy("event_id").limit(20).collect()]
    spark.conf.set(key, "America/New_York")
    try:
        df = _events(spark, sf_dir)
        assert spark.conf.get(key) == "America/New_York"
        got = [r["ts"] for r in df.orderBy("event_id")
               .limit(20).collect()]
    finally:
        spark.conf.set(key, prev)
    assert got == baseline


def test_event_gate_windows_pinned_utc_under_foreign_tz(spark, sf_dir):
    """Window alignment and date_trunc are tz-aware BEYOND the ts
    cast: gate results under a non-UTC session must equal the UTC
    baseline, and the session zone must survive (r6 review)."""
    from quebic_spark.operators.events import (
        q_event_counts_hourly,
        q_event_watermark_windows,
    )

    key = "spark.sql.session.timeZone"
    prev = spark.conf.get(key)

    def snap(fn):
        return sorted(map(tuple, fn(spark, sf_dir).collect()))

    base_hourly = snap(q_event_counts_hourly)
    base_wm = snap(q_event_watermark_windows)
    spark.conf.set(key, "Asia/Kolkata")  # +05:30: misaligns hours
    try:
        assert snap(q_event_counts_hourly) == base_hourly
        assert snap(q_event_watermark_windows) == base_wm
        assert spark.conf.get(key) == "Asia/Kolkata"
    finally:
        spark.conf.set(key, prev)


# ---------------------------------------------------------------------------
# event_anomaly_scores — moving-baseline z-scores
# ---------------------------------------------------------------------------

def _series_df(spark, values, user=1):
    import datetime

    rows = [
        (i, user, datetime.datetime(2024, 1, 1, 0, 0, i), float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_anomaly_z_matches_hand_computation(spark):
    import statistics

    from quebic_spark.operators.temporal import anomaly_scores

    vals = [10.0, 12.0, 11.0, 13.0, 9.0, 11.5, 50.0]
    df = _series_df(spark, vals)
    got = {r.event_id: r for r in anomaly_scores(df, min_n=5).collect()}

    # rows 0-4: baseline smaller than min_n -> no score
    for i in range(5):
        assert got[i].z is None and not got[i].is_anomaly
        assert got[i].baseline_n == i

    # row 6: baseline = previous 6 values, current excluded
    base = vals[:6]
    mu = statistics.mean(base)
    sd = statistics.stdev(base)
    expect = (50.0 - mu) / sd
    assert abs(got[6].z - expect) < 1e-9
    assert got[6].is_anomaly  # a 50 against ~11 +/- 1.4 is way past 3 sigma
    assert not got[5].is_anomaly


def test_anomaly_baseline_is_per_user_and_bounded(spark):
    import datetime

    from quebic_spark.operators.temporal import (
        ANOMALY_WINDOW,
        anomaly_scores,
    )

    rows = []
    for u in (1, 2):
        for i in range(ANOMALY_WINDOW + 10):
            rows.append((u * 1000 + i, u,
                         datetime.datetime(2024, 1, 1, 0, 0, 0)
                         + datetime.timedelta(seconds=i),
                         float(u * 100)))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = anomaly_scores(df).collect()
    # users never cross-contaminate: constant per-user series -> std 0
    # -> no score ever fires
    assert all(not r.is_anomaly for r in got)
    # frame is bounded at ANOMALY_WINDOW even deep into the series
    assert max(r.baseline_n for r in got) == ANOMALY_WINDOW


def test_anomaly_constant_baseline_never_divides_by_zero(spark):
    from quebic_spark.operators.temporal import anomaly_scores

    df = _series_df(spark, [5.0] * 8 + [9.0])
    got = {r.event_id: r for r in anomaly_scores(df, min_n=3).collect()}
    # zero-variance baseline -> std == 0 -> z stays NULL (no NaN/Inf)
    assert got[8].z is None and not got[8].is_anomaly


def test_anomaly_plan_has_single_user_exchange(spark, sf_dir):
    from quebic_spark.operators.temporal import q_event_anomaly_scores

    plan = q_event_anomaly_scores(spark, sf_dir)._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_asof_null_right_value_not_resurrected(spark):
    """r15 review: per-column last(ignorenulls) skipped a genuinely
    NULL right value and carried the OLDER row's — returning a field
    mix that never existed. The whole-row struct carry is atomic."""
    right = spark.createDataFrame(
        [("k", 5, 1, 2), ("k", 9, 3, None)],
        "key string, quote_ts long, a long, b long",
    )
    left = spark.createDataFrame(
        [("k", 10)], "key string, trade_ts long"
    )
    out = asof_join(
        left, right, ["key"], "trade_ts", "quote_ts", ["a", "b"]
    ).collect()[0]
    assert out["a_asof"] == 3 and out["b_asof"] is None, out


def test_asof_null_timestamps_never_match(spark):
    """r15 review: Spark's nulls-first ascending order made NULL-ts
    right rows sort before everything (matching as 'prior' to every
    left row), and a NULL-ts left row in forward mode saw every right
    row in its window."""
    right = spark.createDataFrame(
        [("k", None, 42), ("k", 7, 7)],
        "key string, quote_ts long, v long",
    )
    left = spark.createDataFrame(
        [("k", 5), ("k", None)], "key string, trade_ts long"
    )
    back = {
        r["trade_ts"]: r["v_asof"]
        for r in asof_join(
            left, right, ["key"], "trade_ts", "quote_ts", ["v"],
            direction="backward",
        ).collect()
    }
    # ts=5: no prior non-null-ts right row; ts=NULL: no match at all
    assert back == {5: None, None: None}, back
    fwd = {
        r["trade_ts"]: r["v_asof"]
        for r in asof_join(
            left, right, ["key"], "trade_ts", "quote_ts", ["v"],
            direction="forward",
        ).collect()
    }
    assert fwd == {5: 7, None: None}, fwd
