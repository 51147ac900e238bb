"""Event-stream analytics over the ``events`` table.

The reference's only "stream" is the queue itself (SURVEY §1.1); these
are the Spark-provision streaming analytics (SURVEY §2.9/§2.10):
tumbling/sliding/session windows and JSON prop extraction. Batch-mode
queries here (oracle-checkable); the same window expressions run
unchanged under Structured Streaming (see quebic_spark.streaming and
the streaming tests).

The events parquet has shipped with two physical ``ts`` encodings
across driver testdata generations: TIMESTAMP(NANOS) (which Spark 4
only scans via the nanosAsLong legacy conf; truncating ns -> us
bit-matches DuckDB's own ns -> us read) and plain timestamp[us].
``_events`` detects which one it got and normalizes both to a
session-zone TIMESTAMP column, so every downstream operator and its
DuckDB oracle see identical microsecond values either way.
"""

from __future__ import annotations

import contextlib
import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quebic_spark.session import read_immutable_parquet

SESSION_GAP = "30 minutes"


@contextlib.contextmanager
def _utc_pin(spark: SparkSession):
    """Pin ``spark.sql.session.timeZone`` to UTC for the enclosed plan
    CONSTRUCTION and restore after — Catalyst resolves the session
    zone into tz-aware expressions at analysis time (plan construction
    is eager), so restoring the conf afterwards cannot un-pin the
    built plan, and the user's own queries keep their configured zone.
    The ONE copy of the save/set/restore dance (r15 review: the
    decorator and ``_events`` carried two drifting inline copies)."""
    key = "spark.sql.session.timeZone"
    prev = spark.conf.get(key)
    spark.conf.set(key, "UTC")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _pinned_utc_query(fn):
    """Event gates build tz-AWARE expressions beyond the ts cast —
    ``F.window`` alignment, ``date_trunc`` — and Catalyst resolves the
    session zone into them at analysis time, while the DuckDB oracles
    state UTC wall times. Pin UTC around the WHOLE plan construction
    (the _events-internal pin covers only the normalization cast), and
    restore after: a harness-supplied non-UTC session can't shift
    window boundaries away from the oracle, and the user's own queries
    keep their configured zone (r6 review finding)."""

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        with _utc_pin(spark):
            return fn(spark, sf_dir)

    return wrapped


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quebic_spark.session import tune_for_query

    tune_for_query(spark)
    # pin UTC for the NTZ->TIMESTAMP cast below, SCOPED to this plan
    # construction: a harness-supplied non-UTC session would otherwise
    # shift every micros-generation ts by the zone offset (nanos path
    # is zone-independent) and diverge from the DuckDB oracle. A
    # no-op under the gates' own _pinned_utc_query decorator, but
    # direct _events callers get the guarantee too (r5 ADVICE).
    with _utc_pin(spark):
        return _events_pinned_utc(spark, sf_dir)


def _events_pinned_utc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = read_immutable_parquet(spark, f"{sf_dir}/events.parquet")
    if isinstance(raw.schema["ts"].dataType, LongType):
        # nanos generation: integer DIV, not `/` — double division of
        # ~1.7e18 ns epochs loses unit-microsecond precision (2^53).
        # LongType here can only mean TIMESTAMP(NANOS)-read-via-
        # nanosAsLong for current testdata, but guard the unit: a
        # future int64 ts in seconds/millis/micros would be silently
        # divided by 1000 — assert_true makes that fail loudly at scan
        # time instead (nanos epochs for any plausible date are > 2^60;
        # micros epochs are < 2^53).
        return raw.withColumn(
            "ts",
            F.timestamp_micros(
                F.when(
                    F.assert_true(
                        F.col("ts") > F.lit(1 << 60),
                        "events.ts: int64 below nanosecond-epoch "
                        "magnitude — unexpected unit, refusing DIV 1000",
                    ).isNull(),
                    F.expr("ts DIV 1000"),
                )
            ),
        )
    # micros generation: parquet timestamp[us] scans as TIMESTAMP_NTZ;
    # cast to the session-zone TIMESTAMP (pinned UTC above) so the
    # column type matches the nanos path and the driver's schema check
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


# ---------------------------------------------------------------------------
# event_counts_hourly — tumbling window (F.window, streaming-identical).
# ---------------------------------------------------------------------------

@_pinned_utc_query
def q_event_counts_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "n_users",
        )
    )


ORACLE_EVENT_COUNTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# event_sliding_windows — 1h windows sliding by 30m (each event lands
# in two windows). Oracle mirrors via UNION ALL of the two grids.
# ---------------------------------------------------------------------------

@_pinned_utc_query
def q_event_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


ORACLE_EVENT_SLIDING_WINDOWS = """
WITH grid AS (
  SELECT ts, time_bucket(INTERVAL '30 minutes', ts) AS w0 FROM events
),
assigned AS (
  SELECT w0 AS window_start FROM grid
  UNION ALL
  SELECT w0 - INTERVAL '30 minutes' AS window_start FROM grid
)
SELECT window_start, COUNT(*) AS n_events
FROM assigned
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# event_sessions — session windows (30 min gap) per user.
# Spark: native session_window; oracle: gaps-and-islands (lag + cumsum).
# ---------------------------------------------------------------------------

@_pinned_utc_query
def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", SESSION_GAP).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            (
                F.unix_micros("session_end") - F.unix_micros("session_start")
            ).alias("duration_us"),
        )
    )


ORACLE_EVENT_SESSIONS = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
FROM sessions
GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# event_json_props — JSON extraction from the props column + agg.
# ---------------------------------------------------------------------------

@_pinned_utc_query
def q_event_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


ORACLE_EVENT_JSON_PROPS = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# event_watermark_windows — deterministic batch formulation of the
# append-mode watermark contract (SURVEY §2.9 late-data discipline):
# with watermark delay D, append mode emits exactly the windows whose
# end <= max(event time) - D; later windows are still open and data
# later than the watermark is not re-admitted. Streaming behavior is
# pytest-covered (test_streaming_state.py); this query puts the same
# semantics under the CORRECTNESS gate with a DuckDB oracle.
# ---------------------------------------------------------------------------

WATERMARK_DELAY_MIN = 30


@_pinned_utc_query
def q_event_watermark_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    wm = ev.agg(
        (
            F.max("ts") - F.expr(f"INTERVAL {WATERMARK_DELAY_MIN} MINUTES")
        ).alias("wm")
    )
    win = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    # scalar watermark broadcast against the window grid; only closed
    # windows (end <= watermark) are "emitted"
    return (
        win.crossJoin(F.broadcast(wm))
        .filter(
            F.col("window_start") + F.expr("INTERVAL 1 HOUR")
            <= F.col("wm")
        )
        .select("window_start", "n_events")
    )


ORACLE_EVENT_WATERMARK_WINDOWS = f"""
WITH wm AS (
  SELECT MAX(ts) - INTERVAL {WATERMARK_DELAY_MIN} MINUTE AS wm FROM events
)
SELECT date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n_events
FROM events, wm
GROUP BY date_trunc('hour', ts), wm.wm
HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm.wm
"""


# ---------------------------------------------------------------------------
# event_funnel — per-user view -> click -> purchase ordering funnel.
# ---------------------------------------------------------------------------

@_pinned_utc_query
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "first_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    reached_view = F.col("first_view").isNotNull()
    reached_click = reached_view & F.col("first_click").isNotNull() & (
        F.col("first_click") > F.col("first_view")
    )
    reached_purchase = reached_click & F.col(
        "first_purchase"
    ).isNotNull() & (F.col("first_purchase") > F.col("first_click"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(reached_view.cast("long")).alias("n_view"),
        F.sum(reached_click.cast("long")).alias("n_view_click"),
        F.sum(reached_purchase.cast("long")).alias("n_view_click_purchase"),
    )


ORACLE_EVENT_FUNNEL = """
WITH per_user AS (
  SELECT user_id,
    MIN(ts) FILTER (event_type = 'view') AS first_view,
    MIN(ts) FILTER (event_type = 'click') AS first_click,
    MIN(ts) FILTER (event_type = 'purchase') AS first_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
  CAST(SUM(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_view,
  CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click IS NOT NULL
            AND first_click > first_view THEN 1 ELSE 0 END) AS BIGINT)
    AS n_view_click,
  CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click IS NOT NULL
            AND first_click > first_view AND first_purchase IS NOT NULL
            AND first_purchase > first_click THEN 1 ELSE 0 END) AS BIGINT)
    AS n_view_click_purchase
FROM per_user
"""


# ---------------------------------------------------------------------------
# event_rollup_hierarchy — TimescaleDB-style continuous-aggregate
# hierarchy: hour -> day -> week, where each coarser tier re-aggregates
# the TIER BELOW (one corpus pass total; day/week inputs are
# bucket-count-sized). This is the hypertable rollup pattern — at
# scale the hourly tier is a stored incremental aggregate and the
# coarser tiers are near-free derivations, never corpus re-scans.
# Only composable aggregates ride the hierarchy (counts, max — both
# bit-exact on any engine); non-composable ones (count-distinct) live
# at the finest tier only (see event_counts_hourly's n_users).
# ---------------------------------------------------------------------------


@_pinned_utc_query
def q_event_rollup_hierarchy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("value").alias("value_max"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", F.col("bucket")).alias("bucket"),
        "event_type",
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.max("value_max").alias("value_max"),
    )
    weekly = daily.groupBy(
        F.date_trunc("week", F.col("bucket")).alias("bucket"),
        "event_type",
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.max("value_max").alias("value_max"),
    )

    def tag(df: DataFrame, g: str) -> DataFrame:
        return df.select(
            F.lit(g).alias("granularity"),
            "bucket", "event_type", "n_events", "value_max",
        )

    return (
        tag(hourly, "hour")
        .unionAll(tag(daily, "day"))
        .unionAll(tag(weekly, "week"))
    )


ORACLE_EVENT_ROLLUP_HIERARCHY = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket, event_type,
         COUNT(*) AS n_events, MAX(value) AS value_max
  FROM events GROUP BY 1, 2
),
daily AS (
  SELECT date_trunc('day', bucket) AS bucket, event_type,
         CAST(SUM(n_events) AS BIGINT) AS n_events,
         MAX(value_max) AS value_max
  FROM hourly GROUP BY 1, 2
),
weekly AS (
  SELECT date_trunc('week', bucket) AS bucket, event_type,
         CAST(SUM(n_events) AS BIGINT) AS n_events,
         MAX(value_max) AS value_max
  FROM daily GROUP BY 1, 2
)
SELECT 'hour' AS granularity, * FROM hourly
UNION ALL SELECT 'day', * FROM daily
UNION ALL SELECT 'week', * FROM weekly
"""


QUERIES = {
    "event_rollup_hierarchy": q_event_rollup_hierarchy,
    "event_counts_hourly": q_event_counts_hourly,
    "event_sliding_windows": q_event_sliding_windows,
    "event_sessions": q_event_sessions,
    "event_json_props": q_event_json_props,
    "event_funnel": q_event_funnel,
    "event_watermark_windows": q_event_watermark_windows,
}

ORACLES = {
    "event_rollup_hierarchy": ORACLE_EVENT_ROLLUP_HIERARCHY,
    "event_counts_hourly": ORACLE_EVENT_COUNTS_HOURLY,
    "event_sliding_windows": ORACLE_EVENT_SLIDING_WINDOWS,
    "event_sessions": ORACLE_EVENT_SESSIONS,
    "event_json_props": ORACLE_EVENT_JSON_PROPS,
    "event_funnel": ORACLE_EVENT_FUNNEL,
    "event_watermark_windows": ORACLE_EVENT_WATERMARK_WINDOWS,
}
