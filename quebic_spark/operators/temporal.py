"""Temporal join operators: as-of join and range join over ``events``.

Spark has no native ASOF or range join; these are the §2.10-style
custom operators built as compositions of DataFrame primitives — the
preference order (a) in the build mandate.

  * as-of join: the union trick — interleave both sides sorted by
    (key, ts) and carry the left side's last value forward with
    ``last(col, ignorenulls=True)``. One shuffle, no pair explosion,
    works at any scale and any key skew. (A naive implementation joins
    every purchase to every earlier click and takes max — O(n^2) per
    user.)
  * range join: time-bucket both sides and join on (key, bucket) for
    adjacent buckets, then filter the exact predicate. The bucket join
    prunes the candidate space to O(pairs actually near each other);
    DuckDB's native inequality-join optimizer serves as the
    independent oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quebic_spark.operators.events import _events

RANGE_WINDOW_S = 300  # 5 minutes


# ---------------------------------------------------------------------------
# asof_click_to_purchase — for each purchase, the most recent click of
# the same user at-or-before the purchase (ASOF semantics: >=).
# ---------------------------------------------------------------------------

def q_asof_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ts"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
        F.lit(0).alias("is_purchase"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ts"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(1).alias("is_purchase"),
        F.col("event_id").alias("purchase_id"),
    )
    # clicks sort before purchases at equal ts (is_purchase 0 < 1), so a
    # click at exactly the purchase timestamp IS matched (>= semantics,
    # same as DuckDB ASOF JOIN ON t >= t)
    merged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "click_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn(
            "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
        )
        .withColumn(
            "last_click_id", F.last("click_id", ignorenulls=True).over(w)
        )
        .filter(F.col("is_purchase") == 1)
        .select(
            "user_id",
            F.col("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("last_click_id").alias("click_id"),
            F.col("last_click_ts").alias("click_ts"),
            (
                F.unix_micros("ts") - F.unix_micros("last_click_ts")
            ).alias("gap_us"),
        )
    )


# DuckDB's native ASOF JOIN is the independent oracle formulation.
# Tie-break: if a user has two clicks at the same timestamp the as-of
# match is ambiguous — the window form takes the max click_id; real
# event ids are unique per (user, ts) in this data (microsecond stamps),
# so both formulations agree.
ORACLE_ASOF_CLICK_TO_PURCHASE = """
WITH clicks AS (
  SELECT user_id, ts AS click_ts, event_id AS click_id
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id, p.purchase_id, p.purchase_ts,
       c.click_id, c.click_ts,
       epoch_us(p.purchase_ts) - epoch_us(c.click_ts) AS gap_us
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.purchase_ts >= c.click_ts
"""


# ---------------------------------------------------------------------------
# asof_next_purchase — FORWARD as-of via the generic library operator
# (quebic_spark.functions.temporal.asof_join): for each click, the
# earliest same-user purchase at-or-after it. Exercises the library
# op's forward mode under the gate (backward mode is gated by
# asof_click_to_purchase's hand-built twin); oracle is DuckDB's native
# ASOF with the reversed inequality.
# ---------------------------------------------------------------------------

def q_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quebic_spark.functions.temporal import asof_join

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    j = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="click_ts",
        right_ts="purchase_ts",
        right_values=["purchase_id", "purchase_ts"],
        direction="forward",
    )
    return j.select(
        "user_id",
        "click_id",
        "click_ts",
        F.col("purchase_id_asof").alias("purchase_id"),
        F.col("purchase_ts_asof").alias("purchase_ts"),
        (
            F.unix_micros("purchase_ts_asof") - F.unix_micros("click_ts")
        ).alias("wait_us"),
    )


ORACLE_ASOF_NEXT_PURCHASE = """
WITH clicks AS (
  SELECT user_id, ts AS click_ts, event_id AS click_id
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, c.click_id, c.click_ts,
       p.purchase_id, p.purchase_ts,
       epoch_us(p.purchase_ts) - epoch_us(c.click_ts) AS wait_us
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.click_ts <= p.purchase_ts
"""


# ---------------------------------------------------------------------------
# event_pairs_within_5min — bucketed range self-join: ordered pairs of
# same-user events with 0 < gap <= 5 minutes.
# ---------------------------------------------------------------------------

def q_event_pairs_within_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "ts", F.unix_micros("ts").alias("us")
    )
    bucket = (F.col("us") / F.lit(RANGE_WINDOW_S * 1_000_000)).cast("long")
    left = ev.withColumn("bucket", bucket)
    # the later event's bucket is the earlier's or the one after, so
    # the right (later) side probes its own bucket and the previous one
    right = left.select(
        F.col("user_id").alias("r_user_id"),
        F.col("event_id").alias("r_event_id"),
        F.col("us").alias("r_us"),
        F.explode(
            F.array(F.col("bucket"), F.col("bucket") - 1)
        ).alias("r_bucket"),
    )
    gap = F.col("r_us") - F.col("us")
    # no distinct() needed: a qualifying pair's later event lies in the
    # earlier's bucket or the next one, so of the two exploded probe
    # buckets {b, b-1} exactly ONE equals the earlier event's bucket —
    # each pair is emitted once by construction (the naive-join oracle
    # hash-proves it; a dedup here would be a wasted full shuffle)
    return (
        left.join(
            right,
            (F.col("user_id") == F.col("r_user_id"))
            & (F.col("bucket") == F.col("r_bucket")),
        )
        .filter(
            (gap > 0) & (gap <= RANGE_WINDOW_S * 1_000_000)
        )
        .select(
            "user_id",
            F.col("event_id").alias("first_id"),
            F.col("r_event_id").alias("second_id"),
            gap.alias("gap_us"),
        )
    )


ORACLE_EVENT_PAIRS_WITHIN_5MIN = f"""
SELECT a.user_id,
       a.event_id AS first_id,
       b.event_id AS second_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND epoch_us(b.ts) - epoch_us(a.ts) <= {RANGE_WINDOW_S * 1_000_000}
"""


# ---------------------------------------------------------------------------
# session_topk_events — sessionize (30 min gap), then top-2 events by
# value per session: the "top-k within incremental sessions" composite.
# ---------------------------------------------------------------------------

def q_session_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize + rank entirely with window functions over ONE
    user-keyed shuffle: lag-gap flags session starts, a running sum
    assigns session ids, and per-session start/count/rank are windows
    over the same partitioning (Catalyst reuses the exchange). The
    previous formulation (session_window groupBy + range join back to
    events) paid three shuffles and an inequality join — this is the
    plan that survives a 100x events table. Boundary semantics mirror
    the oracle exactly: a gap of EXACTLY 30 minutes stays in-session
    (strict >). Note this DIFFERS from Spark's ``session_window``,
    whose windows are end-exclusive — there, an event exactly gap
    after its predecessor starts a NEW session. The oracle's strict->
    rule is the contract here; no current data exercises the
    exact-boundary case."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    w_ord = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(w_ord)
    )
    is_new = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    tagged = ev.withColumn(
        "session_id",
        F.sum(is_new).over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w_sess = Window.partitionBy("user_id", "session_id")
    w_rank = w_sess.orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        tagged.select(
            "user_id",
            F.min("ts").over(w_sess).alias("session_start"),
            F.row_number().over(w_rank).alias("rk"),
            "event_id",
            "value",
            F.count(F.lit(1)).over(w_sess).alias("n_events"),
        )
        .filter(F.col("rk") <= 2)
    )


ORACLE_SESSION_TOPK_EVENTS = """
WITH ordered AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
tagged AS (
  SELECT user_id, ts, event_id, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
),
sessions AS (
  SELECT user_id, session_id, MIN(ts) AS session_start,
         COUNT(*) AS n_events
  FROM tagged GROUP BY user_id, session_id
)
SELECT t.user_id, s.session_start,
       ROW_NUMBER() OVER (PARTITION BY t.user_id, t.session_id
                          ORDER BY t.value DESC, t.event_id) AS rk,
       t.event_id, t.value, s.n_events
FROM tagged t JOIN sessions s
  ON t.user_id = s.user_id AND t.session_id = s.session_id
QUALIFY rk <= 2
"""


# ---------------------------------------------------------------------------
# event_anomaly_scores — per-entity moving-baseline anomaly detection:
# each event's `value` is z-scored against the trailing window of that
# user's PREVIOUS events (current row excluded — the baseline must not
# contain the point under test). The monitoring primitive for a
# pipeline's event stream: spot value spikes per entity without a
# global model.
#
# Determinism discipline (the lm_perplexity DECIMAL pattern, applied
# to moving moments): `value` has 2-decimal precision, so the window
# sums run on DECIMAL(18,2) / its exact square — bit-exact on any
# engine and any partitioning; mean/var/z are then derived from those
# exact sums with the IDENTICAL double expression on both engines, so
# the gate hash-checks unrounded floats. Variance is guarded
# (baseline >= MIN_N before any division; greatest(0, ·) soaks the
# representation epsilon) so no NaN/Inf path ever executes.
#
# Scale shape: ONE user-keyed exchange, one ordered frame per row —
# bounded ROWS frame, so state is O(window), never O(history); the
# same expressions run under applyInPandasWithState for the streaming
# variant of this contract, bounded per key (O(window)) AND across
# keys (processing-time idle eviction, streaming/anomaly.py).
# ---------------------------------------------------------------------------

ANOMALY_WINDOW = 20  # trailing events per user in the baseline
ANOMALY_MIN_N = 5    # minimum baseline size before scoring
ANOMALY_Z = 3.0      # |z| threshold


def anomaly_scores(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window: int = ANOMALY_WINDOW,
    min_n: int = ANOMALY_MIN_N,
    z_threshold: float = ANOMALY_Z,
) -> DataFrame:
    # Pin the window's shuffle width to the session's configured
    # parallelism (r20, guide §2.5): the DECIMAL moving moments are
    # compute-dense (~µs/row, not bytes-bound), and AQE's byte-based
    # advisory coalescing squeezed the whole corpus into 3 post-shuffle
    # partitions at sf0.1 (5.6 CPU-s serialized onto 3 tasks — 2.1 s
    # wall; pinned: 0.9 s). An explicit numPartitions repartition is
    # exempt from AQE coalescing, satisfies the window's required
    # distribution (so it replaces, not adds to, the window exchange),
    # and stays scale-adaptive through spark.sql.shuffle.partitions.
    # Values are partitioning-independent (per-key ordered frame), so
    # results are bit-identical (test_partition_invariance pins this).
    try:
        _width = int(
            events.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except (TypeError, ValueError):
        # deployments can set the conf to a non-numeric value (e.g.
        # "auto" under managed AQE) — fall back to the cluster's
        # default parallelism instead of raising (ADVICE r20)
        _width = events.sparkSession.sparkContext.defaultParallelism
    events = events.repartition(max(1, _width), key_col)
    dv = F.col(value_col).cast("decimal(18,2)")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-window, -1)
    )
    n = F.count(F.lit(1)).over(w)
    s = F.sum(dv).over(w).cast("double")
    q = F.sum(dv * dv).over(w).cast("double")
    nn = n.cast("double")
    mean = s / nn
    # n >= 2 guard alongside min_n (r14 review, rationale corrected
    # r15): these are DOUBLE divisions, which keep IEEE semantics
    # even under ANSI mode (DIVIDE_BY_ZERO raises only for
    # integral/decimal). With min_n < 2 a 1-row baseline yields
    # 0/0 = NaN, greatest(0.0, NaN) = NaN (Spark orders NaN above
    # all doubles, so NaN > 0 is true), z = NaN, and
    # abs(NaN) >= threshold is TRUE — every 1-row baseline silently
    # flagged anomalous. The guard applies under every ANSI config;
    # do not relax it for non-ANSI sessions. A 1-row baseline has no
    # variance estimate: z NULL, is_anomaly False, same verdict the
    # stream scorer returns (whose ZeroDivisionError claim is the
    # accurate one — that path divides in Python).
    var = F.when(
        (n >= min_n) & (n >= 2),
        F.greatest(F.lit(0.0), (q - s * s / nn) / (nn - 1)),
    )
    std = F.sqrt(var)
    z = F.when(std > 0, (F.col(value_col) - mean) / std)
    return events.select(
        id_col,
        key_col,
        value_col,
        n.cast("long").alias("baseline_n"),
        z.alias("z"),
        F.when(z.isNotNull(), F.abs(z) >= z_threshold)
        .otherwise(F.lit(False)).alias("is_anomaly"),
    )


def q_event_anomaly_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anomaly_scores(_events(spark, sf_dir))


ORACLE_EVENT_ANOMALY_SCORES = f"""
WITH win AS (
  SELECT event_id, user_id, value,
    COUNT(*) OVER w AS baseline_n,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s,
    CAST(SUM(CAST(value AS DECIMAL(18,2))
             * CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS q
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {ANOMALY_WINDOW} PRECEDING
                        AND 1 PRECEDING)
),
scored AS (
  SELECT event_id, user_id, value, baseline_n,
    CASE WHEN SQRT(CASE WHEN baseline_n >= {ANOMALY_MIN_N}
           THEN GREATEST(0.0,
                (q - s * s / CAST(baseline_n AS DOUBLE))
                / (CAST(baseline_n AS DOUBLE) - 1)) END) > 0
      THEN (value - s / CAST(baseline_n AS DOUBLE))
           / SQRT(CASE WHEN baseline_n >= {ANOMALY_MIN_N}
               THEN GREATEST(0.0,
                    (q - s * s / CAST(baseline_n AS DOUBLE))
                    / (CAST(baseline_n AS DOUBLE) - 1)) END)
    END AS z
  FROM win
)
SELECT event_id, user_id, value, baseline_n, z,
       CASE WHEN z IS NOT NULL THEN ABS(z) >= {ANOMALY_Z}
            ELSE FALSE END AS is_anomaly
FROM scored
"""


QUERIES = {
    "event_anomaly_scores": q_event_anomaly_scores,
    "asof_click_to_purchase": q_asof_click_to_purchase,
    "asof_next_purchase": q_asof_next_purchase,
    "event_pairs_within_5min": q_event_pairs_within_5min,
    "session_topk_events": q_session_topk_events,
}

ORACLES = {
    "event_anomaly_scores": ORACLE_EVENT_ANOMALY_SCORES,
    "asof_click_to_purchase": ORACLE_ASOF_CLICK_TO_PURCHASE,
    "asof_next_purchase": ORACLE_ASOF_NEXT_PURCHASE,
    "event_pairs_within_5min": ORACLE_EVENT_PAIRS_WITHIN_5MIN,
    "session_topk_events": ORACLE_SESSION_TOPK_EVENTS,
}
