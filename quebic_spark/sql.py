"""SQL facade: reach the engine's tables and queue logs from
``spark.sql``.

The reference has no query language (SURVEY §0); this layer is part of
the Spark-native upgrade: every operator in this repo is a DataFrame
plan, so exposing the inputs as temp views makes the full surface
SQL-composable — Catalyst treats a view exactly like the underlying
scan (filters/pruning still push down to parquet).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

from quebic_spark.session import read_immutable_parquet

if TYPE_CHECKING:  # annotation-only: keep the SQL facade import-light
    # (eager Queue pulled pyarrow + the whole queue machinery into
    # every `import quebic_spark.sql`, r14 review; the module never
    # touches Queue at runtime)
    from quebic_spark.queue.queue import Queue

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def register_testdata(
    spark: SparkSession, sf_dir: str,
    tables: tuple[str, ...] = TESTDATA_TABLES,
) -> list[str]:
    """Temp view per testdata parquet table. ``events`` goes through
    the same ``ts`` normalization as the event operators
    (``operators.events._events``: TIMESTAMP(NANOS) and timestamp[us]
    generations both become a UTC session-zone TIMESTAMP), so SQL
    against the view and the operator layer see identical values —
    scan transparency includes type semantics. Returns the registered
    names."""
    from quebic_spark.operators.events import _events

    registered = []
    for t in tables:
        if t == "events":
            df = _events(spark, sf_dir)
        else:
            df = read_immutable_parquet(spark, f"{sf_dir}/{t}.parquet")
        df.createOrReplaceTempView(t)
        registered.append(t)
    return registered


def register_queue(
    spark: SparkSession, queue: Queue, name: str
) -> DataFrame:
    """Register a queue's PENDING records as a temp view (columns
    ``seq, created_at, expires_at, codec_id, c0..cN``).

    The view captures a snapshot of the log at registration time (the
    file list and the ack pointer are resolved now, like any table
    scan's file listing) — re-register after pushes/pops to refresh,
    or use ``quebic_spark.streaming.read_queue_stream`` for a live
    unbounded view. Returns the snapshot DataFrame."""
    df = queue.read_pending(spark)
    df.createOrReplaceTempView(name)
    return df


def register_release(
    spark: SparkSession,
    root: str,
    name: str = "corpus",
    version: int | None = None,
    require_manifest: bool = True,
) -> DataFrame:
    """Register a versioned corpus release (``pipeline.release_versioned``
    registry, default: latest) as a temp view, so release audits are
    plain SQL: ``SELECT source, COUNT(*) FROM corpus GROUP BY source``.

    The view is the pruning shard reader's scan — shard filters and
    column pruning still reach parquet through it.
    ``require_manifest=False`` forwards the verifier's escape hatch
    (r17, same as :func:`pipeline.load_release`) so a release whose
    completeness marker was lost can still be audited. Returns the
    frame."""
    from quebic_spark.pipeline import load_release

    df = load_release(spark, root, version,
                      require_manifest=require_manifest)
    df.createOrReplaceTempView(name)
    return df


def register_phrase_index(
    spark: SparkSession, path: str, name: str = "postings",
    require_commit_marker: bool = True,
) -> DataFrame:
    """Register a persisted posting index (``textops.build_phrase_index``)
    as a temp view, so corpus audits — "where does this eval string /
    PII fragment occur" — are plain SQL joins against ``documents``.

    The view is the bare bucketed-parquet scan: a ``token = '...'``
    predicate in SQL still lands in the parquet scan's PushedFilters
    (asserted in tests/test_sql.py), so a search reads the phrase
    tokens' posting lists, never the whole index. Returns the frame.

    The index build's ``_SUCCESS`` job-commit marker is required by
    default (r16 review): a ``build_phrase_index`` overwrite killed
    mid-job-commit leaves a PARTIAL part-file set that parquet reads
    without complaint — and a posting index missing postings silently
    misses matches, the worst failure an audit index can have.
    ``require_commit_marker=False`` admits indexes produced by writers
    that disable the marker."""
    if require_commit_marker:
        from quebic_spark.sources.io import fs_exists

        if not fs_exists(spark, f"{path}/_SUCCESS"):
            raise ValueError(
                f"{path} has no _SUCCESS job-commit marker: the index "
                "build crashed before committing (a partial posting "
                "set silently MISSES matches) — rebuild with "
                "build_phrase_index, or pass "
                "require_commit_marker=False for an index written "
                "without markers"
            )
    df = spark.read.parquet(path)
    df.createOrReplaceTempView(name)
    return df


def register_ivf_search(
    spark: SparkSession,
    sf_dir: str,
    queries: DataFrame,
    name: str = "ann_hits",
    k: int = 5,
    nprobe: int = 1,
    centroids: list | None = None,
) -> DataFrame:
    """Table-valued-function-style bridge for ANN search: run
    ``similarity.ivf_search`` (persisted cell-partitioned index,
    broadcast query side) and register the (query_id, vec_id, cosine,
    rank) result as a temp view, so retrieval joins compose in SQL:

        SELECT h.query_id, d.text
        FROM ann_hits h JOIN documents d ON d.doc_id = h.vec_id

    The view holds the lazy plan, not a materialization — Catalyst
    fuses whatever SQL is layered on top into the probe plan. Returns
    the frame."""
    from quebic_spark.operators.similarity import ivf_search

    df = ivf_search(
        spark, sf_dir, queries, k=k, nprobe=nprobe, centroids=centroids
    )
    df.createOrReplaceTempView(name)
    return df
