"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

North-star extension layer (SURVEY §2.10):
  * brute-force cosine top-k — the exact baseline, oracle-checkable;
  * LSH-bucketed top-k — the scale path: random-hyperplane signatures
    shrink the candidate set from O(n) per query to one bucket; the
    hyperplanes are seeded numpy literals embedded in BOTH the Spark
    plan and the oracle SQL, so even the approximate path hash-matches.

Scale notes: the query side is tiny and broadcast; the corpus side
never shuffles (scan -> project -> broadcast-join -> partial top-k).
At 100 TB the LSH variant becomes mandatory: bucket join keyed on the
signature replaces the cross join, and per-bucket top-k is a bounded
window. Brute force stays as the ground-truth harness for recall.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quebic_spark.session import read_immutable_parquet

from quebic_spark.functions.vector import (
    dot_product,
    dot_product_sql,
    l2_norm_sql,
)

log = logging.getLogger(__name__)

TOP_K = 5
QUERY_STRIDE = 50  # vec_id % STRIDE == 0 -> query set
N_PLANES = 8
PLANE_SEED = 42
EMB_DIM = 64


def _index_root() -> str:
    """Directory for persisted index artifacts (trained quantizers,
    cell-assigned corpora). At scale this is the warehouse path the
    offline index-build job writes to; locally it defaults to
    ``<repo>/.quebic_index`` and is overridable for tests via
    ``SPARK_GRAFT_INDEX_DIR``."""
    override = os.environ.get("SPARK_GRAFT_INDEX_DIR")
    if override:
        return override
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(repo, ".quebic_index")


def _index_tag(parts: list) -> str:
    return hashlib.md5(
        json.dumps(parts, sort_keys=True).encode()
    ).hexdigest()[:16]


_FP_MEMO: dict[tuple, str] = {}


def _corpus_fingerprint(sf_dir: str) -> str:
    """Content md5 of the embeddings table, memoized on (path, size,
    mtime). Index keys include this so REGENERATING testdata in place
    invalidates every stored quantizer/corpus instead of silently
    loading artifacts trained on the old bytes — path+params alone
    could not tell the difference (r6 review finding). Content hash,
    not stat, goes into the key itself: identical files on another
    machine still hit. The table may be a single parquet file (the
    driver's testdata) or a directory of part files (every real
    Spark-written table — r20): a directory hashes its data files in
    sorted-name order, keyed on the total size and newest mtime."""
    path = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, n) for n in os.listdir(path)
            if n.endswith(".parquet")
        )
    else:
        parts = [path]
    stats = [os.stat(p) for p in parts]
    memo_key = (
        path,
        sum(st.st_size for st in stats),
        max((st.st_mtime_ns for st in stats), default=0),
    )
    hit = _FP_MEMO.get(memo_key)
    if hit is not None:
        return hit
    h = hashlib.md5()
    for p in parts:
        h.update(os.path.basename(p).encode("utf-8"))
        with open(p, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
    fp = h.hexdigest()
    _FP_MEMO[memo_key] = fp
    return fp


def _array_sql(vec: list[float]) -> str:
    """Literal double-array SQL fragment. The ``1.5D`` double-literal
    suffix keeps repr's shortest-round-trip value exactly (verified:
    bit-identical to ``F.lit(float)``)."""
    return "array(" + ",".join(f"{float(x)!r}D" for x in vec) + ")"


def _array_lit(vec: list[float]) -> F.Column:
    """Literal double array via ONE parsed SQL expression. Building it
    as ``F.array(*[F.lit(x) ...])`` costs a py4j round-trip per element
    — ~0.35 s of driver chatter per 8x64 centroid set, paid at every
    plan construction."""
    return F.expr(_array_sql(vec))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-file input -> one partition; the cosine folds below are the
    # expensive part, so spread the corpus across executors up front
    # (conditional: no shuffle when the scan already has enough splits)
    from quebic_spark.plans.fanout import fan_out
    from quebic_spark.session import tune_for_query

    tune_for_query(spark)
    return fan_out(spark, read_immutable_parquet(spark, f"{sf_dir}/embeddings.parquet"))


def _planes() -> list[list[float]]:
    """Seeded random hyperplanes, rounded so their decimal literals are
    exactly representable the same way in both engines."""
    rng = np.random.RandomState(PLANE_SEED)
    planes = rng.randn(N_PLANES, EMB_DIM)
    return [[round(float(x), 6) for x in row] for row in planes]


# ---------------------------------------------------------------------------
# ann_bruteforce_topk — exact cosine top-k per query vector.
# ---------------------------------------------------------------------------

# the exact top-k frame memoized per (session, corpus) and persisted:
# it is BOTH the gated brute-force query result and the ground truth
# every recall measurement joins against (ann_ivf_learned_recall uses
# it twice + a count) — one cross-join materialization serves all of
# them. Same deliberate residency contract as _IVF_INDEX_CACHE; tiny
# (n_queries * k rows), released by clear_caches(include_ivf_index=True).
_EXACT_TOPK_CACHE: dict[tuple, DataFrame] = {}


def _cos_expr(a: str, b: str, a_norm: str, b_norm: str) -> F.Column:
    """Precomputed-norm cosine with the zero-norm guard (r15 review,
    same rationale as functions/vector.cosine_similarity): 0/0 = NaN
    under IEEE double division, and BOTH engines order NaN above all
    doubles, so one zero vector (padding / failed-encode artifact)
    ranked as the #1 neighbor of every query — and hash-MATCHED the
    oracle, making the wrong results invisible to the gate harness.
    NULL instead: desc ordering places NULLs last in Spark and DuckDB
    alike, so zero vectors simply never rank. _COS_SQL is the DuckDB
    twin; keep the arithmetic in lockstep.

    Args are column-name/SQL-fragment STRINGS: the whole guarded
    cosine parses in one py4j call (r20 — the Column form's two
    higher-order folds cost ~60 ms of driver chatter per plan
    construction; arithmetic unchanged, CASE WHEN == F.when)."""
    denom = f"({a_norm} * {b_norm})"
    return F.expr(
        f"CASE WHEN {denom} > 0 "
        f"THEN {dot_product_sql(a, b)} / {denom} END"
    )


# DuckDB twin of _cos_expr — spliced into every top-k oracle so the
# zero-norm rule matches the Spark side exactly (value arithmetic
# unchanged for non-zero vectors: same dot, same sqrt product)
_COS_SQL = """CASE WHEN (sqrt(list_dot_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[]))
         * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) > 0
      THEN list_dot_product(q.q_emb::DOUBLE[], e.embedding::DOUBLE[])
      / (sqrt(list_dot_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[]))
         * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])))
      END"""


def _exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _EXACT_TOPK_CACHE.get(key)
    if hit is not None:
        return hit
    df = _build_exact_topk(spark, sf_dir).persist()
    _EXACT_TOPK_CACHE[key] = df
    return df


def q_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _exact_topk(spark, sf_dir)


def _build_exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:

    # norms computed once per side before the join: one fold per pair
    # (bit-identical values, oracle unaffected)
    emb = _emb(spark, sf_dir).withColumn("norm", F.expr(l2_norm_sql("embedding")))
    queries = emb.filter((F.col("vec_id") % QUERY_STRIDE) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    cos = _cos_expr("q_emb", "embedding", "q_norm", "norm")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


ORACLE_ANN_BRUTEFORCE_TOPK = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id % {QUERY_STRIDE} = 0
),
scored AS (
  SELECT q.query_id, e.vec_id,
    {_COS_SQL}
      AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.query_id
)
SELECT query_id, vec_id, cosine,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, vec_id) AS rank
FROM scored
QUALIFY rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# ann_lsh_topk — random-hyperplane LSH bucketing + exact re-rank
# within the bucket. Both sides share the same literal hyperplanes.
# ---------------------------------------------------------------------------

def _signature_col() -> F.Column:
    # one parsed expression for the whole plane bank (r20): the
    # Column form cost a fold's worth of py4j chatter per plane
    bits = ", ".join(
        f"CASE WHEN {dot_product_sql('embedding', _array_sql(plane))}"
        " >= 0 THEN '1' ELSE '0' END"
        for plane in _planes()
    )
    return F.expr(f"concat({bits})")


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:

    emb = (
        _emb(spark, sf_dir)
        .withColumn("bucket", _signature_col())
        .withColumn("norm", F.expr(l2_norm_sql("embedding")))
    )
    queries = emb.filter((F.col("vec_id") % QUERY_STRIDE) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
        F.col("norm").alias("q_norm"),
    )
    cos = _cos_expr("q_emb", "embedding", "q_norm", "norm")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        emb.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


def _lsh_oracle() -> str:
    def plane_literal(plane: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"

    bits = " || ".join(
        "CASE WHEN list_dot_product(embedding::DOUBLE[], "
        f"{plane_literal(p)}) >= 0 THEN '1' ELSE '0' END"
        for p in _planes()
    )
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding, {bits} AS bucket FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, bucket AS q_bucket
  FROM sigs WHERE vec_id % {QUERY_STRIDE} = 0
),
scored AS (
  SELECT q.query_id, e.vec_id,
    {_COS_SQL}
      AS cosine
  FROM sigs e JOIN q ON e.bucket = q.q_bucket AND e.vec_id != q.query_id
)
SELECT query_id, vec_id, cosine,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, vec_id) AS rank
FROM scored
QUALIFY rank <= {TOP_K}
"""


ORACLE_ANN_LSH_TOPK = _lsh_oracle()


# ---------------------------------------------------------------------------
# ann_ivf_topk — IVF-style coarse quantization: every vector is
# assigned to its nearest of K seeded literal centroids (argmax inner
# product, first-index tie-break — the portable argmax), queries probe
# their own cell (nprobe=1) and re-rank exactly inside it. At 100 TB
# the cells are the partition key: the corpus is bucketed/partitioned
# by cell once, and a query touches one partition instead of the full
# scan — the complementary scale path to the LSH variant (hash buckets
# vs learned/seeded Voronoi cells).
# ---------------------------------------------------------------------------

N_CENTROIDS = 8
CENTROID_SEED = 7


def _centroids() -> list[list[float]]:
    rng = np.random.RandomState(CENTROID_SEED)
    cents = rng.randn(N_CENTROIDS, EMB_DIM)
    return [[round(float(x), 6) for x in row] for row in cents]


def _cell_col(
    centroids: list[list[float]] | None = None,
) -> tuple[list[F.Column], F.Column]:
    """(dot columns, cell expression): cell = FIRST index achieving the
    max inner product — a CASE chain, identical semantics in SQL."""
    cents = centroids if centroids is not None else _centroids()
    dots = [
        F.expr(
            dot_product_sql("embedding", _array_sql(c))
        ).alias(f"d{i}")
        for i, c in enumerate(cents)
    ]
    best = F.greatest(*[F.col(f"d{i}") for i in range(len(cents))])
    expr = None
    for i in range(len(cents)):
        cond = F.col(f"d{i}") == best
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    return dots, expr.cast("int")


_IVF_INDEX_CACHE: dict[tuple, DataFrame] = {}


def _ivf_disk_path(
    sf_dir: str, centroids: list[list[float]] | None = None
) -> str:
    """Stored-index location: corpus dir content fingerprint + the
    ACTUAL centroid values (seeded ones resolved to numbers), so any
    change to either invalidates the stored index instead of silently
    reusing it."""
    cent_values = centroids if centroids is not None else _centroids()
    return os.path.join(
        _index_root(),
        "ivf_corpus",
        _index_tag([_corpus_fingerprint(sf_dir),
                    [[float(x) for x in c] for c in cent_values]]),
    )


def _delta_root(disk_path: str) -> str:
    return disk_path + "_deltas"


def _read_delta_manifest(spark: SparkSession, disk_path: str) -> dict:
    """Committed-delta manifest through the Hadoop FS connector — the
    stored index may live on HDFS / an object store
    (``SPARK_GRAFT_INDEX_DIR`` can be any Spark-readable URI), where
    POSIX open()/rename() don't exist (r7; previously local-only)."""
    from quebic_spark.sources.io import fs_read_json_path

    mpath = os.path.join(_delta_root(disk_path), "manifest.json")
    stored = fs_read_json_path(spark, mpath)
    return stored if stored is not None else {"deltas": []}


def append_ivf_vectors(
    spark: SparkSession,
    sf_dir: str,
    new_vecs: DataFrame,
    centroids: list[list[float]] | None = None,
) -> dict:
    """Day-2 index growth: assign NEW vectors (vec_id, embedding) to
    the EXISTING quantizer's cells and commit them as a delta
    generation of the stored index — no retrain, no rescan of the
    resident corpus. Every IVF query through ``_ivf_corpus`` (probe,
    nprobe, recall) then sees base + committed deltas.

    Crash discipline = the release-registry pattern: the delta dir is
    staged and renamed, and the manifest listing committed deltas is
    written LAST and atomically — a crash mid-append leaves an
    unlisted (invisible) directory, never a half-visible generation.
    All commit IO goes through the Hadoop FS connector so the index
    root may be HDFS / an object store, and on a local root the whole
    read-manifest → commit → write-manifest sequence holds an
    exclusive flock: two concurrent appends serialize instead of both
    claiming the same generation number, the second's cleanup deleting
    the first's committed files, and the last manifest write dropping
    the other's entry (r7 review catch — release_versioned already
    had this lock, this path didn't).

    Note the semantic: the index belongs to (corpus fingerprint,
    quantizer); appends extend the INDEX beyond the base corpus, so
    index-derived results intentionally diverge from a fresh
    base-corpus rebuild until the base is re-fingerprinted. The same
    divergence applies to the DuckDB-oracled gates (semantic_dedup,
    the IVF top-k/recall family), whose oracles replay the BASE
    embeddings table only — run appends against a dedicated
    SPARK_GRAFT_INDEX_DIR, not the root a gate/bench session uses, or
    those gates will hash-fail on environment state rather than a
    code regression (r13 review; tests already isolate via the
    conftest temp index dir)."""
    import contextlib

    from quebic_spark.queue.storage import FileLock
    from quebic_spark.sources.io import (
        fs_commit_rename,
        fs_delete,
        fs_local_dir,
        fs_mkdirs,
        fs_write_json_path,
    )

    # ensure the base index exists (builds it on first use)
    _ivf_corpus(spark, sf_dir, centroids)
    disk_path = _ivf_disk_path(sf_dir, centroids)
    droot = _delta_root(disk_path)
    fs_mkdirs(spark, droot)
    local_droot = fs_local_dir(spark, droot)
    lock: contextlib.AbstractContextManager = (
        FileLock(os.path.join(local_droot, "_deltas.lock"))
        if local_droot is not None
        else contextlib.nullcontext()  # single-writer by contract
    )
    with lock:
        manifest = _read_delta_manifest(spark, disk_path)
        name = f"delta={len(manifest['deltas']) + 1:05d}"

        dots, cell = _cell_col(centroids)
        assigned = (
            new_vecs.select("vec_id", "embedding", *dots)
            .withColumn("cell", cell)
            .withColumn("norm", F.expr(l2_norm_sql("embedding")))
            .select("vec_id", "embedding", "cell", "norm")
        )
        if assigned.isEmpty():
            # a zero-row increment previously committed a delta dir
            # containing only _SUCCESS, and the read-back below threw
            # 'Unable to infer schema' AFTER the rename — leaving an
            # orphaned unlisted delta and a crash loop on retry (r13
            # review). An empty append is a no-op, not an error.
            return {"delta": None, "n_vectors": 0}
        staged = os.path.join(droot, name + ".tmp")
        fs_delete(spark, staged)
        assigned.repartition("cell").write.mode(
            "overwrite"
        ).partitionBy("cell").parquet(staged)
        final = os.path.join(droot, name)
        fs_commit_rename(spark, staged, final)
        n_rows = spark.read.parquet(final).count()
        manifest["deltas"].append(name)
        fs_write_json_path(
            spark, os.path.join(droot, "manifest.json"), manifest
        )
    # encode the new generation's PQ codes AT COMMIT TIME for the
    # default codebook set, if one is already trained against this
    # corpus — compressed search then reads stored codes for the delta
    # too, with zero encode work on the query path (VERDICT r8 #1).
    # Codebook configs trained later are covered by the lazy
    # encode-on-first-read in _pq_codes. The outcome is RECORDED per
    # generation in the delta manifest (VERDICT r9 #2 — no silent
    # degradation): codes_stored[name] is True (eagerly encoded),
    # False (eager encode FAILED — logged loudly; the lazy read path
    # repairs on first search, but a persistently failing encoder is
    # now observable in the manifest instead of silently re-degrading
    # every future search), or absent (no default-config codebook
    # trained yet — lazy by design, not degraded).
    codes_stored: bool | None = None
    try:
        from quebic_spark.sources.io import fs_read_json_path as _rj

        stored_books = _rj(
            spark, _pq_books_path(sf_dir, PQ_M, PQ_K, PQ_TRAIN_ITERS)
        )
        if stored_books is not None:
            _encode_component(
                spark,
                final,
                stored_books["codebooks"],
                os.path.join(
                    _pq_codes_root(
                        sf_dir, centroids, PQ_M, PQ_K, PQ_TRAIN_ITERS
                    ),
                    name,
                ),
            )
            codes_stored = True
    except Exception as e:  # noqa: BLE001 — lazy path re-encodes on
        # read; the failure must still be LOUD and land in the manifest
        codes_stored = False
        log.warning(
            "commit-time PQ encode for %s failed (%s: %s); searches "
            "fall back to lazy read-time encode until it is repaired",
            name, type(e).__name__, e,
        )
    if codes_stored is not None:
        # the flag is OBSERVABILITY, not correctness: the delta itself
        # committed above, so a failure recording the flag must not
        # make this append look failed (a retrying caller would commit
        # a duplicate delta) — log and move on instead
        try:
            with lock:
                manifest = _read_delta_manifest(spark, disk_path)
                manifest.setdefault("codes_stored", {})[name] = (
                    codes_stored
                )
                fs_write_json_path(
                    spark, os.path.join(droot, "manifest.json"),
                    manifest,
                )
        except Exception as e:  # noqa: BLE001
            log.warning(
                "could not record codes_stored[%s]=%s in the delta "
                "manifest (%s: %s); the append itself is committed",
                name, codes_stored, type(e).__name__, e,
            )
    # drop memoized frames for this (corpus, quantizer): the next
    # _ivf_corpus/_pq_codes call re-keys on the new delta list
    cent_key = (
        "seeded" if centroids is None
        else tuple(tuple(c) for c in centroids)
    )
    app = spark.sparkContext.applicationId
    for store in (_IVF_INDEX_CACHE, _PQ_CODES_CACHE):
        for k in [k for k in store if k[:3] == (app, sf_dir, cent_key)]:
            try:
                store.pop(k).unpersist(blocking=False)
            except Exception:  # noqa: BLE001 — stopped-session handles
                pass
    return {"delta": name, "n_vectors": n_rows}


def _ivf_corpus(
    spark: SparkSession, sf_dir: str,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """The cell-assigned corpus (vec_id, embedding, cell, norm),
    persisted and SHARED across the IVF query family: this table IS
    the IVF index — at scale it is built once offline and stored with
    ``cell`` as a partition/bucket column, so every query against the
    same (session, corpus, quantizer) must reuse one materialization,
    not rebuild it per call. persist() also stops Catalyst's
    projection collapse from re-expanding ``cell`` into the
    greatest()/CASE chain per WHEN arm within a single plan.

    Keyed by (session id, corpus dir, quantizer): a new session or new
    centroids build a new index; testdata is immutable so there is no
    invalidation path.

    The index is also persisted to disk (``_index_root()``), written
    ONCE as parquet partitioned by ``cell`` — the literal "at scale it
    is a stored table" layout: a query probing cell c prunes to that
    partition's files. A fresh process reads the stored table instead
    of re-deriving cell assignments; the in-memory persist() then only
    caches a partition-pruned scan.
    """
    from quebic_spark.session import tune_for_query

    cent_key = (
        "seeded" if centroids is None
        else tuple(tuple(c) for c in centroids)
    )
    disk_path = _ivf_disk_path(sf_dir, centroids)
    deltas = tuple(_read_delta_manifest(spark, disk_path)["deltas"])
    key = (spark.sparkContext.applicationId, sf_dir, cent_key, deltas)
    cached = _IVF_INDEX_CACHE.get(key)
    if cached is not None:
        return cached
    from quebic_spark.sources.io import fs_delete, fs_exists

    if not fs_exists(spark, os.path.join(disk_path, "_SUCCESS")):
        dots, cell = _cell_col(centroids)
        built = (
            _emb(spark, sf_dir)
            .select("vec_id", "embedding", *dots)
            .withColumn("cell", cell)
            .withColumn("norm", F.expr(l2_norm_sql("embedding")))
            .select("vec_id", "embedding", "cell", "norm")
        )
        # stage + rename so a crashed write never half-populates the
        # index path (same commit discipline as queue/storage.py),
        # through the FS connector so the index root may be HDFS or
        # an object store (r7; previously os.rename / local-only).
        # repartition("cell") -> one file per populated cell dir: the
        # fan_out scan would otherwise strand 32 tiny files in every
        # cell (measured 5x slower re-read). At 100 TB the same write
        # targets a file-size budget (maxRecordsPerFile), not one file.
        #
        # WRITER-UNIQUE staging + rename-if-absent (r13 review): a
        # fixed shared '.tmp' with delete-then-rename let two
        # processes first-building the same index delete each other's
        # in-flight staging files and publish a silently truncated
        # index — the same race _encode_component and
        # append_ivf_vectors already guard against. Both racers build
        # identical content from the same corpus, so the loser just
        # discards its copy.
        import uuid

        from quebic_spark.sources.io import (
            fs_rename_aside,
            fs_rename_if_absent,
        )

        # a dst that exists WITHOUT _SUCCESS is *probably* a dead
        # crash leftover — but a RACING builder can complete its
        # atomic publish between that observation and a repair, so an
        # in-place delete here could yank a freshly committed index
        # out from under its builder and readers (r15 review: the
        # TOCTOU _encode_component closed in r10 survived here).
        # Same repair: rename-ASIDE to a writer-unique quarantine (no
        # delete of a live path, ever), inspect, republish a captured
        # complete publish, discard a true partial.
        if fs_exists(spark, disk_path):
            quarantine = (
                disk_path + ".quarantine-" + uuid.uuid4().hex[:8]
            )
            if fs_rename_aside(spark, disk_path, quarantine):
                if fs_exists(
                    spark, os.path.join(quarantine, "_SUCCESS")
                ):
                    if not fs_rename_if_absent(
                        spark, quarantine, disk_path
                    ):
                        # someone republished meanwhile — identical
                        # bytes by determinism; drop the duplicate
                        fs_delete(spark, quarantine)
                else:
                    fs_delete(spark, quarantine)
        # re-check: the repair (or a racing builder) may have landed a
        # complete index, making the expensive rebuild unnecessary
        if not fs_exists(spark, os.path.join(disk_path, "_SUCCESS")):
            tmp = disk_path + ".tmp-" + uuid.uuid4().hex[:8]
            built.repartition("cell").write.mode(
                "overwrite"
            ).partitionBy("cell").parquet(tmp)
            if not fs_rename_if_absent(spark, tmp, disk_path):
                fs_delete(spark, tmp)  # another builder won; same bytes
        if not fs_exists(spark, os.path.join(disk_path, "_SUCCESS")):
            raise RuntimeError(
                f"IVF index publish failed at {disk_path}: no "
                "_SUCCESS after commit"
            )
    else:
        tune_for_query(spark)
    emb = spark.read.parquet(disk_path).select(
        "vec_id", "embedding",
        F.col("cell").cast("int").alias("cell"), "norm",
    )
    # committed delta generations (append_ivf_vectors) extend the
    # index; uncommitted/staged dirs are invisible (manifest-last)
    for name in deltas:
        emb = emb.unionByName(
            spark.read.parquet(
                os.path.join(_delta_root(disk_path), name)
            ).select(
                "vec_id", "embedding",
                F.col("cell").cast("int").alias("cell"), "norm",
            )
        )
    emb = emb.persist()
    _IVF_INDEX_CACHE[key] = emb
    return emb


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _ivf_corpus(spark, sf_dir)
    queries = emb.filter((F.col("vec_id") % QUERY_STRIDE) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("cell").alias("q_cell"),
        F.col("norm").alias("q_norm"),
    )
    cos = _cos_expr("q_emb", "embedding", "q_norm", "norm")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        emb.join(
            F.broadcast(queries),
            (F.col("cell") == F.col("q_cell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


def _ivf_oracle() -> str:
    def lit(vec: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in vec) + "]::DOUBLE[]"

    dot_cols = ",\n         ".join(
        f"list_dot_product(embedding::DOUBLE[], {lit(c)}) AS d{i}"
        for i, c in enumerate(_centroids())
    )
    best = "GREATEST(" + ", ".join(
        f"d{i}" for i in range(N_CENTROIDS)
    ) + ")"
    case = "CASE " + " ".join(
        f"WHEN d{i} = {best} THEN {i}" for i in range(N_CENTROIDS)
    ) + " END"
    return f"""
WITH dots AS (
  SELECT vec_id, embedding,
         {dot_cols}
  FROM embeddings
),
cells AS (
  SELECT vec_id, embedding, CAST({case} AS INTEGER) AS cell FROM dots
),
q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, cell AS q_cell
  FROM cells WHERE vec_id % {QUERY_STRIDE} = 0
),
scored AS (
  SELECT q.query_id, e.vec_id,
    {_COS_SQL}
      AS cosine
  FROM cells e JOIN q ON e.cell = q.q_cell AND e.vec_id != q.query_id
)
SELECT query_id, vec_id, cosine,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, vec_id) AS rank
FROM scored
QUALIFY rank <= {TOP_K}
"""


ORACLE_ANN_IVF_TOPK = _ivf_oracle()


# ---------------------------------------------------------------------------
# ivf_topk_nprobe — the recall dial on the IVF scale path: each query
# probes its ``nprobe`` nearest cells instead of only the argmax cell.
# nprobe=1 is the gated q_ann_ivf_topk plan; raising it trades linearly
# more candidate comparisons for recall (the standard IVF knob). The
# corpus side is unchanged — still one cell-keyed join against the
# persisted cell-assigned table; only the (tiny, broadcast) query side
# fans out nprobe-fold.
# ---------------------------------------------------------------------------

def _cell_ranking_col(
    centroids: list[list[float]] | None = None,
) -> F.Column:
    """Array of the cell ids ordered by descending inner product
    (ties: lower id first) — slice the first nprobe to probe."""
    cents = centroids if centroids is not None else _centroids()
    # ONE parsed expression for the whole ranking (r20): the Column
    # form cost ~0.3 s of py4j lambda chatter per plan construction.
    # Bit-identical (array_sort compares struct fields in order, the
    # negated fold is the same fold; verified 0 mismatches).
    structs = ", ".join(
        "named_struct('neg_dot', "
        f"-({dot_product_sql('embedding', _array_sql(c))}), "
        f"'cell', {i})"
        for i, c in enumerate(cents)
    )
    return F.expr(
        f"transform(array_sort(array({structs})), s -> s.cell)"
    )


def ivf_topk_nprobe(
    spark: SparkSession, sf_dir: str, nprobe: int = 2, k: int = TOP_K,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    emb = _ivf_corpus(spark, sf_dir, centroids)
    queries = (
        emb.filter((F.col("vec_id") % QUERY_STRIDE) == 0)
        .withColumn("probe_cells", _cell_ranking_col(centroids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("norm").alias("q_norm"),
            F.explode(
                F.slice(F.col("probe_cells"), 1, nprobe)
            ).alias("q_cell"),
        )
    )
    cos = _cos_expr("q_emb", "embedding", "q_norm", "norm")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        emb.join(
            F.broadcast(queries),
            (F.col("cell") == F.col("q_cell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# trained quantizers memoized per (session, corpus, k, iters): training
# is the offline index-build step — train once, reuse across every
# query against the same corpus (same residency contract as
# _IVF_INDEX_CACHE; k-means here is deterministic so a re-train could
# only ever reproduce the same centroids anyway)
_LEARNED_CENTROIDS_CACHE: dict[tuple, list[list[float]]] = {}

# Quantizer-training slice: every k-means here (the IVF coarse
# quantizer and the PQ codebooks) trains on a deterministic sample
# whose size is bounded by ROW COUNT, never by a corpus percentage
# (VERDICT r9 #1: a pct slice grows linearly with the corpus — at
# 100 TB "50%" is a 50 TB training scan). The sample is the
# IVF_TRAIN_ROWS rows that sort first by md5(vec_id): Spark plans the
# ORDER BY + LIMIT as TakeOrderedAndProject — each scan partition
# contributes at most N rows to one bounded merge, so the build-side
# cost of "train the quantizer" is O(N), constant in corpus size. The
# hash order reproduces across engines/runs (the lm_perplexity/
# quality-classifier split discipline, VERDICT r7 #3) and DuckDB
# replays the same ORDER BY md5 LIMIT N for the gates' train_n fact.
# N = 256 x max(N_CENTROIDS=8, PQ_K=16): the classic ~256-points-per-
# centroid k-means budget, sized to the larger codebook. At the test
# corpora (500-2000 vectors) the cap exceeds the table, so training
# sees every row — the cap binds exactly where it must, at scale. The
# row cap is versioned into every stored-artifact key so changing it
# invalidates trained quantizers instead of silently reusing them.
IVF_TRAIN_ROWS = 4096


def _train_slice(emb: DataFrame, n_rows: int | None = None) -> DataFrame:
    if n_rows is None:  # resolved at call time, not def time
        n_rows = IVF_TRAIN_ROWS
    # md5 is injective over the distinct vec_ids in practice; vec_id
    # tiebreak makes the order total by construction either way
    return emb.orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    ).limit(n_rows)


# k-means restarts: Lloyd from a single deterministic init is brittle
# on small training slices (the md5-slice change surfaced this — one
# init's local optimum lost to the seeded gaussian cells on one test
# corpus). Standard remedy: R deterministic inits, keep the centroids
# with the best quantization objective on the training slice. The
# objective (mean max inner product) is computed with the repo's exact
# float discipline (round-6 + DECIMAL sum) so the winning seed is
# partitioning-independent. (restarts, iters) = (8, 8) chosen by a
# r10 sweep after the row-cap change grew the training set at test
# scale: 5 Lloyd iterations underconverged on the larger set (learned
# recall@nprobe=1 sagged to 0.26-0.28 vs seeded 0.30 at sf0.001),
# while 8x8 dominates seeded at EVERY test scale and probe budget
# (0.44/0.66 vs 0.30/0.46 at sf0.001; 0.365/0.515 vs 0.245/0.465 at
# sf0.1). Training cost stays one-time per stored index either way.
IVF_SEED_RESTARTS = 8
IVF_TRAIN_ITERS = 8


def learned_centroids(
    spark: SparkSession, sf_dir: str, k_cells: int = N_CENTROIDS,
    train_iters: int = IVF_TRAIN_ITERS,
    seed_restarts: int = IVF_SEED_RESTARTS,
) -> list[list[float]]:
    """IVF coarse quantizer LEARNED from the corpus via SPHERICAL
    k-means (``functions/clustering.py`` over unit vectors, centroids
    re-normalized): the quantizer's metric then matches the cosine
    top-k it indexes — plain L2 k-means centroids sit off the unit
    sphere and their dot-product argmax carves different (worse) cells
    than the trained ones. Measured on the driver corpora (row-capped
    slice, best-of-8 restarts, 8 Lloyd iterations): recall@5 strictly
    above seeded at EVERY test scale and probe budget — e.g. sf0.1
    0.245→0.365 at nprobe=1, 0.465→0.515 at nprobe=2 (asserted in
    ``tests/test_similarity_lib.py``). At scale this is the offline
    index-build step: train once, store ``cell`` as a partition
    column, reuse across queries.

    The trained quantizer
    is persisted to ``_index_root()/quantizer/<key>.json`` keyed by
    (corpus dir, k_cells, train_iters): a fresh process LOADS the
    centroids (exact float round-trip — json repr) instead of
    re-running Lloyd iterations. k-means here is deterministic, so the
    loaded centroids are bit-identical to what a retrain would produce
    — the disk copy changes cost, never results.
    """
    import math

    from quebic_spark.functions.clustering import kmeans

    key = (
        spark.sparkContext.applicationId, sf_dir, k_cells, train_iters,
        seed_restarts,
    )
    hit = _LEARNED_CENTROIDS_CACHE.get(key)
    if hit is not None:
        return hit
    # "spherical-kmeans-v3" versions the TRAINING ALGORITHM into the
    # key — bump it if functions/clustering.py changes semantics, else
    # a stored quantizer from the old algorithm would mask the change
    # (v3 = row-capped hash-ordered training set + best-of-R restarts;
    # the row cap and restart count are part of the key)
    disk_key = [
        "spherical-kmeans-v3", _corpus_fingerprint(sf_dir), k_cells,
        train_iters, IVF_TRAIN_ROWS, seed_restarts,
    ]
    from quebic_spark.sources.io import (
        fs_read_json_path,
        fs_write_json_path,
    )

    quant_path = os.path.join(
        _index_root(), "quantizer", _index_tag(disk_key) + ".json"
    )
    stored = fs_read_json_path(spark, quant_path)
    if stored is not None and stored.get("key") == disk_key:
        out = stored["centroids"]
        _LEARNED_CENTROIDS_CACHE[key] = out
        return out
    emb = _train_slice(
        read_immutable_parquet(spark, f"{sf_dir}/embeddings.parquet")
    ).select("embedding")
    norm = F.expr(l2_norm_sql("embedding"))
    # materialize the unit vectors once for the whole Lloyd loop:
    # every iteration re-scans its input. The row-capped slice arrives
    # as ONE bounded partition (TakeOrderedAndProject output), so each
    # Lloyd job is a single task over <= IVF_TRAIN_ROWS rows — no
    # coalesce needed, and the single partition makes every float fold
    # in training sequential (one canonical summation order).
    unit = emb.select(
        F.transform(F.col("embedding"), lambda x: x / norm).alias(
            "embedding"
        )
    ).cache()
    best_obj, best_cents = None, None
    try:
        for r in range(seed_restarts):
            # per-seed deterministic Forgy init: the k slice rows that
            # sort first by md5 of ("seed<r>:" + their string form) —
            # the same hash-order family kmeans uses internally, fanned
            # out into R distinct deterministic starting sets
            seed_key = F.md5(
                F.concat(F.lit(f"seed{r}:"), F.col("v").cast("string"))
            )
            init = [
                list(row["v"])
                for row in unit.select(F.col("embedding").alias("v"))
                .orderBy(seed_key, F.col("v").cast("string"))
                .limit(k_cells)
                .collect()
            ]
            _, cents, _ = kmeans(
                unit, "embedding", k_cells, max_iters=train_iters,
                init_centroids=init,
            )
            cents = [
                [x / math.sqrt(sum(y * y for y in c)) for x in c]
                for c in cents
            ]
            # quantization objective on the slice: SUM of per-row max
            # inner products, round-6 + DECIMAL(28,6) so the comparison
            # is independent of partitioning/combine order (float sums
            # are not); ties keep the LOWER seed — fully deterministic
            obj = unit.agg(
                F.sum(
                    F.round(
                        F.greatest(
                            *[
                                dot_product(
                                    F.col("embedding"), _array_lit(c)
                                )
                                for c in cents
                            ]
                        ),
                        6,
                    ).cast("decimal(28,6)")
                )
            ).collect()[0][0]
            if best_obj is None or obj > best_obj:
                best_obj, best_cents = obj, cents
    finally:
        unit.unpersist(blocking=False)
    out = best_cents
    # through the FS connector (atomic on file://, all-or-nothing PUT
    # on object stores) so the quantizer lives beside the index it
    # defines wherever that index root is
    fs_write_json_path(
        spark, quant_path, {"key": disk_key, "centroids": out}
    )
    _LEARNED_CENTROIDS_CACHE[key] = out
    return out


def ivf_topk_learned(
    spark: SparkSession, sf_dir: str, nprobe: int = 1, k: int = TOP_K,
    k_cells: int = N_CENTROIDS, train_iters: int = IVF_TRAIN_ITERS,
) -> DataFrame:
    """IVF top-k with a kmeans-learned quantizer: same probe plan as
    ``ivf_topk_nprobe`` (persisted cell corpus, broadcast query side),
    only the centroid literals differ."""
    cents = learned_centroids(spark, sf_dir, k_cells, train_iters)
    return ivf_topk_nprobe(
        spark, sf_dir, nprobe=nprobe, k=k, centroids=cents
    )


def q_ann_ivf_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry for the nprobe recall dial at nprobe=2: each query
    probes its two nearest cells (vs the argmax-only q_ann_ivf_topk),
    trading 2x candidate comparisons for recall. Same persisted
    cell-assigned corpus and broadcast query side as the nprobe=1
    plan — only the (tiny) query side fans out 2x."""
    return ivf_topk_nprobe(spark, sf_dir, nprobe=2)


def _ivf_nprobe_oracle(nprobe: int = 2) -> str:
    def lit(vec: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in vec) + "]::DOUBLE[]"

    dot_cols = ",\n         ".join(
        f"list_dot_product(embedding::DOUBLE[], {lit(c)}) AS d{i}"
        for i, c in enumerate(_centroids())
    )
    best = "GREATEST(" + ", ".join(
        f"d{i}" for i in range(N_CENTROIDS)
    ) + ")"
    case = "CASE " + " ".join(
        f"WHEN d{i} = {best} THEN {i}" for i in range(N_CENTROIDS)
    ) + " END"
    # probe-cells exploded: one row per (query, probed cell), ranked by
    # centroid inner product with the same DESC-dot / ASC-cell
    # tie-break as the Spark side's array_sort((-dot, cell))
    unions = "\n  UNION ALL ".join(
        f"SELECT query_id, q_emb, {i} AS cell, d{i} AS dot FROM qd"
        for i in range(N_CENTROIDS)
    )
    return f"""
WITH dots AS (
  SELECT vec_id, embedding,
         {dot_cols}
  FROM embeddings
),
cells AS (
  SELECT vec_id, embedding, CAST({case} AS INTEGER) AS cell FROM dots
),
qd AS (
  SELECT vec_id AS query_id, embedding AS q_emb,
         {", ".join(f"d{i}" for i in range(N_CENTROIDS))}
  FROM dots WHERE vec_id % {QUERY_STRIDE} = 0
),
qflat AS (
  {unions}
),
qprobe AS (
  SELECT query_id, q_emb, cell AS q_cell FROM qflat
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY dot DESC, cell) <= {nprobe}
),
scored AS (
  SELECT q.query_id, e.vec_id,
    {_COS_SQL}
      AS cosine
  FROM cells e JOIN qprobe q ON e.cell = q.q_cell AND e.vec_id != q.query_id
)
SELECT query_id, vec_id, cosine,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, vec_id) AS rank
FROM scored
QUALIFY rank <= {TOP_K}
"""


ORACLE_ANN_IVF_NPROBE2 = _ivf_nprobe_oracle(2)


# ---------------------------------------------------------------------------
# embedding_label_centroids — per-label mean vector + stats (the IVF
# coarse-quantizer building block; also a plain vector aggregation).
# Mean vectors are element-wise sums -> order-sensitive in double, so
# the output reduces to deterministic scalars: count + norm bounds.
# ---------------------------------------------------------------------------

def q_embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    norm = F.expr(l2_norm_sql("embedding"))
    return (
        emb.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("norm").alias("min_norm"),
            F.max("norm").alias("max_norm"),
        )
    )


ORACLE_EMBEDDING_LABEL_STATS = """
SELECT label, COUNT(*) AS n_vectors,
  MIN(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS min_norm,
  MAX(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS max_norm
FROM embeddings
GROUP BY label
"""


# ---------------------------------------------------------------------------
# ann_ivf_learned_recall — gate for the LEARNED coarse quantizer.
# k-means output is data-dependent, so DuckDB cannot replay the cells;
# same pattern as cardinality_sketch: the data-dependent quantities
# (recall@k of learned vs seeded IVF against exact top-k) stay out of
# the projection and are evaluated IN-PLAN into portable booleans the
# oracle states as literals. Spherical k-means here is deterministic
# (DECIMAL-exact sums, partition-count-independent — functions/
# clustering.py), so the booleans are stable facts of the corpus, not
# flaky measurements: a quantizer regression (learned cells no longer
# dominating seeded cells, or absolute recall sagging below the floor)
# flips a boolean and hash-fails the gate.
# ---------------------------------------------------------------------------

# Floor for avg recall@5 of learned-quantizer IVF at nprobe=1.
# Measured 0.40 (driver corpus) vs 0.30 seeded; 0.25 keeps headroom
# for corpus regeneration while still catching a broken quantizer
# (random cells measure near k_cells^-1 = 0.125).
LEARNED_RECALL_FLOOR = 0.25


def _recall_facts(exact, approximations, extras=None):
    """Query-set x per-approximation hit counts -> one agg row:
    ``nq`` plus ``r_<name>`` mean recall@k per entry (left-joined so
    a query with zero hits still counts as recall 0). The ONE copy of
    the hits/recall machinery the learned-recall and PQ-recall gates
    both run (r15 review: two verbatim closure copies could drift —
    the r9 +eps guard was already applied asymmetrically around
    them).

    r20 shape: the approximations are UNION'd with a source tag and
    hit-counted in ONE join + ONE conditional aggregation instead of
    a join+groupBy chain per approximation (one exchange fewer per
    extra approximation; a per-query zero count equals the old
    NULL-coalesce through the same ``coalesce(.., 0)``). ``extras``
    (name -> single-row aggregate frame) are cross-joined into the
    same plan so the whole gate needs ONE collect — ``train_n`` was
    previously a second action."""
    names = list(approximations)
    tagged = None
    for i, approx in enumerate(approximations.values()):
        t = approx.select("query_id", "vec_id").withColumn(
            "_src", F.lit(i)
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    hits = (
        exact.join(tagged, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(*[
            F.count(F.when(F.col("_src") == i, F.lit(1))).alias(n)
            for i, n in enumerate(names)
        ])
    )

    def recall(name):
        return F.avg(
            F.coalesce(F.col(name), F.lit(0)).cast("double")
            / F.lit(float(TOP_K))
        )

    base = exact.select("query_id").distinct()
    out = base.join(hits, "query_id", "left").agg(
        F.count(F.lit(1)).alias("nq"),
        *[recall(n).alias("r_" + n) for n in names],
    )
    for df in (extras or {}).values():
        out = out.crossJoin(df)
    return out.collect()[0]


def _train_n_agg(spark, sf_dir):
    """Single-row aggregate of the quantizer's row-capped training-
    slice size — the portable fact both recall oracles replay via
    _train_n_oracle_sql. A frame (not a count action) so the gates
    can fold it into the one _recall_facts collect (r20)."""
    return _train_slice(
        read_immutable_parquet(spark, f"{sf_dir}/embeddings.parquet")
    ).agg(F.count(F.lit(1)).alias("tn"))


def q_ann_ivf_learned_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the exact top-k feeds both recall joins plus the query count —
    # the persisted session-level frame (shared with the
    # ann_bruteforce_topk gate) materializes the cross-join once
    exact = _exact_topk(spark, sf_dir).select("query_id", "vec_id")
    learned = ivf_topk_learned(spark, sf_dir, nprobe=1)
    seeded = ivf_topk_nprobe(spark, sf_dir, nprobe=1)

    # ONE job measures both quantizers: query set x hit counts, single
    # final agg (four scalars to the driver). The quantizer's
    # row-capped training-slice size rides in the same action — it is
    # a PORTABLE fact the oracle replays independently (VERDICT r8 #2
    # / r9 #1): the gate thereby pins both the hash-order-LIMIT
    # mechanism and that the cap holds (min(IVF_TRAIN_ROWS, corpus))
    row = _recall_facts(
        exact, {"hl": learned, "hs": seeded},
        extras={"tn": _train_n_agg(spark, sf_dir)},
    )
    r_learned, r_seeded, n_queries = row["r_hl"], row["r_hs"], row["nq"]
    n_train = int(row["tn"])
    # assemble the single-row result as a plan over literals so the
    # driver's collect() re-runs nothing heavy
    return spark.range(1).select(
        F.lit(n_queries).cast("bigint").alias("n_queries"),
        F.lit(TOP_K).cast("int").alias("k"),
        F.lit(int(n_train)).cast("bigint").alias("train_n"),
        # +eps: slice-trained quantizers can TIE the seeded recall
        # exactly (15/50 == 15/50 on the sf0.001 corpus), and the two
        # avg() aggregations sum their doubles in different orders —
        # a strict float >= flipped on pure summation-order noise
        # (r9 review catch; the PQ gate's comparisons already carry
        # this guard)
        F.lit(bool(r_learned >= r_seeded - 1e-9)).alias(
            "learned_ge_seeded"
        ),
        F.lit(bool(r_learned >= LEARNED_RECALL_FLOOR)).alias(
            "learned_above_floor"
        ),
    )


def _train_n_oracle_sql() -> str:
    """DuckDB replay of the row-capped hash-ordered training slice
    size: the same ORDER BY md5 LIMIT N the Spark side runs, so the
    gates' train_n fact pins BOTH the mechanism and the cap."""
    return f"""(SELECT COUNT(*) FROM (
        SELECT vec_id FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        LIMIT {IVF_TRAIN_ROWS}) AS _ts)"""


def _learned_recall_oracle() -> str:
    return f"""
SELECT COUNT(*) AS n_queries,
       {TOP_K} AS k,
       {_train_n_oracle_sql()} AS train_n,
       TRUE AS learned_ge_seeded,
       TRUE AS learned_above_floor
FROM embeddings
WHERE vec_id % {QUERY_STRIDE} = 0
"""


ORACLE_ANN_IVF_LEARNED_RECALL = _learned_recall_oracle()


# ---------------------------------------------------------------------------
# embedding_decontaminate — benchmark decontamination in EMBEDDING
# space: drop corpus vectors whose cosine similarity to ANY benchmark
# vector reaches TAU (the semantic-leakage complement of the n-gram
# `decontaminate` gate — n-gram overlap misses paraphrased eval items;
# embedding similarity catches them). Extension layer (SURVEY §2.10);
# the reference has no vector search at all (TENSOR values are opaque
# payloads, DataType.scala:53-66).
#
# Scale shape: the benchmark side is small BY NATURE (eval suites are
# thousands of items vs a 1e9-document corpus), so it broadcasts; the
# corpus side is one scan — no corpus shuffle. The groupBy(vec_id) max
# collapses map-side (partial aggregation) to <= one row per vector
# per partition before the tiny final exchange. At 100 TB swap the
# broadcast cross join for the IVF cell join (same persisted index the
# ANN family uses) — the threshold contract is unchanged.
#
# Determinism: dot_product is a sequential fold that bit-matches
# DuckDB's list_dot_product on DOUBLE[] casts (functions/vector.py);
# MAX over bit-identical doubles is order-free, so max_bench_cosine
# hash-matches exactly — no rounding needed.
# ---------------------------------------------------------------------------

BENCH_STRIDE = 23    # vec_id % STRIDE == 0 -> held-out benchmark set
DECONTAM_TAU = 0.35  # cosine threshold for semantic contamination


def embedding_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    tau: float = DECONTAM_TAU,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Score each corpus vector's max cosine against the benchmark
    set; ``contaminated`` marks rows at or above ``tau``. Keeps every
    corpus row (callers filter) so the operator doubles as an audit
    report."""

    b = bench.select(
        F.col(vec_col).alias("_b_emb"),
        F.expr(l2_norm_sql(f"`{vec_col}`")).alias("_b_norm"),
    )
    # norms computed once per side BEFORE the join (bit-identical to
    # folding inside the pair expression — same sequential fold — but
    # |corpus| + |bench| folds instead of |corpus| * |bench|)
    cos = _cos_expr(
        f"`{vec_col}`", "_b_emb", "_c_norm", "_b_norm"
    )
    other = [c for c in corpus.columns if c != vec_col]
    return (
        corpus.withColumn("_c_norm", F.expr(l2_norm_sql(f"`{vec_col}`")))
        # LEFT join, not cross: an EMPTY benchmark set must yield every
        # corpus row with a NULL score, not an empty audit report that
        # reads as "nothing contaminated" (review catch)
        .join(F.broadcast(b), F.lit(True), "left")
        .groupBy(*[F.col(c) for c in other])
        .agg(F.max(cos).alias("max_bench_cosine"))
        .withColumn(
            "contaminated",
            F.coalesce(
                F.col("max_bench_cosine") >= F.lit(tau), F.lit(False)
            ),
        )
    )


def q_embedding_decontaminate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = _emb(spark, sf_dir)
    bench = emb.filter((F.col("vec_id") % BENCH_STRIDE) == 0).select(
        "embedding"
    )
    corpus = emb.filter((F.col("vec_id") % BENCH_STRIDE) != 0).select(
        "vec_id", "label", "embedding"
    )
    return embedding_decontaminate(corpus, bench)


ORACLE_EMBEDDING_DECONTAMINATE = f"""
WITH bench AS (
  SELECT embedding FROM embeddings WHERE vec_id % {BENCH_STRIDE} = 0
),
corpus AS (
  SELECT vec_id, label, embedding FROM embeddings
  WHERE vec_id % {BENCH_STRIDE} != 0
),
scored AS (
  SELECT c.vec_id, c.label,
    MAX(CASE WHEN (sqrt(list_dot_product(c.embedding::DOUBLE[],
                                         c.embedding::DOUBLE[]))
               * sqrt(list_dot_product(b.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]))) > 0
        THEN list_dot_product(c.embedding::DOUBLE[], b.embedding::DOUBLE[])
        / (sqrt(list_dot_product(c.embedding::DOUBLE[],
                                 c.embedding::DOUBLE[]))
           * sqrt(list_dot_product(b.embedding::DOUBLE[],
                                   b.embedding::DOUBLE[])))
        END)
      AS max_bench_cosine
  FROM corpus c CROSS JOIN bench b
  GROUP BY c.vec_id, c.label
)
SELECT vec_id, label, max_bench_cosine,
       COALESCE(max_bench_cosine >= {DECONTAM_TAU}, FALSE)
         AS contaminated
FROM scored
"""


# ---------------------------------------------------------------------------
# ivf_search — the END-USER search call: top-k cosine neighbors from
# the stored (and delta-grown) index for ARBITRARY query vectors, not
# just corpus-derived ones. The gates pin the probe plan's semantics;
# this is the surface a RAG/labeling pipeline actually calls.
# ---------------------------------------------------------------------------


def ivf_search(
    spark: SparkSession,
    sf_dir: str,
    queries: DataFrame,
    k: int = TOP_K,
    nprobe: int = 1,
    centroids: list[list[float]] | None = None,
    id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, cosine, rank) — each query probes its
    ``nprobe`` nearest cells of the persisted index and re-ranks
    exactly inside them. Query side is broadcast (queries are small by
    nature); the corpus side is the one stored cell-partitioned table,
    so cost scales with probed cells, never the corpus.

    Query vectors must match the index dimensionality (``zip_with``
    folds truncate to the shorter array, so a wrong-dim query would
    silently score a prefix — keep query embeddings the same width as
    the corpus')."""

    if k < 1 or nprobe < 1:
        raise ValueError("k and nprobe must be >= 1")
    emb = _ivf_corpus(spark, sf_dir, centroids)
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("embedding"),
        )
        .withColumn(
            "_cells", F.slice(_cell_ranking_col(centroids), 1, nprobe)
        )
        .withColumn("q_norm", F.expr(l2_norm_sql("embedding")))
        .select(
            "query_id",
            F.col("embedding").alias("q_emb"),
            "q_norm",
            F.explode("_cells").alias("q_cell"),
        )
    )
    cos = _cos_expr("q_emb", "embedding", "q_norm", "norm")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        emb.join(F.broadcast(q), F.col("cell") == F.col("q_cell"))
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# IVF-PQ — product-quantized ANN, the memory side of the 100 TB story.
# IVF prunes WHICH vectors a query touches (cells); PQ shrinks WHAT is
# read per vector: each unit-normalized embedding becomes PQ_M 1-byte
# codewords (PQ_K<=256), a 32x reduction vs 64 float32 dims — the
# difference between an index that fits executor memory and one that
# doesn't. Jegou et al., "Product Quantization for Nearest Neighbor
# Search" (TPAMI 2011) is the public formulation; everything here is
# its relational rendering:
#
#   * train: per-subspace k-means (functions/clustering.kmeans — the
#     same deterministic Lloyd used by the IVF quantizer) over the
#     unit vectors' PQ_M slices; codebooks are tiny (M*K*(D/M) floats)
#     and persist beside the IVF artifacts through the FS connector.
#   * encode: Arrow-batched numpy argmin per subspace -> array<int>
#     codes; a one-off write-side job, like the cell assignment.
#   * search (ADC): per query build the M x K lookup table of
#     subvector inner products, broadcast it with the query, and
#     score candidates JVM-side: zip_with(codes, lut)[m] =
#     lut[m][code_m], aggregate-summed — no Python in the per-
#     candidate hot path, cost O(M) per candidate vs O(D) exact.
#
# Ranking uses the asymmetric inner-product estimate sum_m <q_m,
# c_{m,code}> against the unit-normalized corpus — the standard
# cosine-ANN arrangement (query norm is rank-invariant).
# ---------------------------------------------------------------------------

PQ_M = 16           # subspaces (EMB_DIM/PQ_M dims each)
PQ_K = 16           # codewords per subspace
PQ_TRAIN_ITERS = 4
# m=16/k=16 (16 bytes/vector, 16x vs float32) chosen by measurement:
# m=8/k=16 at a 40-item shortlist lost 16 recall points at sf0.1 as
# cells grew — finer subspaces + a 16k-item shortlist track the
# uncompressed nprobe=2 recall within 0.01 at BOTH sf0.01 and sf0.1


def _pq_disk_key(sf_dir: str, m: int, k: int, train_iters: int) -> list:
    # "pq-v3" = row-capped hash-ordered training set (the cap in the
    # key) — a stored v2 pct-slice codebook must not mask the change
    return [
        "pq-v3", _corpus_fingerprint(sf_dir), m, k, train_iters,
        IVF_TRAIN_ROWS,
    ]


def _pq_books_path(sf_dir: str, m: int, k: int, train_iters: int) -> str:
    return os.path.join(
        _index_root(), "pq",
        _index_tag(_pq_disk_key(sf_dir, m, k, train_iters)) + ".json",
    )


def train_pq_codebooks(
    spark: SparkSession,
    sf_dir: str,
    m: int = PQ_M,
    k: int = PQ_K,
    train_iters: int = PQ_TRAIN_ITERS,
) -> list:
    """Per-subspace codebooks [m][k][d/m] trained on the unit-
    normalized row-capped training slice (``_train_slice``); persisted
    keyed on (algorithm version, corpus fingerprint, m, k, iters, row
    cap) like the IVF quantizer, so a fresh process loads instead of
    retraining (deterministic either way)."""
    from quebic_spark.functions.clustering import kmeans
    from quebic_spark.sources.io import (
        fs_read_json_path,
        fs_write_json_path,
    )

    disk_key = _pq_disk_key(sf_dir, m, k, train_iters)
    path = _pq_books_path(sf_dir, m, k, train_iters)
    stored = fs_read_json_path(spark, path)
    if stored is not None and stored.get("key") == disk_key:
        return stored["codebooks"]

    emb = _train_slice(read_immutable_parquet(spark, f"{sf_dir}/embeddings.parquet"))
    norm = F.expr(l2_norm_sql("embedding"))
    # the slice arrives as one bounded partition (<= IVF_TRAIN_ROWS
    # rows, TakeOrderedAndProject output) — no coalesce needed
    unit = emb.select(
        F.transform(F.col("embedding"), lambda x: x / norm).alias("u")
    ).cache()
    d_sub = EMB_DIM // m
    books = []
    try:
        for i in range(m):
            sub = unit.select(
                F.slice(F.col("u"), i * d_sub + 1, d_sub).alias("sub")
            )
            _, cents, _ = kmeans(sub, "sub", k, max_iters=train_iters)
            books.append([[float(x) for x in c] for c in cents])
    finally:
        unit.unpersist(blocking=False)
    fs_write_json_path(
        spark, path, {"key": disk_key, "codebooks": books}
    )
    return books


def pq_encode(vectors: DataFrame, codebooks: list) -> DataFrame:
    """Adds ``codes`` (array<int>, one codeword id per subspace) for a
    (vec_id, embedding) frame — embedding is unit-normalized in-batch
    before encoding. Arrow-batched numpy: one (B, K) distance matrix
    per subspace per batch, argmin'd column-wise."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]

    def _encode(col):  # (pd.Series) -> pd.Series; hints omitted —
        # string annotations from __future__ break pandas_udf inference
        mat = np.asarray(list(col), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        mat = mat / norms
        codes = np.empty((mat.shape[0], m), dtype=np.int32)
        for i in range(m):
            sub = mat[:, i * d_sub:(i + 1) * d_sub]
            # ||x - c||^2 = ||x||^2 - 2<x,c> + ||c||^2; row argmin is
            # unaffected by ||x||^2
            d2 = -2.0 * sub @ books[i].T + (books[i] ** 2).sum(axis=1)
            codes[:, i] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    # non-decorator form: under `from __future__ import annotations`
    # the decorator would see unresolvable string hints
    encode = pandas_udf(_encode, "array<int>")
    return vectors.withColumn("codes", encode(F.col("embedding")))


# Stored PQ codes — the code side of the IVF-PQ index is a TABLE, not
# a per-query derivation (VERDICT r7/r8 #1): (vec_id, cell, codes)
# parquet partitioned by cell, living beside the cell-partitioned
# corpus. The base corpus is encoded ONCE (first compressed search, or
# index build); each committed delta generation is encoded once at
# append-commit (or lazily on first read for codebook configs trained
# later). Search then reads PQ_M bytes per vector from this table and
# touches raw embeddings only for the rerank shortlist — the
# 16x-smaller-reads win the operator exists for.
_PQ_CODES_CACHE: dict[tuple, DataFrame] = {}


def _pq_codes_root(
    sf_dir: str,
    centroids: list[list[float]] | None,
    m: int,
    k: int,
    train_iters: int,
) -> str:
    # keyed by the IVF index identity (corpus fingerprint + quantizer,
    # via _ivf_disk_path) AND the codebook identity — new codebooks or
    # a new training-row cap get a fresh codes table
    return (
        _ivf_disk_path(sf_dir, centroids)
        + "_pqcodes_"
        + _index_tag(_pq_disk_key(sf_dir, m, k, train_iters)[2:])
    )


def _encode_component(
    spark: SparkSession, src_path: str, books: list, dst_path: str
) -> None:
    """Encode one committed IVF component (base table or one delta
    generation) into a codes table, committed via stage+rename like
    every index artifact. Components are immutable once committed, so
    presence of ``dst_path/_SUCCESS`` means done — idempotent.

    Two encoders CAN race on one component (the appender's eager
    commit-time encode vs another process's lazy first-read encode),
    so the stage dir is writer-unique and publication is a
    rename-if-absent: the first rename wins, any loser discards its
    own stage. No delete-first step anywhere — a loser can never yank
    the winner's committed files out from under a concurrent reader
    (r9 review catch: an exists-check before a delete-then-rename
    still left that TOCTOU window). Encoding is deterministic, so
    whichever writer lands produces identical bytes."""
    import uuid

    from quebic_spark.sources.io import (
        fs_delete,
        fs_exists,
        fs_rename_aside,
        fs_rename_if_absent,
    )

    done = os.path.join(dst_path, "_SUCCESS")
    if fs_exists(spark, done):
        return
    # dst existing WITHOUT _SUCCESS is *probably* a crashed partial
    # publish (possible where rename degrades to copy+delete) — but a
    # RACING encoder can complete its publish between that observation
    # and any repair, so an in-place delete here could yank a winner's
    # fully committed table out from under a reader that already
    # passed its _SUCCESS gate (r10 advice). Repair via atomic
    # rename-ASIDE instead: move dst to a writer-unique quarantine
    # name (no delete of a live path, ever), then inspect what was
    # captured — if the quarantine holds a _SUCCESS it was a completed
    # publish landing in the window, so republish it unchanged;
    # otherwise it really was a crashed partial, delete the (now
    # unreachable-by-readers) quarantine. A failed rename-aside means
    # another repairer or publisher got to dst first; fall through —
    # rename-if-absent below stays correct in both cases.
    if fs_exists(spark, dst_path):
        quarantine = dst_path + ".quarantine-" + uuid.uuid4().hex[:8]
        if fs_rename_aside(spark, dst_path, quarantine):
            if fs_exists(spark, os.path.join(quarantine, "_SUCCESS")):
                if not fs_rename_if_absent(spark, quarantine, dst_path):
                    # someone republished meanwhile — identical bytes
                    # by determinism; discard the duplicate copy
                    fs_delete(spark, quarantine)
                return
            fs_delete(spark, quarantine)
    src = spark.read.parquet(src_path).select(
        "vec_id", "embedding", F.col("cell").cast("int").alias("cell")
    )
    coded = pq_encode(src, books).select("vec_id", "cell", "codes")
    tmp = dst_path + ".tmp-" + uuid.uuid4().hex[:8]
    coded.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(tmp)
    if not fs_rename_if_absent(spark, tmp, dst_path):
        fs_delete(spark, tmp)  # lost the race — winner's bytes are
        # identical by determinism; nothing to publish


def _pq_codes(
    spark: SparkSession,
    sf_dir: str,
    books: list,
    m: int,
    k_codes: int,
    train_iters: int = PQ_TRAIN_ITERS,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(vec_id, cell, codes) for the whole index (base + committed
    deltas), read from the stored codes table — encoding runs only for
    components not yet on disk. Memoized per (session, index identity,
    codebook identity) and persist()ed like the IVF corpus."""
    from quebic_spark.sources.io import fs_exists

    cent_key = (
        "seeded" if centroids is None
        else tuple(tuple(c) for c in centroids)
    )
    disk_path = _ivf_disk_path(sf_dir, centroids)
    deltas = tuple(_read_delta_manifest(spark, disk_path)["deltas"])
    key = (
        spark.sparkContext.applicationId, sf_dir, cent_key, deltas,
        m, k_codes, train_iters,
    )
    cached = _PQ_CODES_CACHE.get(key)
    if cached is not None:
        return cached
    _ivf_corpus(spark, sf_dir, centroids)  # ensure the base exists
    croot = _pq_codes_root(sf_dir, centroids, m, k_codes, train_iters)
    base = os.path.join(croot, "base")
    if not fs_exists(spark, os.path.join(base, "_SUCCESS")):
        _encode_component(spark, disk_path, books, base)
    sel = lambda df: df.select(  # noqa: E731 — tiny projection helper
        "vec_id", F.col("cell").cast("int").alias("cell"), "codes"
    )
    out = sel(spark.read.parquet(base))
    for name in deltas:
        dpath = os.path.join(croot, name)
        if not fs_exists(spark, os.path.join(dpath, "_SUCCESS")):
            _encode_component(
                spark,
                os.path.join(_delta_root(disk_path), name),
                books,
                dpath,
            )
        out = out.unionByName(sel(spark.read.parquet(dpath)))
    out = out.persist()
    _PQ_CODES_CACHE[key] = out
    return out


def _pq_lut_udf(codebooks: list):
    """M x K lookup table of <q_m, c_{m,j}> inner products per query
    embedding, as ONE Arrow-batched numpy matmul on the (tiny,
    broadcast) query side — array<array<double>>. Expressing the same
    table as M*K Catalyst fold expressions measured ~5 s of pure
    analysis/codegen overhead per plan; the per-CANDIDATE hot path
    stays JVM-side either way (zip_with + aggregate over this column),
    which is what matters at corpus scale."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    d_sub = books[0].shape[1]

    def _lut(col):  # (pd.Series of array) -> pd.Series of array<array>
        mat = np.asarray(list(col), dtype=np.float64)
        out = []
        for r in range(mat.shape[0]):
            q = mat[r]
            out.append([
                (books[i] @ q[i * d_sub:(i + 1) * d_sub]).tolist()
                for i in range(m)
            ])
        return pd.Series(out)

    return pandas_udf(_lut, "array<array<double>>")


PQ_RERANK = 16 * TOP_K  # ADC shortlist size fed to the exact re-rank


def _pq_rank(
    spark: SparkSession,
    sf_dir: str,
    qbase: DataFrame,
    nprobe: int,
    k: int,
    m: int,
    n_codes: int,
    rerank: int | None,
    exclude_self: bool,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Shared IVF-PQ ranking core: ``qbase`` carries (query_id,
    embedding, norm). ADC-score the probed cells' STORED codes
    (``_pq_codes`` — search never re-encodes the corpus), optionally
    exact-rerank the top-R fetched by vec_id. ``centroids`` selects
    which coarse quantizer's index to search (default: seeded cells;
    pass ``learned_centroids(...)`` for the trained index — the PQ
    codebooks are quantizer-independent, only cell routing changes)."""
    books = train_pq_codebooks(spark, sf_dir, m=m, k=n_codes)
    coded = _pq_codes(
        spark, sf_dir, books, m, n_codes, centroids=centroids
    )

    queries = (
        qbase
        .withColumn("probe_cells", _cell_ranking_col(centroids))
        .select(
            "query_id",
            F.col("norm").alias("q_norm"),
            _pq_lut_udf(books)(F.col("embedding")).alias("lut"),
            F.explode(
                F.slice(F.col("probe_cells"), 1, nprobe)
            ).alias("q_cell"),
        )
    )
    # one parsed expression (r20): same fold, no per-lambda py4j cost
    adc = F.expr(
        "aggregate(zip_with(codes, lut, "
        "(c, row) -> element_at(row, c + 1)), "
        "0.0D, (acc, x) -> acc + x)"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    cond = F.col("cell") == F.col("q_cell")
    if exclude_self:
        cond = cond & (F.col("vec_id") != F.col("query_id"))
    scored = coded.join(F.broadcast(queries), cond)
    if rerank is None:
        return (
            scored.select("query_id", "vec_id", adc.alias("score"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    # shortlist on the compressed representation — the ADC window
    # shuffles only (query_id, vec_id, score), never vectors — then
    # FETCH the R survivors' full rows by vec_id and exact-rank them.
    # The shortlist is <= R*n_queries rows by construction, so it
    # broadcasts: the raw-embedding fetch is one broadcast-hash probe
    # over the stored corpus, never a shuffle of vector bytes (at
    # scale the stored table is id-sorted/bucketed and this becomes a
    # point-lookup fetch).
    shortlist = (
        scored.select("query_id", "vec_id", adc.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= rerank)
        .select("query_id", "vec_id")
    )
    qside = qbase.select(
        "query_id",
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    exact = _cos_expr("q_emb", "embedding", "q_norm", "norm")
    emb = _ivf_corpus(spark, sf_dir, centroids)
    return (
        F.broadcast(shortlist)
        .join(emb.select("vec_id", "embedding", "norm"), "vec_id")
        .join(F.broadcast(qside), "query_id")
        .select("query_id", "vec_id", exact.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_pq_topk(
    spark: SparkSession,
    sf_dir: str,
    nprobe: int = 2,
    k: int = TOP_K,
    m: int = PQ_M,
    n_codes: int = PQ_K,
    rerank: int | None = PQ_RERANK,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(query_id, vec_id, score, rank): IVF cell pruning + PQ ADC
    shortlisting (+ optional exact re-rank) for the corpus-derived
    stride query set. The candidate side reads (vec_id, cell, codes)
    — at scale a stored table PQ_M bytes/vector instead of the raw
    embeddings — and ADC scoring touches no Python and no full
    vectors.

    ``rerank=R`` is the production IVFPQ+R arrangement: ADC keeps the
    top R per query (compressed scan, cheap), then ONLY those R rows'
    full vectors are fetched for exact cosine ranking — measured here
    the rerank tier tracks the uncompressed nprobe=2 recall within
    0.01 at sf0.01 AND sf0.1 while full-vector reads drop from every
    candidate to R per query. ``rerank=None`` returns raw ADC order
    (score = asymmetric inner product estimate)."""
    emb = _ivf_corpus(spark, sf_dir, centroids)
    qbase = emb.filter((F.col("vec_id") % QUERY_STRIDE) == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "norm"
    )
    return _pq_rank(
        spark, sf_dir, qbase, nprobe, k, m, n_codes, rerank,
        exclude_self=True, centroids=centroids,
    )


def ivf_pq_search(
    spark: SparkSession,
    sf_dir: str,
    queries: DataFrame,
    k: int = TOP_K,
    nprobe: int = 2,
    rerank: int | None = PQ_RERANK,
    id_col: str = "query_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """ARBITRARY query vectors against the compressed index — the PQ
    twin of :func:`ivf_search` (same contract: queries must match the
    index dimensionality). Scoring cost per candidate is O(PQ_M)
    lookups instead of O(dim) multiplies, and only the reranked
    shortlist touches full vectors. ``centroids`` routes against that
    quantizer's stored index (e.g. ``learned_centroids(...)`` — r9:
    the compressed path serves the trained index too, not only the
    seeded one)."""

    if k < 1 or nprobe < 1:
        raise ValueError("k and nprobe must be >= 1")
    qbase = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("embedding"),
    ).withColumn("norm", F.expr(l2_norm_sql("embedding")))
    return _pq_rank(
        spark, sf_dir, qbase, nprobe, k, PQ_M, PQ_K, rerank,
        exclude_self=False, centroids=centroids,
    )


PQ_RECALL_FLOOR = 0.4      # absolute, vs exact top-k (measured 0.46-0.48)
PQ_RETAIN_FRACTION = 0.9   # of the UNCOMPRESSED nprobe=2 recall


def q_ann_ivf_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-component gate (same discipline as
    ann_ivf_learned_recall): portable facts the oracle replays
    (query count, k, training-slice size, compression ratio) +
    in-plan contract booleans (PQ recall above its floor, PQ
    at-or-below the uncompressed nprobe=2 recall — compression can
    only lose information — and, r9, the READ-PATH contract: the
    compressed search plan scans the stored codes table and contains
    no corpus-encode node, pinning VERDICT r8 #1 at the driver
    level)."""
    exact = _exact_topk(spark, sf_dir).select("query_id", "vec_id")
    pq = ivf_pq_topk(spark, sf_dir, nprobe=2)
    pq_plan = pq._jdf.queryExecution().executedPlan().toString()
    reads_stored_codes = (
        "pqcodes" in pq_plan and "_encode(" not in pq_plan
    )
    raw = ivf_topk_nprobe(spark, sf_dir, nprobe=2)

    row = _recall_facts(
        exact, {"hp": pq, "hr": raw},
        extras={"tn": _train_n_agg(spark, sf_dir)},
    )
    bytes_raw = EMB_DIM * 4
    n_train = int(row["tn"])
    return spark.range(1).select(
        F.lit(int(row["nq"])).cast("bigint").alias("n_queries"),
        F.lit(TOP_K).cast("int").alias("k"),
        F.lit(int(n_train)).cast("bigint").alias("train_n"),
        F.lit(bytes_raw // PQ_M).cast("int").alias("compression_x"),
        F.lit(bool(row["r_hp"] >= PQ_RECALL_FLOOR)).alias(
            "pq_above_floor"
        ),
        F.lit(bool(row["r_hp"] <= row["r_hr"] + 1e-9)).alias(
            "pq_le_uncompressed"
        ),
        # the dial PQ actually controls: the compressed shortlist must
        # retain (almost) all of the recall the probed cells offer —
        # independent of how good the quantizer itself is
        F.lit(
            bool(row["r_hp"] >= PQ_RETAIN_FRACTION * row["r_hr"] - 1e-9)
        ).alias("pq_retains_cell_recall"),
        F.lit(bool(reads_stored_codes)).alias("reads_stored_codes"),
    )


def _pq_recall_oracle() -> str:
    return f"""
SELECT COUNT(*) AS n_queries,
       {TOP_K} AS k,
       {_train_n_oracle_sql()} AS train_n,
       {EMB_DIM * 4 // PQ_M} AS compression_x,
       TRUE AS pq_above_floor,
       TRUE AS pq_le_uncompressed,
       TRUE AS pq_retains_cell_recall,
       TRUE AS reads_stored_codes
FROM embeddings
WHERE vec_id % {QUERY_STRIDE} = 0
"""


ORACLE_ANN_IVF_PQ_RECALL = _pq_recall_oracle()


# ---------------------------------------------------------------------------
# diversity_sample — D4-style diversity selection (Tirumala et al.
# 2023, "D4: Improving LLM Pretraining via Document De-Duplication and
# Diversification"): after dedup, the most PROTOTYPICAL points of each
# embedding cluster (nearest their centroid — templated/boilerplate
# mass) are dropped and the diverse tail kept, under a per-cell budget.
# Extension layer (SURVEY §2.10); the reference has no vector ops at
# all (TENSOR payloads are opaque, DataType.scala:53-66).
#
# Scale shape: reuses the SAME stored cell-partitioned corpus as the
# whole IVF family (the learned k-means cells ARE the D4 clusters), so
# selection is ONE cell-keyed exchange with the rank and cell-count
# windows sharing it (the keep_best discipline) — no joins, no driver
# data. Centroid lookup is a scan-resident array-of-arrays literal
# indexed by the cell id, not a join. At 100 TB each cell sorts
# independently; skew is bounded by the quantizer's balance, the same
# property the probe path already relies on.
#
# Determinism: the budget is integer arithmetic (ceil(pct*n/100) as
# (pct*n + 99) div 100 — float ceil(0.8*5) can land on 5 via binary
# representation), ordering ties break on vec_id, and prototypicality
# is the same fold dot product the recall gates pin.
# ---------------------------------------------------------------------------

DIVERSITY_KEEP_PCT = 80


def _rank_by_prototypicality(
    frame: DataFrame,
    id_col: str,
    cents: list[list[float]],
    keep_pct: int,
) -> DataFrame:
    """THE D4 ranking core, shared by the gate path
    (:func:`_diversity_ranked`) and the pipeline stage
    (:func:`diversity_filter`) so the two can never drift (r13
    review: ~35 duplicated expression lines). ``frame`` carries
    (id_col, embedding, cell, norm); output adds (proto_sim, cell_n,
    _rk, cell_keep) over ONE cell-keyed exchange carrying both
    windows, centroid lookup as a scan-resident array literal.

    cell_keep is ceil(cell_n * keep_pct / 100) via integral ``div``
    (r13 review: the previous ``/ 100`` was double division with a
    truncating cast — exact only below 2^53, and not the integer
    arithmetic the contract documents)."""
    cent_lookup = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")"
            for c in cents
        )
        + ")"
    )
    sim = (
        dot_product(
            F.col("embedding"),
            F.element_at(cent_lookup, F.col("cell").cast("int") + 1),
        )
        / F.when(F.col("norm") > 0, F.col("norm")).otherwise(F.lit(1.0))
    )
    w_cell = Window.partitionBy("cell")
    w_rank = Window.partitionBy("cell").orderBy(
        F.col("proto_sim").asc(), F.col(id_col).asc()
    )
    scored = frame.select(
        id_col,
        F.col("cell").cast("int").alias("cell"),
        sim.alias("proto_sim"),
    )
    return scored.select(
        "*",
        F.count(F.lit(1)).over(w_cell).alias("cell_n"),
        F.row_number().over(w_rank).alias("_rk"),
    ).withColumn(
        "cell_keep",
        F.expr(f"(cell_n * {int(keep_pct)} + 99) div 100"),
    )


def _diversity_ranked(
    spark: SparkSession,
    sf_dir: str,
    keep_pct: int,
    centroids: list[list[float]] | None,
) -> DataFrame:
    """Shared core: every corpus vector with (proto_sim, cell_n,
    cell_keep, _rk) — ONE cell-keyed exchange carrying both windows.
    ``diversity_sample`` filters it; the gate aggregates it directly
    so the contract booleans cost one pass, not three."""
    if not 0 < keep_pct <= 100:
        raise ValueError(f"keep_pct must be in (0, 100], got {keep_pct}")
    cents = (
        centroids if centroids is not None
        else learned_centroids(spark, sf_dir)
    )
    corpus = _ivf_corpus(spark, sf_dir, cents)
    return _rank_by_prototypicality(corpus, "vec_id", cents, keep_pct)


def diversity_sample(
    spark: SparkSession,
    sf_dir: str,
    keep_pct: int = DIVERSITY_KEEP_PCT,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Per-cell diversity selection: keep the ``keep_pct``% LEAST
    prototypical vectors of every cell (ascending cosine-to-centroid,
    vec_id tie-break). Returns (vec_id, cell, proto_sim, cell_n,
    cell_keep)."""
    ranked = _diversity_ranked(spark, sf_dir, keep_pct, centroids)
    return ranked.filter(F.col("_rk") <= F.col("cell_keep")).drop("_rk")


def diversity_filter(
    docs: DataFrame,
    embeddings: DataFrame,
    keep_pct: int = DIVERSITY_KEEP_PCT,
    centroids: list[list[float]] | None = None,
    id_col: str = "doc_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Composable D4 diversity stage for pipelines: per quantizer
    cell, keep the ``keep_pct``% LEAST prototypical members
    (ascending cosine-to-centroid, id tie-break) and prune ``docs``
    accordingly.

    Same selection semantics and plan shape as
    :func:`diversity_sample` — ONE cell-keyed exchange carrying both
    the rank and cell-count windows, centroid lookup as a
    scan-resident array literal — but over a caller-provided
    ``(id, embedding)`` DataFrame so it slots into
    :func:`quebic_spark.pipeline.release_corpus` after dedup, the way
    the classifier tier does. The prune is ONE anti-join against the
    dropped ids (the decontaminate stage's shape): docs without an
    embedding row are never in the dropped set, so they pass through
    unfiltered — diversity only prunes what it can see. At 100 TB the
    embedding table is the stored index layout, not a recompute.

    ``centroids`` defaults to the seeded quantizer (EMB_DIM-sized);
    pass trained centroids (e.g. :func:`learned_centroids`) when the
    embedding dimension or corpus calls for them.
    """

    if not 0 < keep_pct <= 100:
        raise ValueError(f"keep_pct must be in (0, 100], got {keep_pct}")
    cents = centroids if centroids is not None else _centroids()
    dots, cell = _cell_col(cents)
    emb = (
        embeddings.select(
            F.col(id_col).alias("_div_id"),
            F.col(embedding_col).alias("embedding"),
        )
        .select("_div_id", "embedding", *dots)
        .withColumn("cell", cell)
        .withColumn("norm", F.expr(l2_norm_sql("embedding")))
    )
    ranked = _rank_by_prototypicality(emb, "_div_id", cents, keep_pct)
    dropped = ranked.filter(F.col("_rk") > F.col("cell_keep")).select(
        F.col("_div_id").alias(id_col)
    )
    return docs.join(dropped, id_col, "left_anti")


def q_diversity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-component gate (the semantic_dedup discipline): cells
    are data-dependent so DuckDB cannot replay the selection — the
    gate emits portable facts (corpus size, keep_pct) plus in-plan
    contract booleans the oracle states as literals:

    * budget_floor / budget_cap — total kept is the per-cell ceil sum,
      which must land in [ceil(pct*n/100), ceil(pct*n/100)+k_cells]
      (sum-of-ceils bounds; a busted window or filter breaks it);
    * per_cell_exact — EVERY cell keeps exactly its own
      ceil(pct*cell_n/100) rows;
    * keeps_diverse_tail — in every cell the most prototypical KEPT
      row is no more prototypical than the least prototypical DROPPED
      row (the selection actually took the diverse tail).
    """
    cents = learned_centroids(spark, sf_dir)
    ranked = _diversity_ranked(
        spark, sf_dir, DIVERSITY_KEEP_PCT, cents
    )
    kept_flag = F.col("_rk") <= F.col("cell_keep")
    # ONE aggregation over the single ranked pass yields every
    # quantity the contract needs (k_cells rows to the driver)
    per_cell = (
        ranked.groupBy("cell", "cell_n", "cell_keep")
        .agg(
            F.count(F.when(kept_flag, 1)).alias("n_kept"),
            F.max(F.when(kept_flag, F.col("proto_sim"))).alias(
                "max_kept_sim"
            ),
            F.min(F.when(~kept_flag, F.col("proto_sim"))).alias(
                "min_dropped_sim"
            ),
        )
        .collect()
    )
    n_corpus = sum(r["cell_n"] for r in per_cell)
    k_cells = len(cents)
    floor_total = (n_corpus * DIVERSITY_KEEP_PCT + 99) // 100
    total_kept = sum(r["n_kept"] for r in per_cell)
    per_cell_exact = all(r["n_kept"] == r["cell_keep"] for r in per_cell)
    # cells fully kept have no dropped rows (min_dropped_sim NULL) and
    # satisfy the tail contract vacuously
    keeps_tail = all(
        r["min_dropped_sim"] is None
        or r["max_kept_sim"] <= r["min_dropped_sim"] + 1e-9
        for r in per_cell
    )
    return spark.range(1).select(
        F.lit(int(n_corpus)).cast("bigint").alias("n_corpus"),
        F.lit(DIVERSITY_KEEP_PCT).cast("int").alias("keep_pct"),
        F.lit(bool(total_kept >= floor_total)).alias("budget_floor"),
        F.lit(
            bool(total_kept <= floor_total + k_cells)
        ).alias("budget_cap"),
        F.lit(bool(per_cell_exact)).alias("per_cell_exact"),
        F.lit(bool(keeps_tail)).alias("keeps_diverse_tail"),
    )


ORACLE_DIVERSITY_SAMPLE = f"""
SELECT COUNT(*) AS n_corpus,
       {DIVERSITY_KEEP_PCT} AS keep_pct,
       TRUE AS budget_floor,
       TRUE AS budget_cap,
       TRUE AS per_cell_exact,
       TRUE AS keeps_diverse_tail
FROM embeddings
"""


QUERIES = {
    "embedding_decontaminate": q_embedding_decontaminate,
    "ann_bruteforce_topk": q_ann_bruteforce_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivf_nprobe2": q_ann_ivf_nprobe2,
    "ann_ivf_learned_recall": q_ann_ivf_learned_recall,
    "ann_ivf_pq_recall": q_ann_ivf_pq_recall,
    "embedding_label_stats": q_embedding_label_stats,
    "diversity_sample": q_diversity_sample,
}

ORACLES = {
    "diversity_sample": ORACLE_DIVERSITY_SAMPLE,
    "embedding_decontaminate": ORACLE_EMBEDDING_DECONTAMINATE,
    "ann_bruteforce_topk": ORACLE_ANN_BRUTEFORCE_TOPK,
    "ann_lsh_topk": ORACLE_ANN_LSH_TOPK,
    "ann_ivf_topk": ORACLE_ANN_IVF_TOPK,
    "ann_ivf_nprobe2": ORACLE_ANN_IVF_NPROBE2,
    "ann_ivf_learned_recall": ORACLE_ANN_IVF_LEARNED_RECALL,
    "ann_ivf_pq_recall": ORACLE_ANN_IVF_PQ_RECALL,
    "embedding_label_stats": ORACLE_EMBEDDING_LABEL_STATS,
}
