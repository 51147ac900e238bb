"""End-to-end corpus release: the terminal composition a training-data
team actually ships, as ONE Catalyst DAG feeding one terminal write.

    score -> per-source percentile filter -> keep-best dedup
          -> benchmark decontamination -> sharded release artifact

Every stage is the already-oracle-checked library op (textops /
dedup / sources); composing them declaratively means Catalyst sees the
whole lineage — filters fold into the scan, the dedup window and the
shard repartition are the only wide exchanges, and nothing
materializes until the write. The released rows carry their
provenance columns (quality_score, content_key, n_copies) so a
downstream loader can audit selection decisions without re-deriving
them.
"""

from __future__ import annotations

import logging
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DECON_NGRAM = 8

log = logging.getLogger(__name__)


def quality_score_col(text_col: str = "text") -> Column:
    """The doc_quality composite (distinct-token ratio + length), the
    same expression the ``doc_quality`` / ``dedup_keep_best`` gates
    hash-match against DuckDB — delegated to the canonical
    ``textops.quality_exprs`` definition."""
    from quebic_spark.operators.textops import quality_exprs

    return quality_exprs(text_col)["score"]


def contaminated_doc_ids(
    docs: DataFrame,
    bench_docs: DataFrame,
    text_col: str = "text",
    ngram: int = DECON_NGRAM,
    max_shared_grams: int = 0,
) -> DataFrame:
    """doc_ids sharing more than ``max_shared_grams`` distinct n-grams
    with the benchmark set (broadcast bench-gram join — the benchmark
    side is always tiny relative to the corpus)."""
    from quebic_spark.functions.text import shingles

    grams = docs.select(
        "doc_id", F.explode(shingles(F.col(text_col), ngram)).alias("g")
    )
    bench = F.broadcast(
        bench_docs.select(
            F.explode(shingles(F.col(text_col), ngram)).alias("g")
        ).distinct()
    )
    return (
        grams.join(bench, "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared"))
        .filter(F.col("n_shared") > max_shared_grams)
        .select("doc_id")
    )


def release_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_path: str,
    n_shards: int,
    quality_cut_pct: float = 0.2,
    bench_docs: DataFrame | None = None,
    order_by: Sequence[str] = ("doc_id",),
    fmt: str = "parquet",
    quality_model=None,
    min_model_prob: float = 0.5,
    media_payloads: DataFrame | None = None,
    normalize_unicode: str | None = None,
    diversity_embeddings: DataFrame | None = None,
    diversity_keep_pct: int | None = None,
    diversity_centroids: Sequence[Sequence[float]] | None = None,
    diversity_id_col: str = "doc_id",
    diversity_embedding_col: str = "embedding",
) -> dict:
    """Run the full release pipeline and write the sharded artifact.

    Stages: (0) if ``normalize_unicode`` names a form ("NFC"/"NFKC"),
    normalize the text column FIRST — decomposed and composed copies
    of the same text are different bytes, so normalization must
    precede every content-key derivation below or those duplicates
    slip through (opt-in: the driver corpus is ASCII and the release
    gate hash predates the stage);
    (1) score every doc with :func:`quality_score_col`;
    (2) drop the worst ``quality_cut_pct`` of each source
    (:func:`quality_percentile_filter` — count-based, small sources
    never wiped); (2b) if a trained ``quality_model``
    (:class:`operators.classifier.QualityModel`) is given, drop docs
    it scores below ``min_model_prob`` — the model tier rides the
    same scan as the heuristics because classifier scoring is a pure
    column expression (zero extra shuffles); (3) keep the best-quality
    canonical per bag-of-words content key (:func:`keep_best`);
    (3b) if ``diversity_embeddings`` is given, run the D4 diversity
    stage (:func:`operators.similarity.diversity_filter`): per
    quantizer cell keep the ``diversity_keep_pct``% least prototypical
    docs (default: similarity's ``DIVERSITY_KEEP_PCT``, the gated
    knob). ``diversity_id_col``/``diversity_embedding_col`` name the
    columns IN the embeddings frame (defaults ``doc_id``/
    ``embedding``); its ids must be the docs' ``doc_id`` values — the
    pipeline key every stage joins on. One anti-join against the
    dropped ids; docs without an embedding row pass through;
    (4) if ``bench_docs`` is given, anti-join away documents sharing
    n-grams with it; (5) write the md5-bucket sharded layout with
    manifest (:func:`write_corpus_shards`); (6) if ``media_payloads``
    (doc_id, payload binary) is given, record per-format
    decode/quarantine counts (:func:`operators.multimodal.
    media_decode_stats`) under the manifest's ``media`` key — counts
    cover the payload frame AS GIVEN (r17 sweep: the accounting is
    caller-scoped; pass payloads pre-joined to the released doc ids
    if the key should cover only shipped docs — the pipeline does not
    silently drop payload rows whose doc was filtered, because
    quarantine triage may want exactly those). Returns the write
    manifest.
    """
    from quebic_spark.operators.dedup import _content_key, keep_best
    from quebic_spark.operators.textops import quality_percentile_filter
    from quebic_spark.sources.io import write_corpus_shards

    # reserved-column guard, same convention as the r13 guards in
    # quality_percentile_filter (_rn/_drop) and write_corpus_shards
    # (shard): the pipeline writes quality_score/content_key and
    # keep_best writes rn (dropped) + n_copies — a caller's column of
    # the same name would be silently overwritten or destroyed, and
    # the shipped provenance columns would lie (r14 review)
    reserved = {"quality_score", "content_key", "rn", "n_copies"}
    if quality_model is not None:
        reserved.add("model_prob")
    taken = reserved & set(docs.columns)
    if taken:
        raise ValueError(
            f"input already has reserved column(s) {sorted(taken)} — "
            "drop or rename them before release_corpus"
        )

    if normalize_unicode is not None:
        from quebic_spark.operators.textops import unicode_normalize

        docs = unicode_normalize(docs, form=normalize_unicode)
    scored = docs.withColumn("quality_score", quality_score_col())
    kept = quality_percentile_filter(
        scored, "source", "quality_score", quality_cut_pct
    )
    if quality_model is not None:
        from quebic_spark.operators.classifier import classifier_prob_col

        kept = kept.withColumn(
            "model_prob", classifier_prob_col(quality_model)
        ).filter(F.col("model_prob") >= min_model_prob)
    deduped = keep_best(
        kept.withColumn("content_key", _content_key()),
        "content_key",
        "quality_score",
    )
    if diversity_embeddings is not None:
        from quebic_spark.operators.similarity import (
            DIVERSITY_KEEP_PCT,
            diversity_filter,
        )

        # map the caller's embedding-frame column names onto the
        # pipeline key (docs are keyed doc_id throughout — shards,
        # decontamination, and this anti-join all use it); select()
        # fails loud on a wrong name instead of joining arbitrarily
        emb_in = diversity_embeddings.select(
            F.col(diversity_id_col).alias("doc_id"),
            F.col(diversity_embedding_col).alias("embedding"),
        )
        deduped = diversity_filter(
            deduped,
            emb_in,
            # None -> similarity's canonical knob (the one the D4 gate
            # and diversity_sample use), so retuning it there cannot
            # silently drift from the shipped pipeline (r14 review)
            keep_pct=(DIVERSITY_KEEP_PCT if diversity_keep_pct is None
                      else diversity_keep_pct),
            centroids=(
                [list(c) for c in diversity_centroids]
                if diversity_centroids is not None else None
            ),
        )
    cached = None
    if bench_docs is not None:
        # deduped feeds BOTH the gram derivation and the anti-join left
        # side; column pruning makes the two subtrees differ, defeating
        # ReuseExchange, so the filter+window chain would run twice —
        # materialize once. Unlike the LAZY dedup query functions this
        # is a terminal op (the write below materializes everything),
        # so the handle is released here in finally rather than parked
        # on the caller-side clear_caches contract.
        cached = deduped.cache()
        deduped = cached.join(
            contaminated_doc_ids(cached, bench_docs),
            "doc_id",
            "left_anti",
        )
    try:
        manifest = write_corpus_shards(
            spark, deduped, out_path, n_shards,
            key_col="doc_id", order_by=list(order_by), fmt=fmt,
        )
    finally:
        if cached is not None:
            cached.unpersist(blocking=False)
    if media_payloads is not None:
        # optional multimodal tier: per-format decode/quarantine
        # accounting over the release's binary payloads, recorded in
        # the (re-written, still atomic) manifest so a loader can see
        # what the decode tier would face without re-scanning blobs
        from quebic_spark.operators.multimodal import media_decode_stats
        from quebic_spark.sources.io import (
            CORPUS_MANIFEST_NAME,
            fs_write_json_path,
        )

        manifest["media"] = {
            r["fmt"]: {
                "n_rows": int(r["n_rows"]),
                "n_bytes": int(r["n_bytes"]),
                "quarantined": bool(r["quarantined"]),
            }
            for r in media_decode_stats(media_payloads).collect()
        }
        fs_write_json_path(
            spark, f"{out_path}/{CORPUS_MANIFEST_NAME}", manifest
        )
    return manifest


# ---------------------------------------------------------------------------
# Versioned releases: a registry of immutable release artifacts under
# one root (``v=N`` directories + ``_releases.json``), so a training
# run can pin "corpus release 3" and an audit can ask exactly what
# changed between releases. The registry file is written LAST and
# atomically — its presence marks a complete version, the same
# completeness-marker discipline as the queue's staged commits and the
# LM/classifier artifacts. All registry IO goes through the Hadoop
# FileSystem API so the root may live on an object store or HDFS,
# like the shard manifests.
# ---------------------------------------------------------------------------


def _registry_fs(spark: SparkSession, root: str):
    # one FS dispatch for the whole library (r13 review: this was the
    # third inline copy of the jvm/hadoopConfiguration/Path pattern)
    from quebic_spark.sources.io import hadoop_path

    jvm, fs, rootpath = hadoop_path(spark, root)
    rpath = jvm.org.apache.hadoop.fs.Path(rootpath, "_releases.json")
    return jvm, fs, rpath


_GEN_PREFIX = "_releases.gen-"


def _registry_generations(jvm, fs, root: str) -> list:
    """Committed registry generation files under ``root``, sorted by
    generation number ascending: ``[(n, hadoop Path), ...]``."""
    glob = jvm.org.apache.hadoop.fs.Path(root, _GEN_PREFIX + "*.json")
    try:
        statuses = fs.globStatus(glob)
    except Exception:  # noqa: BLE001 — no dir yet
        statuses = None
    out = []
    if statuses is not None:
        for st in statuses:
            name = st.getPath().getName()
            try:
                n = int(name[len(_GEN_PREFIX):-len(".json")])
            except ValueError:
                continue
            out.append((n, st.getPath()))
    return sorted(out, key=lambda t: t[0])


def _read_registry_generational(jvm, fs, root: str, rpath) -> dict:
    """Non-file-scheme read: newest committed generation file wins;
    fall back to the legacy single-file registry, then empty. An
    update only ADDS a new generation (never deletes or renames the
    current one), so mid-update absence is structurally impossible —
    this replaces the r8 sleep/backoff band-aid, whose 'genuinely
    empty' answer also cost ~1 s of mandatory sleeping (r8 advice).

    The newest generation a reader LISTS can still be pruned before it
    OPENS it when two updates land back-to-back in that window (the
    writer keeps only the previous newest) — on open failure the
    reader re-lists and retries against the then-newest generation
    (r9 review catch; bounded attempts, each guaranteed to see a
    strictly newer generation than the one that vanished). If the
    newest stays unreadable for a PERSISTENT reason (torn bytes from
    an out-of-contract second writer, bad permissions), the reader
    falls back to the previous-newest generation — the pruner retains
    it for readers precisely so a single bad file cannot take the
    registry down (r10 advice); only when that too fails does it
    raise."""
    from quebic_spark.sources.io import fs_read_json

    last_err: Exception | None = None
    gens: list = []
    for _ in range(3):
        gens = _registry_generations(jvm, fs, root)
        if not gens:
            # a populated registry whose generations KEEP vanishing is
            # not "empty" — fail loudly rather than answer wrong
            if last_err is not None:
                raise last_err
            break
        try:
            return fs_read_json(jvm, fs, gens[-1][1])
        except Exception as e:  # noqa: BLE001 — pruned mid-read, or
            # persistently unreadable; re-list decides which
            last_err = e
            continue
    if last_err is not None:
        # newest unreadable on every attempt: stale-but-committed
        # beats raising — serve the retained previous-newest if any,
        # but NEVER silently: a persistently unreadable newest is the
        # contract violation the writer guards against, and a caller
        # acting on stale registry state deserves a signal (r10
        # advice)
        if len(gens) > 1:
            try:
                reg = fs_read_json(jvm, fs, gens[-2][1])
            except Exception:  # noqa: BLE001 — both bad: raise below
                pass
            else:
                log.warning(
                    "release registry: newest generation %s is "
                    "persistently unreadable (%s: %s); serving STALE "
                    "previous generation %s — investigate the newest "
                    "file (torn write from an out-of-contract second "
                    "writer, or permissions)",
                    gens[-1][1], type(last_err).__name__, last_err,
                    gens[-2][1],
                )
                return reg
        raise last_err
    if fs.exists(rpath):  # legacy layout (pre-generation writers)
        return fs_read_json(jvm, fs, rpath)
    return {"versions": []}


def read_release_registry(spark: SparkSession, root: str) -> dict:
    """The registry dict ({"versions": [{"version", "path",
    "manifest"}...]}); empty when no release exists yet."""
    jvm, fs, rpath = _registry_fs(spark, root)
    if fs.getScheme() != "file":
        return _read_registry_generational(jvm, fs, root, rpath)
    from quebic_spark.sources.io import fs_read_json

    # file:// commits via os.replace and has no absent window, so
    # absent here is authoritative
    if not fs.exists(rpath):
        return {"versions": []}
    return fs_read_json(jvm, fs, rpath)


def _write_registry_generational(jvm, fs, root: str, reg: dict) -> None:
    """Non-file-scheme write: commit the registry as a NEW generation
    file (tmp + rename to a fresh name — no delete, no overwrite), so
    a concurrent reader always sees a committed generation: either the
    previous one (until the rename lands) or the new one. Older
    generations are pruned down to the previous newest AFTER the new
    one is committed — a reader that listed just before the flip can
    still open what it saw.

    Single-writer is by contract, but an out-of-contract second
    writer must lose LOUDLY, not corrupt the registry: the stage file
    is writer-UNIQUE (uuid suffix, create with no overwrite — r10
    advice; a fixed tmp name let two racing writers truncate each
    other's bytes so the rename winner could commit a torn JSON), and
    the loser of the rename-to-gen-N race gets an IOError having
    never touched the winner's bytes."""
    import json
    import uuid

    gens = _registry_generations(jvm, fs, root)
    n = (gens[-1][0] + 1) if gens else 1
    gen_path = jvm.org.apache.hadoop.fs.Path(
        root, f"{_GEN_PREFIX}{n}.json"
    )
    tmp = jvm.org.apache.hadoop.fs.Path(
        root, f"{_GEN_PREFIX}{n}.json.tmp-{uuid.uuid4().hex[:8]}"
    )
    out = fs.create(tmp, False)  # unique name — an overwrite here
    # could only ever be hiding a colliding writer
    try:
        out.write(bytearray(json.dumps(reg, indent=2).encode("utf-8")))
    finally:
        out.close()
    if not fs.rename(tmp, gen_path):
        try:  # don't leave the loser's stage file as debris
            fs.delete(tmp, False)
        except Exception:  # noqa: BLE001 — cleanup is best-effort
            pass
        raise IOError(
            f"rename {tmp} -> {gen_path} failed: generation {n} was "
            "committed by a concurrent writer (single-writer contract "
            "violated); this writer's update was NOT applied"
        )
    for _, old in gens[:-1]:
        try:
            fs.delete(old, False)
        except Exception:  # noqa: BLE001 — pruning is best-effort
            pass


def _write_registry(spark: SparkSession, root: str, reg: dict) -> None:
    from quebic_spark.sources.io import fs_write_json

    jvm, fs, rpath = _registry_fs(spark, root)
    if fs.getScheme() == "file":
        fs_write_json(jvm, fs, rpath, reg)  # os.replace — no window
        return
    _write_registry_generational(jvm, fs, root, reg)


def release_versioned(
    spark: SparkSession,
    docs: DataFrame,
    root: str,
    n_shards: int,
    **release_kwargs,
) -> dict:
    """Run :func:`release_corpus` into the next ``v=N`` directory
    under ``root`` and record it in the registry. Returns
    ``{"version": N, "path": ..., "manifest": ...}``.

    Concurrency: on a local root the whole read-version → write-artifact
    → append-registry sequence holds an exclusive flock (the queue's
    cross-process discipline), so two concurrent releases serialize
    instead of both claiming the same version and clobbering each
    other's "immutable" artifact (review catch). Non-file schemes have
    no portable lock primitive — there the registry is single-writer
    by contract (the usual object-store arrangement: one release job
    owns a root)."""
    import contextlib
    import os

    from quebic_spark.queue.storage import FileLock

    _jvm, fs, rpath = _registry_fs(spark, root)
    if fs.getScheme() == "file":
        local_root = rpath.getParent().toUri().getPath()
        os.makedirs(local_root, exist_ok=True)
        lock: contextlib.AbstractContextManager = FileLock(
            os.path.join(local_root, "_releases.lock")
        )
    else:
        lock = contextlib.nullcontext()
    with lock:
        reg = read_release_registry(spark, root)
        version = 1 + max(
            (v["version"] for v in reg["versions"]), default=0
        )
        rel_path = f"v={version}"
        manifest = release_corpus(
            spark, docs, f"{root}/{rel_path}", n_shards, **release_kwargs
        )
        entry = {
            "version": version, "path": rel_path, "manifest": manifest,
        }
        reg["versions"].append(entry)
        _write_registry(spark, root, reg)
        return entry


def load_release(
    spark: SparkSession, root: str, version: int | None = None,
    shards: Sequence[int] | None = None,
    require_manifest: bool = True,
) -> DataFrame:
    """Open a registered release (default: latest) with the pruning
    shard reader — the read side verifies the artifact's completeness
    marker first (``sources.io.verify_corpus_manifest``).

    ``shards`` restricts the scan to a subset of shard directories
    (partition-pruned, r16) — the resumable multi-node loader pattern
    WITHOUT bypassing the registry: each worker opens its own shard
    slice of the same pinned version instead of hand-building the
    ``v=N`` path.

    ``require_manifest=False`` forwards the verifier's documented
    escape hatch (r17 advice: the error message advertises it, but a
    registered release whose on-disk marker was lost could not be
    opened through the registry at all without it)."""
    from quebic_spark.sources.io import read_corpus_shards

    reg = read_release_registry(spark, root)
    if not reg["versions"]:
        raise ValueError(f"no releases registered under {root}")
    by_v = {v["version"]: v for v in reg["versions"]}
    if version is None:
        version = max(by_v)
    if version not in by_v:
        raise ValueError(
            f"release {version} not in registry ({sorted(by_v)})"
        )
    entry = by_v[version]
    return read_corpus_shards(
        spark, f"{root}/{entry['path']}",
        fmt=entry["manifest"].get("format", "parquet"),
        shards=shards,
        require_manifest=require_manifest,
    )


def diff_releases(
    spark: SparkSession, root: str, old_version: int, new_version: int
) -> DataFrame:
    """added/removed/retained content-key delta between two registered
    releases — :func:`operators.dedup.snapshot_diff` over the
    provenance ``content_key`` column both artifacts carry."""
    from quebic_spark.operators.dedup import snapshot_diff

    old = load_release(spark, root, old_version)
    new = load_release(spark, root, new_version)
    return snapshot_diff(
        old.select("content_key"), new.select("content_key")
    )
