"""End-to-end release pipeline: score -> percentile filter -> keep-best
dedup -> decontaminate -> sharded write, verified against independent
recomputation of each stage's contract on the released artifact."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from quebic_spark.pipeline import (
    contaminated_doc_ids,
    release_corpus,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    yield df
    # session is shared across test modules: a lingering cached scan of
    # documents.parquet would substitute an InMemoryRelation into ANY
    # later test's scan of the same path (breaking pushdown asserts)
    df.unpersist(blocking=False)


def test_release_corpus_end_to_end(spark, docs, tmp_path):
    out = str(tmp_path / "release")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    man = release_corpus(
        spark, docs, out, n_shards=4,
        quality_cut_pct=0.2, bench_docs=bench,
    )
    n_in = docs.count()
    assert 0 < man["total_rows"] < n_in
    assert os.path.exists(os.path.join(out, "_corpus_manifest.json"))
    assert json.load(
        open(os.path.join(out, "_corpus_manifest.json"))
    ) == man

    released = spark.read.parquet(out)
    assert released.count() == man["total_rows"]
    # provenance columns ride along
    for c in ("quality_score", "content_key", "n_copies"):
        assert c in released.columns
    # dedup contract: content keys unique in the release
    assert (
        released.select("content_key").distinct().count()
        == man["total_rows"]
    )
    # decontamination contract: nothing shares grams with the bench set
    assert (
        released.join(
            contaminated_doc_ids(released, bench), "doc_id"
        ).count()
        == 0
    )
    # quality contract: no source lost more than ~cut fraction BEFORE
    # dedup/decon (those remove more), and no source vanished that had
    # a doc the filter must keep — check the filter stage directly
    per_source_in = dict(
        docs.groupBy("source").count().collect()
    )
    per_source_out = dict(
        released.groupBy("source").count().collect()
    )
    for src, n in per_source_in.items():
        # percentile filter alone keeps >= ceil(0.8n); dedup/decon can
        # only remove dup/contaminated docs, so a source disappears
        # only if ALL its survivors were dups of other sources' docs
        # or contaminated — with this corpus every source survives
        assert per_source_out.get(src, 0) >= 1, src


def test_release_corpus_without_bench(spark, docs, tmp_path):
    out = str(tmp_path / "release_nb")
    man = release_corpus(
        spark, docs, out, n_shards=2, quality_cut_pct=0.0
    )
    released = spark.read.parquet(out)
    # no quality cut: only dedup shrinks the corpus
    assert man["total_rows"] == (
        docs.withColumn(
            "k",
            F.md5(
                F.concat_ws(
                    " ",
                    F.array_sort(
                        F.array_distinct(F.split("text", " "))
                    ),
                )
            ),
        ).select("k").distinct().count()
    )
    assert released.count() == man["total_rows"]


def test_release_corpus_with_model_tier(spark, docs, tmp_path):
    """The optional classifier stage drops exactly the docs the model
    scores below the threshold, keeps provenance (model_prob rides the
    released rows), and stays a pure filter (no extra shuffle: row
    counts reconcile with an independent scan-side recomputation)."""
    from quebic_spark.operators.classifier import (
        classifier_prob_col,
        train_quality_classifier,
    )

    model = train_quality_classifier(docs)
    out = str(tmp_path / "release_model")
    man = release_corpus(
        spark, docs, out, n_shards=2, quality_cut_pct=0.0,
        quality_model=model, min_model_prob=0.5,
    )
    released = spark.read.parquet(out)
    assert released.count() == man["total_rows"]
    # provenance column present and respects the threshold
    probs = [r["model_prob"] for r in released.collect()]
    assert all(p >= 0.5 for p in probs)
    # independent recomputation: surviving content keys after the
    # model filter, deduped keep-best
    survivors = docs.filter(classifier_prob_col(model) >= 0.5)
    want = (
        survivors.withColumn(
            "k",
            F.md5(
                F.concat_ws(
                    " ",
                    F.array_sort(
                        F.array_distinct(F.split("text", " "))
                    ),
                )
            ),
        ).select("k").distinct().count()
    )
    assert man["total_rows"] == want
    # the model tier must actually bite on this corpus (not a no-op):
    # the FILTER ITSELF must drop docs, not just the downstream dedup
    assert survivors.count() < docs.count()


def test_versioned_releases_register_load_and_diff(spark, docs, tmp_path):
    """Two releases of an evolving corpus: the registry records both,
    load_release pins exact artifacts, and diff_releases reports the
    added/removed/retained content-key delta between them."""
    from quebic_spark.pipeline import (
        diff_releases,
        load_release,
        read_release_registry,
        release_versioned,
    )

    root = str(tmp_path / "corpus_releases")
    v1_docs = docs.filter("doc_id % 10 < 8")   # sources 0..; most docs
    v2_docs = docs.filter("doc_id % 10 >= 2")  # overlaps, adds, drops

    e1 = release_versioned(spark, v1_docs, root, n_shards=4,
                           quality_cut_pct=0.0)
    e2 = release_versioned(spark, v2_docs, root, n_shards=4,
                           quality_cut_pct=0.0)
    assert (e1["version"], e2["version"]) == (1, 2)

    reg = read_release_registry(spark, root)
    assert [v["version"] for v in reg["versions"]] == [1, 2]
    assert all(v["manifest"]["total_rows"] > 0 for v in reg["versions"])

    # load: latest is v2; explicit pin returns v1
    latest = load_release(spark, root)
    pinned = load_release(spark, root, 1)
    assert latest.count() == e2["manifest"]["total_rows"]
    assert pinned.count() == e1["manifest"]["total_rows"]

    # diff agrees with a direct key comparison of the two artifacts
    k1 = {r.content_key for r in pinned.select("content_key").collect()}
    k2 = {r.content_key for r in latest.select("content_key").collect()}
    got = {r.status: r.n_keys
           for r in diff_releases(spark, root, 1, 2).collect()}
    assert got.get("added", 0) == len(k2 - k1)
    assert got.get("removed", 0) == len(k1 - k2)
    assert got.get("retained", 0) == len(k1 & k2)
    assert got.get("added", 0) > 0 and got.get("removed", 0) > 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        load_release(spark, root, 99)
    with _pytest.raises(ValueError):
        load_release(spark, str(tmp_path / "empty_root"))

    # shard-subset access through the registry (r16): a resumable
    # loader opens its own slice of the pinned version without
    # hand-building the v=N path; counts match the write manifest
    # and the scan prunes (the read_corpus_shards contract, plan-
    # asserted in test_sources.py)
    man2 = reg["versions"][1]["manifest"]
    sub = load_release(spark, root, 2, shards=[0, 2])
    assert sub.count() == (
        man2["shards"].get("0", {"rows": 0})["rows"]
        + man2["shards"].get("2", {"rows": 0})["rows"]
    )
    assert set(
        r["shard"] for r in sub.select("shard").distinct().collect()
    ) <= {0, 2}

    # r17 advice: the verifier's error message advertises
    # require_manifest=False, but load_release never forwarded it —
    # a registered release whose on-disk marker was lost could not be
    # opened through the registry at all. The escape hatch must reach
    # the shard reader.
    import os as _os

    from quebic_spark.sources.io import CORPUS_MANIFEST_NAME

    mpath = _os.path.join(
        root, reg["versions"][1]["path"], CORPUS_MANIFEST_NAME
    )
    _os.remove(mpath)
    with _pytest.raises(ValueError, match="no _corpus_manifest"):
        load_release(spark, root, 2)
    assert load_release(
        spark, root, 2, require_manifest=False
    ).count() == man2["total_rows"]


def test_orphan_release_dir_is_invisible_and_reclaimed(spark, docs, tmp_path):
    """Crash discipline: the registry is written LAST, so a release
    that died mid-write leaves an orphan v=N directory that (a) no
    load_release/diff can see and (b) the next release_versioned
    overwrites under the same version number — half-written artifacts
    never leak into training."""
    import shutil

    from quebic_spark.pipeline import (
        load_release,
        read_release_registry,
        release_versioned,
    )

    root = str(tmp_path / "rel_crash")
    e1 = release_versioned(spark, docs, root, n_shards=2,
                           quality_cut_pct=0.0)
    assert e1["version"] == 1

    # simulate a crash: v=2 exists on disk (even with a _SUCCESS from
    # the inner write) but the registry append never happened
    shutil.copytree(os.path.join(root, "v=1"),
                    os.path.join(root, "v=2"))
    reg = read_release_registry(spark, root)
    assert [v["version"] for v in reg["versions"]] == [1]
    assert load_release(spark, root).count() == e1["manifest"]["total_rows"]
    with pytest.raises(ValueError):
        load_release(spark, root, 2)  # orphan is not a release

    # the next release takes version 2, overwriting the orphan
    e2 = release_versioned(
        spark, docs.filter("doc_id % 2 = 0"), root, n_shards=2,
        quality_cut_pct=0.0,
    )
    assert e2["version"] == 2
    assert load_release(spark, root, 2).count() == \
        e2["manifest"]["total_rows"]


def test_concurrent_releases_serialize_under_the_registry_lock(
    spark, docs, tmp_path
):
    """Review regression: two concurrent release_versioned calls on
    one root must serialize (flock) — distinct version numbers, both
    registry entries present, neither artifact clobbered."""
    import threading

    from quebic_spark.pipeline import (
        load_release,
        read_release_registry,
        release_versioned,
    )

    root = str(tmp_path / "rel_conc")
    results: list[dict] = []
    errors: list[Exception] = []

    def go(flt):
        try:
            results.append(release_versioned(
                spark, docs.filter(flt), root, n_shards=2,
                quality_cut_pct=0.0,
            ))
        except Exception as e:  # noqa: BLE001 — surface in assert
            errors.append(e)

    t1 = threading.Thread(target=go, args=("doc_id % 2 = 0",))
    t2 = threading.Thread(target=go, args=("doc_id % 2 = 1",))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors, errors
    assert sorted(r["version"] for r in results) == [1, 2]
    reg = read_release_registry(spark, root)
    assert [v["version"] for v in reg["versions"]] == [1, 2]
    for r in results:
        assert load_release(spark, root, r["version"]).count() == \
            r["manifest"]["total_rows"]


def test_csv_release_roundtrips_through_registry(spark, docs, tmp_path):
    """Non-parquet releases: the registry records the format and
    load_release reopens a CSV artifact with the same rows and keys."""
    from quebic_spark.pipeline import load_release, release_versioned

    root = str(tmp_path / "rel_csv")
    e = release_versioned(spark, docs.limit(80), root, n_shards=2,
                          quality_cut_pct=0.0, fmt="csv")
    assert e["manifest"]["format"] == "csv"
    back = load_release(spark, root)
    assert back.count() == e["manifest"]["total_rows"]
    a = sorted(r.content_key for r in back.select("content_key").collect())
    assert len(a) == len(set(a))  # dedup survived the format hop


def test_release_with_media_decode_accounting(spark, docs, tmp_path):
    """The optional multimodal tier: a mixed binary-payload corpus —
    real decodable images/audio, a corrupt body behind valid magic
    (error-stub), and unknown bytes — lands as per-format
    decode/quarantine counts under the manifest's ``media`` key, in
    the on-disk manifest too."""
    import io
    import json
    import os

    from quebic_spark.operators.multimodal import encode_bmp, encode_png
    from quebic_spark.pipeline import release_corpus

    bmp = encode_bmp(2, 2, [[(255, 0, 0), (0, 255, 0)],
                            [(0, 0, 255), (255, 255, 255)]])
    png = encode_png(2, 1, [[(10, 20, 30), (40, 50, 60)]])
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<4h", 0, 100, -100, 0))
    wav = buf.getvalue()
    corrupt_bmp = bmp[:40] + b"\x00" * 20   # magic ok, body truncated
    junk = b"\x01\x02\x03 definitely not media"

    payloads = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(png)), (3, bytearray(wav)),
         (4, bytearray(corrupt_bmp)), (5, bytearray(junk))],
        "doc_id long, payload binary",
    )
    out = str(tmp_path / "media_release")
    man = release_corpus(
        spark, docs, out, n_shards=2, media_payloads=payloads
    )
    media = man["media"]
    assert media["bmp"] == {"n_rows": 1, "n_bytes": len(bmp),
                            "quarantined": False}
    assert media["png"]["n_rows"] == 1 and not media["png"]["quarantined"]
    assert media["wav"]["n_rows"] == 1 and not media["wav"]["quarantined"]
    assert media["bmp-error-stub"]["quarantined"] is True
    assert media["unknown-stub"]["quarantined"] is True
    assert sum(v["n_rows"] for v in media.values()) == 5
    # the re-written on-disk manifest carries the media tier
    on_disk = json.load(
        open(os.path.join(out, "_corpus_manifest.json"))
    )
    assert on_disk == man


def test_generational_registry_never_reads_empty_mid_update(
    spark, tmp_path
):
    """The non-file-scheme registry protocol (r8 verdict #8): an
    update commits a NEW generation file, so a reader between the
    writer's tmp write and its rename — an arbitrarily slow rename —
    still sees the previous committed generation, never an empty
    registry. Driven against the local Hadoop FS through the same
    generational read/write functions the non-file branch uses."""
    import json
    import os
    import time

    from quebic_spark.pipeline import (
        _read_registry_generational,
        _registry_fs,
        _registry_generations,
        _write_registry_generational,
    )

    root = str(tmp_path / "gen_reg")
    os.makedirs(root)
    jvm, fs, rpath = _registry_fs(spark, root)

    # genuinely-empty answers immediately (the r8 backoff slept ~1 s)
    t0 = time.monotonic()
    assert _read_registry_generational(jvm, fs, root, rpath) == {
        "versions": []
    }
    assert time.monotonic() - t0 < 0.5

    reg1 = {"versions": [{"version": 1, "path": "v=1", "manifest": {}}]}
    _write_registry_generational(jvm, fs, root, reg1)
    assert _read_registry_generational(jvm, fs, root, rpath) == reg1

    # stalled writer: gen-2 tmp written, rename not yet landed — the
    # reader must return the committed gen-1, not empty/torn
    reg2 = {"versions": reg1["versions"] + [
        {"version": 2, "path": "v=2", "manifest": {}}
    ]}
    tmp_file = os.path.join(root, "_releases.gen-2.json.tmp")
    with open(tmp_file, "w") as fh:
        json.dump(reg2, fh)
    assert _read_registry_generational(jvm, fs, root, rpath) == reg1

    # rename lands -> the new generation becomes visible atomically
    os.rename(tmp_file, os.path.join(root, "_releases.gen-2.json"))
    assert _read_registry_generational(jvm, fs, root, rpath) == reg2

    # a further write prunes old generations but keeps the previous
    # newest (a reader that listed pre-flip can still open it)
    reg3 = {"versions": reg2["versions"] + [
        {"version": 3, "path": "v=3", "manifest": {}}
    ]}
    _write_registry_generational(jvm, fs, root, reg3)
    names = {n for n, _ in _registry_generations(jvm, fs, root)}
    assert names == {2, 3}
    assert _read_registry_generational(jvm, fs, root, rpath) == reg3

    # legacy layout (single _releases.json, no generations) still reads
    legacy_root = str(tmp_path / "legacy_reg")
    os.makedirs(legacy_root)
    with open(os.path.join(legacy_root, "_releases.json"), "w") as fh:
        json.dump(reg1, fh)
    _, _, legacy_rpath = _registry_fs(spark, legacy_root)
    assert _read_registry_generational(
        jvm, fs, legacy_root, legacy_rpath
    ) == reg1


def test_generational_registry_reader_retries_on_pruned_generation(
    spark, tmp_path, monkeypatch
):
    """Two back-to-back updates can prune the generation a reader just
    listed before it opens it; the reader must re-list and serve the
    then-newest generation (r9 review catch), and must raise — not
    answer empty — if a populated registry stays unreadable."""
    import json
    import os

    import quebic_spark.pipeline as P
    from quebic_spark.sources import io as qio

    root = str(tmp_path / "gen_reg_retry")
    os.makedirs(root)
    jvm, fs, rpath = P._registry_fs(spark, root)
    reg2 = {"versions": [{"version": 2, "path": "v=2", "manifest": {}}]}
    reg3 = {"versions": reg2["versions"] + [
        {"version": 3, "path": "v=3", "manifest": {}}
    ]}
    with open(os.path.join(root, "_releases.gen-2.json"), "w") as fh:
        json.dump(reg2, fh)

    real_read = qio.fs_read_json
    calls = {"n": 0}

    def flaky_read(jvm_, fs_, jpath):
        calls["n"] += 1
        if calls["n"] == 1:
            # simulate: gen-2 pruned after listing, gen-3 committed
            os.remove(os.path.join(root, "_releases.gen-2.json"))
            with open(
                os.path.join(root, "_releases.gen-3.json"), "w"
            ) as fh:
                json.dump(reg3, fh)
            raise IOError("gen pruned mid-read")
        return real_read(jvm_, fs_, jpath)

    monkeypatch.setattr(qio, "fs_read_json", flaky_read)
    got = P._read_registry_generational(jvm, fs, root, rpath)
    assert got == reg3 and calls["n"] == 2

    # permanently unreadable populated registry: loud failure, never a
    # silent empty answer
    def always_fail(jvm_, fs_, jpath):
        raise IOError("stays broken")

    monkeypatch.setattr(qio, "fs_read_json", always_fail)
    import pytest as _pytest

    with _pytest.raises(IOError):
        P._read_registry_generational(jvm, fs, root, rpath)


def test_generational_registry_reader_falls_back_to_previous_newest(
    spark, tmp_path
):
    """A PERSISTENTLY unreadable newest generation (torn bytes from an
    out-of-contract writer, bad permissions) must not take the
    registry down: after the re-list retries are exhausted, the reader
    serves the previous-newest generation the pruner deliberately
    retains (r10 advice) — stale-but-committed beats raising. Both
    bad -> still a loud raise, never a silent empty answer."""
    import json
    import os

    import pytest as _pytest

    import quebic_spark.pipeline as P

    root = str(tmp_path / "gen_reg_fb")
    os.makedirs(root)
    jvm, fs, rpath = P._registry_fs(spark, root)
    reg1 = {"versions": [{"version": 1, "path": "v=1", "manifest": {}}]}
    with open(os.path.join(root, "_releases.gen-1.json"), "w") as fh:
        json.dump(reg1, fh)
    with open(os.path.join(root, "_releases.gen-2.json"), "w") as fh:
        fh.write('{"versions": [{"ver')  # torn newest

    assert P._read_registry_generational(jvm, fs, root, rpath) == reg1

    # previous-newest torn too: nothing committed is readable -> raise
    with open(os.path.join(root, "_releases.gen-1.json"), "w") as fh:
        fh.write("%% not json %%")
    with _pytest.raises(Exception):
        P._read_registry_generational(jvm, fs, root, rpath)


def test_generational_registry_two_racing_writers(
    spark, tmp_path, monkeypatch
):
    """Deterministic two-writer interleaving (VERDICT r9 next #6):
    writer B lists BEFORE writer A commits, so both stage generation
    2. Writer-unique tmp names mean neither can truncate the other's
    staged bytes (r10 advice — the fixed tmp name could commit a torn
    JSON), so whatever generation file wins the rename is a COMPLETE
    committed registry; B's prune (computed from its stale listing)
    removes nothing a reader still needs. A reader afterwards must
    succeed within its bounded retries on every interleaving, and
    every generation file on disk must parse."""
    import json
    import os

    import quebic_spark.pipeline as P

    root = str(tmp_path / "gen_reg_race")
    os.makedirs(root)
    jvm, fs, rpath = P._registry_fs(spark, root)
    reg1 = {"versions": [{"version": 1, "path": "v=1", "manifest": {}}]}
    P._write_registry_generational(jvm, fs, root, reg1)

    reg_a = {"versions": reg1["versions"] + [
        {"version": 2, "path": "v=2a", "manifest": {}}
    ]}
    reg_b = {"versions": reg1["versions"] + [
        {"version": 2, "path": "v=2b", "manifest": {}}
    ]}

    # freeze B's view of the registry to BEFORE A's commit: both
    # writers compute n=2 and prune from the same stale listing
    stale = P._registry_generations(jvm, fs, root)
    real_list = P._registry_generations
    monkeypatch.setattr(
        P, "_registry_generations", lambda *a: stale
    )
    try:
        P._write_registry_generational(jvm, fs, root, reg_a)  # A wins
        try:
            P._write_registry_generational(jvm, fs, root, reg_b)
        except IOError:
            pass  # B losing loudly at the rename is a legal outcome
    finally:
        monkeypatch.setattr(P, "_registry_generations", real_list)

    # no interleaving may leave a torn or stale-pruned registry:
    # every committed generation parses, no stage debris, and the
    # reader answers one of the two complete candidate registries
    # on its first listing (never exhausts retries)
    for name in os.listdir(root):
        assert ".tmp-" not in name, f"stage debris leaked: {name}"
        if name.startswith("_releases.gen-"):
            json.load(open(os.path.join(root, name)))
    got = P._read_registry_generational(jvm, fs, root, rpath)
    assert got in (reg_a, reg_b)


def test_release_corpus_normalize_stage_collapses_decomposed_dups(
    spark, tmp_path
):
    """Stage-0 normalization must run BEFORE the content-key dedup:
    decomposed/composed twins survive as two docs without it and
    collapse to one canonical with it; default off leaves the gated
    hash lineage untouched."""
    from quebic_spark.pipeline import release_corpus

    rows = [
        (0, "src1", "the cafe\u0301 menu baseline words here"),
        (1, "src1", "the caf\u00e9 menu baseline words here"),
        (2, "src1", "a wholly different document body text"),
        (3, "src2", "another independent body of words too"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    raw = release_corpus(
        spark, docs, str(tmp_path / "raw"), n_shards=1,
        quality_cut_pct=0.0,
    )
    norm = release_corpus(
        spark, docs, str(tmp_path / "norm"), n_shards=1,
        quality_cut_pct=0.0, normalize_unicode="NFC",
    )
    assert raw["total_rows"] == 4      # byte-distinct twins both kept
    assert norm["total_rows"] == 3     # normalized twins dedup to one
    released = spark.read.parquet(str(tmp_path / "norm")).select(
        "doc_id"
    ).collect()
    assert sorted(r["doc_id"] for r in released) == [0, 2, 3]

def test_release_corpus_with_diversity_stage(spark, docs, tmp_path):
    """The opt-in D4 diversity stage composes after dedup (the
    classifier-tier pattern): the release equals the no-diversity
    release minus exactly the most-prototypical tail of each
    quantizer cell, recomputed independently in Python, and every
    downstream contract (unique content keys, manifest accounting)
    still holds."""
    import math

    base_out = str(tmp_path / "rel_plain")
    div_out = str(tmp_path / "rel_diverse")
    # one embedding per doc: all docs land in cell 0 of an explicit
    # 2-D quantizer; prototypicality varies with doc_id deterministically
    emb = docs.select(
        "doc_id",
        F.array(
            F.lit(1.0), (F.col("doc_id") % 10).cast("double") / 10.0
        ).alias("embedding"),
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]
    keep_pct = 70

    man_plain = release_corpus(
        spark, docs, base_out, n_shards=2, quality_cut_pct=0.2,
    )
    man_div = release_corpus(
        spark, docs, div_out, n_shards=2, quality_cut_pct=0.2,
        diversity_embeddings=emb, diversity_keep_pct=keep_pct,
        diversity_centroids=cents,
    )
    plain_ids = {
        r["doc_id"]
        for r in spark.read.parquet(base_out).select("doc_id").collect()
    }
    div_ids = {
        r["doc_id"]
        for r in spark.read.parquet(div_out).select("doc_id").collect()
    }

    # independent recompute of the dropped set over the FULL embedding
    # table (the stage prunes by embedding evidence, not by survivors)
    rows = [(r["doc_id"], r["embedding"]) for r in emb.collect()]
    def cos_to_c0(e):
        return e[0] / math.sqrt(e[0] * e[0] + e[1] * e[1])
    ranked = sorted(rows, key=lambda t: (cos_to_c0(t[1]), t[0]))
    cell_keep = (len(ranked) * keep_pct + 99) // 100
    dropped = {doc_id for doc_id, _ in ranked[cell_keep:]}

    assert div_ids == plain_ids - dropped
    assert man_div["total_rows"] == len(div_ids) > 0
    # dedup contract unchanged downstream of the stage
    released = spark.read.parquet(div_out)
    assert (
        released.select("content_key").distinct().count()
        == man_div["total_rows"]
    )


def test_release_corpus_rejects_reserved_columns(spark, docs, tmp_path):
    """r14 review: keep_best silently DROPPED a caller's 'rn' column
    and the pipeline silently overwrote quality_score/content_key —
    the same collision class the r13 guards in
    quality_percentile_filter and write_corpus_shards raise on."""
    from quebic_spark.pipeline import release_corpus

    with_rn = docs.withColumn("rn", F.lit(7))
    with pytest.raises(ValueError, match="reserved column"):
        release_corpus(spark, with_rn, str(tmp_path / "r"), n_shards=2)
    with_qs = docs.withColumn("quality_score", F.lit(0.5))
    with pytest.raises(ValueError, match="reserved column"):
        release_corpus(spark, with_qs, str(tmp_path / "r2"), n_shards=2)
    # model_prob is reserved only when a model tier will write it
    with_mp = docs.withColumn("model_prob", F.lit(0.5))
    release_corpus(spark, with_mp, str(tmp_path / "r3"), n_shards=2)


def test_session_tuning_isolated_per_session(spark):
    """r14 review: _PRIOR_CONFS was keyed by applicationId, which
    spark.newSession() children SHARE — tuning parent then child
    conflated their records, so restoring the child wrote the
    parent's priors into the child and silently dropped the parent's
    own record."""
    from quebic_spark.session import restore_session_tuning, tune_for_query

    key = "spark.sql.adaptive.enabled"
    parent_before = spark.conf.get(key)
    child = spark.newSession()
    child.conf.set(key, "false")  # child's own deliberate setting

    tune_for_query(spark)
    tune_for_query(child)
    assert child.conf.get(key) == "true"
    restore_session_tuning(child)
    assert child.conf.get(key) == "false"  # child's prior, not parent's
    assert spark.conf.get(key) == "true"  # parent still tuned
    restore_session_tuning(spark)
    assert spark.conf.get(key) == parent_before  # parent's own record kept
