"""SQL facade: testdata and queue logs reachable from spark.sql."""

from pyspark.sql import functions as F

from quebic_spark import INTEGER, Queue, Schema, TEXT
from quebic_spark.sql import register_queue, register_testdata


def test_register_testdata_and_query(spark, sf_dir):
    names = register_testdata(spark, sf_dir)
    assert set(names) >= {"region", "nation", "orders", "documents"}
    # a cross-table SQL join over the views, pushdown intact
    out = spark.sql(
        """
        SELECT r.r_name, COUNT(*) AS n_nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    ).collect()
    assert len(out) == 5 and sum(r["n_nations"] for r in out) == 25
    # filters through the view reach the parquet scan
    plan = (
        spark.sql("SELECT doc_id FROM documents WHERE doc_id = 7")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)]" in plan


def test_events_view_matches_operator_normalization(spark, sf_dir):
    """The facade's events view must carry the SAME ts the operator
    layer computes — TIMESTAMP type, identical values — regardless of
    which physical encoding (nanos-long vs timestamp[us]) this testdata
    generation shipped (round-4 review: the raw scan leaked a BIGINT
    to SQL users on nanos-generation data)."""
    from quebic_spark.operators.events import _events

    register_testdata(spark, sf_dir)
    view_ts = spark.sql("SELECT ts FROM events")
    assert dict(view_ts.dtypes)["ts"] == "timestamp"
    op = _events(spark, sf_dir).select("ts")
    assert dict(op.dtypes)["ts"] == "timestamp"
    a = spark.sql(
        "SELECT MIN(ts) AS lo, MAX(ts) AS hi, COUNT(*) AS n FROM events"
    ).first()
    b = op.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert (a["lo"], a["hi"], a["n"]) == (b["lo"], b["hi"], b["n"])


def test_register_queue_view(spark, tmp_path):
    q = Queue(str(tmp_path / "q"), Schema(INTEGER, TEXT), capacity=100)
    q.publisher().push_all([[i, f"v{i}"] for i in range(10)])
    q.subscriber().pop_n(3)
    register_queue(spark, q, "my_queue")
    rows = spark.sql(
        "SELECT c0, c1 FROM my_queue ORDER BY seq"
    ).collect()
    assert [(r["c0"], r["c1"]) for r in rows] == [
        (i, f"v{i}") for i in range(3, 10)
    ]
    # snapshot semantics: re-register refreshes
    q.subscriber().pop_n(2)
    register_queue(spark, q, "my_queue")
    assert spark.sql("SELECT COUNT(*) AS n FROM my_queue").first()["n"] == 5
    q.dispose()


def test_register_release_exposes_versioned_corpus(spark, tmp_path):
    from quebic_spark.pipeline import release_versioned
    from quebic_spark.sql import register_release

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(30)), "en",
          f"src{i % 3}", 30) for i in range(60)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    root = str(tmp_path / "rel")
    e1 = release_versioned(spark, docs, root, n_shards=2,
                           quality_cut_pct=0.0)
    release_versioned(spark, docs.filter("doc_id < 30"), root,
                      n_shards=2, quality_cut_pct=0.0)

    register_release(spark, root, "corpus")  # latest = v2
    [r] = spark.sql("SELECT COUNT(*) AS n FROM corpus").collect()
    assert r.n == 30

    register_release(spark, root, "corpus_v1", version=1)
    [r1] = spark.sql(
        "SELECT COUNT(DISTINCT source) AS s FROM corpus_v1"
    ).collect()
    assert r1.s == 3
    assert e1["manifest"]["total_rows"] == 60

    # r17: the uncertified escape hatch reaches SQL audits too — a
    # release whose completeness marker was lost is still viewable
    import os

    import pytest

    from quebic_spark.sources.io import CORPUS_MANIFEST_NAME

    os.remove(os.path.join(root, "v=2", CORPUS_MANIFEST_NAME))
    with pytest.raises(ValueError, match="no _corpus_manifest"):
        register_release(spark, root, "corpus_torn")
    register_release(spark, root, "corpus_torn", require_manifest=False)
    [rt] = spark.sql("SELECT COUNT(*) AS n FROM corpus_torn").collect()
    assert rt.n == 30
    spark.catalog.dropTempView("corpus")
    spark.catalog.dropTempView("corpus_v1")
    spark.catalog.dropTempView("corpus_torn")


def test_register_phrase_index_sql_join_with_pushdown(
    spark, sf_dir, tmp_path
):
    """Corpus audit as plain SQL: the persisted posting view joined
    against documents, with the token predicate reaching the parquet
    scan — and the SQL result agreeing with the library operator."""
    from quebic_spark.operators.textops import (
        SEARCH_PHRASE,
        build_phrase_index,
        phrase_search,
        posting_index,
    )
    from quebic_spark.sql import register_phrase_index, register_testdata

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx_path = str(tmp_path / "postings")
    build_phrase_index(docs, idx_path, n_buckets=8)
    register_testdata(spark, sf_dir, tables=("documents",))
    register_phrase_index(spark, idx_path, "postings")

    w0, w1 = SEARCH_PHRASE.split(" ")
    sql_hits = spark.sql(
        f"""
        SELECT p0.doc_id, p0.pos AS match_pos, d.source
        FROM postings p0
        JOIN postings p1
          ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
        JOIN documents d ON d.doc_id = p0.doc_id
        WHERE p0.token = '{w0}' AND p1.token = '{w1}'
        """
    )
    plan = sql_hits._jdf.queryExecution().executedPlan().toString()
    assert f"EqualTo(token,{w0})" in plan, plan  # pushdown through view
    got = {(r.doc_id, r.match_pos) for r in sql_hits.collect()}
    want = {
        (r.doc_id, r.match_pos)
        for r in phrase_search(posting_index(docs), SEARCH_PHRASE).collect()
    }
    assert got == want and got


def test_register_phrase_index_requires_commit_marker(
    spark, sf_dir, tmp_path
):
    """r16 review: a build_phrase_index overwrite killed mid-job-commit
    leaves a partial part-file set that parquet reads silently — and a
    posting index missing postings silently misses matches. The
    register path requires the _SUCCESS job-commit marker by default;
    require_commit_marker=False stays as the escape for writers that
    disable markers."""
    import os

    import pytest

    from quebic_spark.operators.textops import build_phrase_index
    from quebic_spark.sql import register_phrase_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx_path = str(tmp_path / "postings")
    build_phrase_index(docs, idx_path, n_buckets=4)
    os.remove(os.path.join(idx_path, "_SUCCESS"))
    with pytest.raises(ValueError, match="_SUCCESS"):
        register_phrase_index(spark, idx_path, "postings_torn")
    df = register_phrase_index(
        spark, idx_path, "postings_unverified",
        require_commit_marker=False,
    )
    assert df.count() > 0


def test_register_ivf_search_composes_in_sql(
    spark, sf_dir, tmp_path, monkeypatch
):
    """ANN retrieval joined to its documents entirely in SQL, equal to
    the library call it bridges."""
    from quebic_spark.cache import clear_caches
    from quebic_spark.operators.similarity import ivf_search
    from quebic_spark.sql import register_ivf_search, register_testdata

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    clear_caches(include_ivf_index=True)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    register_testdata(spark, sf_dir, tables=("documents",))
    register_ivf_search(spark, sf_dir, queries, "ann_hits", k=3, nprobe=2)
    out = spark.sql(
        """
        SELECT h.query_id, h.vec_id, h.rank, d.source
        FROM ann_hits h JOIN documents d ON d.doc_id = h.vec_id
        ORDER BY h.query_id, h.rank
        """
    ).collect()
    direct = {
        (r.query_id, r.vec_id, r.rank)
        for r in ivf_search(spark, sf_dir, queries, k=3, nprobe=2).collect()
    }
    assert {(r.query_id, r.vec_id, r.rank) for r in out} == direct
    assert len(out) == len(direct) and direct
    clear_caches(include_ivf_index=True)
