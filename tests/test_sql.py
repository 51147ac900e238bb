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
    spark.catalog.dropTempView("corpus")
    spark.catalog.dropTempView("corpus_v1")
