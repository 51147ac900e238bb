"""Sketch-family operators in operators/sampling.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from quebic_spark.operators.sampling import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_estimate,
    cms_sketch,
)


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_cms_never_underestimates_and_is_exact_without_collisions(spark):
    keys = [f"k{i}" for i in range(30) for _ in range(i + 1)]
    df = _keys_df(spark, keys)
    sketch = cms_sketch(df)
    probes = _keys_df(spark, [f"k{i}" for i in range(30)])
    est = {r.key: r.est_count
           for r in cms_estimate(sketch, probes).collect()}
    for i in range(30):
        true = i + 1
        assert est[f"k{i}"] >= true, (i, est[f"k{i}"])
    # 30 distinct keys over depth 4 x width 256: overwhelmingly
    # collision-free, so estimates equal truth exactly
    assert sum(est[f"k{i}"] - (i + 1) for i in range(30)) == 0


def test_cms_sketch_is_bounded_and_mergeable(spark):
    import random

    rng = random.Random(5)
    a = [f"x{rng.randrange(2000)}" for _ in range(4000)]
    b = [f"x{rng.randrange(2000)}" for _ in range(4000)]
    sk_a = cms_sketch(_keys_df(spark, a))
    sk_b = cms_sketch(_keys_df(spark, b))
    sk_ab = cms_sketch(_keys_df(spark, a + b))

    # bounded: never more than DEPTH * WIDTH cells no matter the keys
    assert sk_ab.count() <= CMS_DEPTH * CMS_WIDTH

    # mergeable: union sketch == cell-wise sum of the two sketches
    merged = {
        (r.row, r.col): r.s
        for r in sk_a.unionByName(sk_b)
        .groupBy("row", "col")
        .agg(F.sum("cell_count").alias("s"))
        .collect()
    }
    direct = {(r.row, r.col): r.cell_count for r in sk_ab.collect()}
    assert merged == direct


def test_cms_overestimates_under_forced_collisions(spark):
    # 5000 distinct singleton keys >> width 256: every cell is shared,
    # so estimates must sit strictly above the true count of 1 for
    # most probes while never going below it
    keys = [f"c{i}" for i in range(5000)]
    sketch = cms_sketch(_keys_df(spark, keys))
    probes = _keys_df(spark, keys[:50])
    est = [r.est_count for r in cms_estimate(sketch, probes).collect()]
    assert all(e >= 1 for e in est)
    assert sum(1 for e in est if e > 1) > 25


def test_hll_sketch_column_persists_and_merges(spark, sf_dir, tmp_path):
    """The sketch-column contract, literally: write per-source HLL
    sketches to parquet, read them back in a fresh scan, union-merge —
    the estimate must equal merging the live sketches, and bracket the
    exact distinct count."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = F.md5("text")
    per_source = docs.groupBy("source").agg(
        F.hll_sketch_agg(key, F.lit(14)).alias("sk")
    )
    path = str(tmp_path / "sketches")
    per_source.write.mode("overwrite").parquet(path)

    def merged_estimate(df):
        [r] = df.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
        ).collect()
        return r.est

    live = merged_estimate(per_source)
    stored = merged_estimate(spark.read.parquet(path))
    assert stored == live

    [r] = docs.agg(F.countDistinct(key).alias("d")).collect()
    assert abs(stored - r.d) / r.d <= 0.04

    # incremental union: merge stored sketches with a NEW day's sketch
    # without rescanning the old corpus
    day2 = docs.limit(50).withColumn(
        "text2", F.concat(F.col("text"), F.lit(" day2"))
    )
    sk2 = day2.groupBy("source").agg(
        F.hll_sketch_agg(F.md5("text2"), F.lit(14)).alias("sk")
    )
    combined = merged_estimate(
        spark.read.parquet(path).unionByName(sk2)
    )
    assert combined > stored  # new distinct texts strictly grow it


def test_cms_probe_of_unseen_and_partially_colliding_keys(spark):
    """Review regression: a probe key with empty cells must appear in
    the output with the true min (0), not vanish (inner join) or
    inflate past the empty-cell minimum."""
    sketch = cms_sketch(_keys_df(spark, ["a"] * 7))
    got = {
        r.key: r.est_count
        for r in cms_estimate(
            sketch, _keys_df(spark, ["a", "never-seen-key"])
        ).collect()
    }
    assert got["a"] >= 7
    assert got["never-seen-key"] == 0  # present, and exactly zero


def test_leakage_safe_split_groups_never_straddle(spark):
    from pyspark.sql import functions as F

    from quebic_spark.operators.sampling import hash_bucket, split_by_group

    # 60 distinct contents, each duplicated into 3 "sources" with
    # distinct doc_ids — a doc-keyed split WILL straddle, a
    # group-keyed split MUST NOT
    rows = []
    for g in range(60):
        for s in range(3):
            rows.append((g * 10 + s, f"src{s}", f"common shared text {g}"))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    assigned = split_by_group(docs)
    straddle = (
        assigned.groupBy("text")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert straddle == 0

    # the control: doc-id-keyed assignment does straddle on this data
    doc_keyed = docs.withColumn(
        "split",
        F.when(hash_bucket(F.col("doc_id")) < 90, "train").otherwise("eval"),
    )
    naive_straddle = (
        doc_keyed.groupBy("text")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert naive_straddle > 0

    # deterministic across physical layouts
    a = {r.doc_id: r.split for r in assigned.collect()}
    b = {r.doc_id: r.split
         for r in split_by_group(docs.repartition(13)).collect()}
    assert a == b


def test_cms_estimate_collapses_stale_cell_versions(spark):
    """r15 review: an update-mode streaming sink APPENDS each changed
    cell's new version; min-ing over a stale version underestimated —
    the one failure a CMS must never have. cms_estimate collapses
    versions by max (counts are monotone) before estimating."""
    from pyspark.sql import functions as F

    from quebic_spark.operators.sampling import cms_estimate, cms_sketch

    keyed = spark.createDataFrame(
        [("a",)] * 9 + [("b",)] * 4, "key string"
    )
    sketch = cms_sketch(keyed, "key")
    # simulate an appended sink: every cell also present at an older,
    # smaller count
    stale = sketch.withColumn(
        "cell_count", (F.col("cell_count") / 2).cast("long")
    )
    appended = sketch.unionByName(stale)
    probes = spark.createDataFrame([("a",), ("b",)], "key string")
    est = {
        r["key"]: r["est_count"]
        for r in cms_estimate(appended, probes).collect()
    }
    assert est["a"] >= 9 and est["b"] >= 4, est


def test_cms_sketch_weighted_equals_occurrence_form(spark):
    """A (key, count) frame sketched via weight_col produces the
    IDENTICAL cell table as exploding the occurrences — the r20 gate
    optimization's correctness contract."""
    keys = [f"w{i}" for i in range(40) for _ in range(i % 7 + 1)]
    occ = _keys_df(spark, keys)
    counts = occ.groupBy("key").agg(F.count(F.lit(1)).alias("c"))
    by_occ = {
        (r.row, r.col): r.cell_count for r in cms_sketch(occ).collect()
    }
    by_weight = {
        (r.row, r.col): r.cell_count
        for r in cms_sketch(counts, weight_col="c").collect()
    }
    assert by_occ == by_weight
