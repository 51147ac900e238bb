"""Quickstart: the reference queue workflow and the analytics layer
in one script.

Run:  python examples/quickstart.py [sf_dir] [work_dir]
(defaults: /root/testdata/sf0.001, a temp dir)

Walks the surface a reference (quebic) user needs on day one —
typed durable queue push/pop/latest — then the Spark-native layer
that replaces hand-rolled pipelines: SQL over the corpus, dedup,
quality scoring, a versioned release, and phrase search over the
released artifact.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="quebic_quickstart_"
    )

    # --- 1. the reference surface: a typed, durable, multi-process
    # FIFO queue (SURVEY §2.1-2.3) ---------------------------------
    from quebic_spark import INTEGER, Queue, REAL, Schema, TEXT

    q = Queue(f"{work}/jobs", Schema(INTEGER, TEXT, REAL), capacity=1000)
    pub = q.publisher()
    for i in range(5):
        pub.push([i, f"job-{i}", i * 1.5])
    sub = q.subscriber()
    first = sub.try_pop()
    print("queue:", "popped", first, "| latest", pub.latest(),
          "| size", q.size())
    q.verify()  # raises on corruption
    q.close()

    # --- 2. the analytics layer ------------------------------------
    from pyspark.sql import functions as F

    from quebic_spark.session import get_spark

    spark = get_spark(app_name="quickstart", master="local[4]",
                      shuffle_partitions=8)

    from quebic_spark.sql import register_release, register_testdata

    register_testdata(spark, sf_dir)
    print("sql:", spark.sql(
        "SELECT source, COUNT(*) AS n FROM documents "
        "GROUP BY source ORDER BY n DESC LIMIT 3"
    ).collect())

    # versioned corpus release: score -> filter -> dedup -> shard
    from quebic_spark.pipeline import release_versioned

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    entry = release_versioned(
        spark, docs, f"{work}/corpus", n_shards=4, quality_cut_pct=0.1
    )
    print("release:", "v", entry["version"], "rows",
          entry["manifest"]["total_rows"])

    # audit the released artifact with SQL + phrase search
    register_release(spark, f"{work}/corpus", "corpus")
    from quebic_spark.operators.textops import (
        phrase_search,
        posting_index,
    )

    hits = phrase_search(
        posting_index(spark.table("corpus")), "table value"
    )
    print("phrase 'table value':", hits.count(), "occurrences in release")

    # similarity search over embeddings (exact top-k per query)
    from quebic_spark.operators.similarity import q_ann_bruteforce_topk

    topk = q_ann_bruteforce_topk(spark, sf_dir)
    print("ann:", topk.count(), "ranked neighbor rows")

    # ...and the user-facing call: arbitrary query vectors against the
    # stored IVF index (built on first use, persisted for reuse)
    from quebic_spark.operators.similarity import ivf_search

    my_queries = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(3)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    hits3 = ivf_search(spark, sf_dir, my_queries, k=3, nprobe=2)
    print("ivf_search:", hits3.count(), "hits for 3 queries")

    # compressed ANN: 8-byte PQ codes + exact re-rank of the shortlist
    from quebic_spark.operators.similarity import ivf_pq_topk

    pq_hits = ivf_pq_topk(spark, sf_dir, nprobe=2, k=3)
    print("ivf_pq:", pq_hits.count(), "reranked hits")

    # leakage-safe train/val/test: duplicates can never straddle splits
    from quebic_spark.operators.sampling import split_by_group

    split_counts = (
        split_by_group(spark.table("corpus"))
        .groupBy("split").count().collect()
    )
    print("splits:", {r["split"]: r["count"] for r in split_counts})

    # table stats answered from parquet footers (no data scan)
    from quebic_spark.sources.io import footer_stats

    stats = footer_stats(
        spark, f"{sf_dir}/orders.parquet", ["o_orderkey"]
    ).collect()[0]
    print("orders rows (footers only):", stats["n_rows"])

    # migrating off the reference: its on-disk queue files import
    # byte-for-byte (r10) — no re-ingest to switch engines
    from quebic_spark.schema import Schema as QSchema
    from quebic_spark.sources.quebic_format import (
        export_quebic_queue,
        migrate_quebic_queue,
        read_quebic_dir,
    )

    legacy = f"{work}/legacy"
    import os

    os.makedirs(legacy, exist_ok=True)
    export_quebic_queue(  # stand-in for files the reference wrote
        f"{legacy}/orders.qbc", QSchema(INTEGER, TEXT),
        [[i, f"legacy-{i}"] for i in range(20)],
    )
    print("import:", read_quebic_dir(spark, legacy).count(),
          "rows parsed from reference bytes")
    mq, n = migrate_quebic_queue(
        spark, f"{legacy}/orders.qbc", f"{work}/migrated"
    )
    print("migrate:", n, "rows now in a live Queue; head =",
          mq.subscriber().try_pop())
    mq.close()

    # D4 diversity selection: drop the most prototypical vectors of
    # each learned embedding cell, keep the diverse tail (r10)
    from quebic_spark.operators.similarity import diversity_sample

    kept = diversity_sample(spark, sf_dir, keep_pct=80)
    print("diversity:", kept.count(), "of",
          spark.read.parquet(f"{sf_dir}/embeddings.parquet").count(),
          "vectors kept at 80%")

    from quebic_spark.cache import clear_caches

    clear_caches(include_ivf_index=True)
    q.dispose()
    print("quickstart OK")


if __name__ == "__main__":
    main()
