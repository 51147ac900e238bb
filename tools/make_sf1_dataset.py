"""Materialize a full sf1 dataset (10x the driver's sf0.1) for the
second-scale-point bench run (VERDICT r19 next #4).

``tools/scale_sf1.py`` builds a worst-case NEAR-DUP documents table
for the dedup output-linearity evidence; this tool builds ALL ten
tables with NEUTRAL 10x replication so per-gate bench times at sf1
read as a clean second scale point (input grows 10x, outputs grow
~10x or stay constant — a gate growing faster than its input+output
is the flag to investigate):

* ``region`` / ``nation`` — copied as-is (fixed dimensions, the
  TPC-H convention: scale factor never grows them);
* fact/dimension tables (``customer supplier part orders lineitem
  events``) — 10 replicas with every key column shifted by
  ``rep * (max_key + 1)`` so referential joins stay 1:1 per replica
  (a customer's order count, a user's event count, and join
  selectivities are scale-invariant);
* ``documents`` — doc_id shifted; text vowels are permuted per
  replica (a literal ``translate``), which breaks shingle overlap so
  replicas are NOT near-duplicates of each other — minhash/jaccard
  candidate structure grows linearly, not quadratically, unlike the
  deliberate worst case in scale_sf1.py;
* ``embeddings`` — vec_id shifted; components CYCLICALLY SHIFTED by
  a per-replica offset (norm- and distribution-preserving, but the
  cosine between a vector and its rotation is near-random), so
  replicas are semantically unrelated points. A first attempt nudged
  every component by a per-replica constant — cosine stayed ~1, every
  10-family became a semantic-dup cluster, and semantic_dedup's sf1
  time read 35x (correctly tracking the exploded pair OUTPUT, but
  useless as a neutral scale point).

Usage::

    python tools/make_sf1_dataset.py [--sf /root/testdata/sf0.1]
                                     [--out /tmp/quebic_sf1_full]

Then: SPARK_GRAFT_SF_DIR=<out> python bench.py  ->  BENCH_SF1.json
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

FAMILY = 10

# ten distinct vowel permutations; replica 0 is the identity so the
# original corpus is a verbatim subset
_VOWELS = "aeiou"
_PERMS = [
    "aeiou", "eioua", "iouae", "ouaei", "uaeio",
    "aeuio", "eoiau", "iaueo", "oieua", "uoaie",
]


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def build(spark, sf_dir: str, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)

    def write(df, name, parts):
        dst = os.path.join(out_dir, f"{name}.parquet")
        if _done(dst):
            return
        df.repartition(parts).write.mode("overwrite").parquet(dst)

    def src(name):
        return spark.read.parquet(
            os.path.join(sf_dir, f"{name}.parquet")
        )

    # fixed dims: verbatim
    for name in ("region", "nation"):
        write(src(name), name, 1)

    def shift(df, cols: dict[str, int], rep: int, extra=None):
        out = df
        for col, base in cols.items():
            out = out.withColumn(
                col,
                (F.col(col) + F.lit(rep * base)).cast("long"),
            )
        if extra is not None:
            out = extra(out, rep)
        return out

    def replicate(name, keycols, parts, extra=None):
        dst = os.path.join(out_dir, f"{name}.parquet")
        if _done(dst):
            return
        df = src(name)
        bases = {
            c: int(df.agg(F.max(c)).first()[0]) + 1 for c in keycols
        }
        reps = [
            shift(df, bases, rep, extra) for rep in range(FAMILY)
        ]
        allr = reps[0]
        for r in reps[1:]:
            allr = allr.unionByName(r)
        allr.repartition(parts).write.mode("overwrite").parquet(dst)

    replicate("customer", ["c_custkey"], 2)
    replicate("supplier", ["s_suppkey"], 1)
    replicate("part", ["p_partkey"], 2)
    replicate("orders", ["o_orderkey", "o_custkey"], 8)
    replicate(
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey"], 16,
    )
    replicate("events", ["event_id", "user_id"], 8)

    def doc_extra(df, rep):
        perm = _PERMS[rep % len(_PERMS)]
        return df.withColumn(
            "text", F.translate(F.col("text"), _VOWELS, perm)
        )

    replicate("documents", ["doc_id"], 8, extra=doc_extra)

    emb_dim = len(
        src("embeddings").select("embedding").first()["embedding"]
    )

    def emb_extra(df, rep):
        off = (rep * max(1, emb_dim // FAMILY)) % emb_dim
        if off == 0:
            return df
        return df.withColumn(
            "embedding",
            F.expr(
                f"concat(slice(embedding, {off + 1}, "
                f"{emb_dim - off}), slice(embedding, 1, {off}))"
            ),
        )

    replicate("embeddings", ["vec_id"], 8, extra=emb_extra)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/quebic_sf1_full")
    args = ap.parse_args()

    from quebic_spark.session import get_spark

    spark = get_spark(app_name="quebic_make_sf1")
    build(spark, args.sf, args.out)
    import json

    counts = {
        t: spark.read.parquet(
            os.path.join(args.out, f"{t}.parquet")
        ).count()
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings")
    }
    print(json.dumps({"out": args.out, "rows": counts}))
    spark.stop()


if __name__ == "__main__":
    main()
