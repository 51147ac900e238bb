"""One real-data sf1 evidence point for the output-linear claims
(VERDICT r18 next #4).

SCALE_SMOKE_64X replicates sf0.01 IN-MEMORY; its two worst growth
curves — ``minhash_lsh_pairs`` (6.2x at 64x rows) and ``strip_spans``
(2.9x) — are argued output-linear: the candidate-pair / affected-span
count itself grows, so wall time tracks OUTPUT size, not row-pairs.
This tool runs exactly those two operators once against MATERIALIZED
sf1-scale data (10x the bench's sf0.1, written to parquet on disk so
scans, partitioning, and shuffles are the real thing) and records
timing next to input/output cardinality.

Data: ``/root/testdata/sf1/documents.parquet`` when the driver ships
it; otherwise generated deterministically from sf0.1 — each source doc
becomes a 10-member replica-suffix family (the same near-dup scheme
the in-memory smoke uses, so every doc gains 9 close neighbors and the
dedup operators see worst-case span/pair density, not degenerate exact
copies) and written under a scratch dir. The JSON records which.

Reading the result: ``sec_per_output_krow`` is the claim made
measurable — if time tracked ROW PAIRS, 10x input with 10-member
families would inflate it ~10x; output-linear ops hold it roughly
flat between the sf0.1 and sf1 runs.

Usage::

    python tools/scale_sf1.py [--sf /root/testdata/sf0.1]
                              [--out SCALE_SMOKE_SF1.json]

Writes the JSON to the repo root and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF1_SHIPPED = "/root/testdata/sf1/documents.parquet"
FAMILY = 10  # sf0.1 -> sf1 is a 10x row scale-up


def ensure_sf1_docs(spark, sf_dir: str, scratch: str) -> tuple[str, bool]:
    """Path to an on-disk sf1 documents table, preferring the driver's
    own; (path, generated)."""
    if os.path.exists(SF1_SHIPPED):
        return SF1_SHIPPED, False
    from pyspark.sql import functions as F

    out = os.path.join(scratch, "documents.parquet")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        reps = spark.range(FAMILY).select(F.col("id").alias("rep"))
        (
            docs.crossJoin(reps)
            .select(
                (F.col("doc_id") + F.col("rep") * F.lit(n))
                .alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(" rtag"), F.col("rep")
                ).alias("text"),
                "lang", "source", "n_chars",
            )
            .repartition(8)
            .write.mode("overwrite").parquet(out)
        )
    return out, True


def timed_ops(spark, docs_path: str) -> dict:
    from quebic_spark import clear_caches
    from quebic_spark.operators.dedup import minhash_lsh_pairs, strip_spans

    docs = spark.read.parquet(docs_path)
    rows_in = docs.count()
    out: dict = {"rows_in": rows_in}
    for name, fn in (
        ("minhash_lsh_pairs",
         lambda d: minhash_lsh_pairs(d.select("doc_id", "text"))),
        ("strip_spans", strip_spans),
    ):
        clear_caches()
        spark.catalog.clearCache()
        t0 = time.time()
        rows_out = fn(docs).count()
        sec = round(time.time() - t0, 2)
        out[name] = {
            "sec": sec,
            "rows_out": rows_out,
            "sec_per_output_krow": round(sec / max(rows_out, 1) * 1000, 4),
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out", default=os.path.join(_REPO, "SCALE_SMOKE_SF1.json")
    )
    ap.add_argument("--scratch", default="/tmp/quebic_sf1")
    args = ap.parse_args()

    from quebic_spark.session import get_spark

    spark = get_spark(app_name="quebic_scale_sf1")
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    sf1_path, generated = ensure_sf1_docs(spark, args.sf, args.scratch)
    base = timed_ops(spark, f"{args.sf}/documents.parquet")
    big = timed_ops(spark, sf1_path)

    result = {
        "baseline_sf": args.sf,
        "sf1_path": sf1_path,
        "sf1_generated": generated,
        "sf1_recipe": (
            None if not generated else
            f"sf0.1 documents x{FAMILY} replica-suffix families, "
            "materialized to parquet (near-dup worst case: every doc "
            f"gains {FAMILY - 1} close neighbors)"
        ),
        "baseline": base,
        "sf1": big,
        "rows_growth": round(big["rows_in"] / base["rows_in"], 2),
    }
    for op in ("minhash_lsh_pairs", "strip_spans"):
        result[f"{op}_time_growth"] = round(
            big[op]["sec"] / max(base[op]["sec"], 1e-9), 2
        )
        result[f"{op}_output_growth"] = round(
            big[op]["rows_out"] / max(base[op]["rows_out"], 1), 2
        )
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
