"""Run ONE registry query in a fresh process + session; print one JSON line.

Purpose: attribute bench-loop tax. In-bench numbers run above isolated
reality because 50 queries share one JVM (heap fragmentation, codegen
cache churn, background GC). This harness is the ground truth the bench
loop is compared against: same warmups, same best-of-2 sampling, but a
process that has run nothing else.

Usage: python tools/isolated_query.py <query_name> [sf_dir]
Output: {"query": name, "samples": [s1, s2]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from quebic_spark import clear_caches
    from quebic_spark.operators import QUERIES
    from quebic_spark.session import get_spark

    spark = get_spark(app_name=f"isolated_{name}")
    # identical warmups to bench.py main(): measure the plan, not
    # classloading or Arrow worker spin-up
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    fn = QUERIES[name]
    runs: list[float] = []
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir).collect()
        runs.append(round(time.time() - t0, 2))
        # IDENTICAL reset policy to bench.py's _reset (r14 review: a
        # bare clear_caches() left the persisted IVF index resident,
        # so sample 2 of the similarity gates probed a memory-hot
        # index the in-bench samples never get — the "ground truth"
        # was measured under a cheaper caching policy than the loop
        # it adjudicates)
        clear_caches(include_ivf_index=True)
        spark.catalog.clearCache()
        spark._jvm.System.gc()
    print(json.dumps({"query": name, "samples": runs}))
    spark.stop()


if __name__ == "__main__":
    main()
