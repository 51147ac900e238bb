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
    from quebic_spark.operators import QUERIES
    from quebic_spark.session import get_spark

    # the SHARED warmup/reset helpers, not hand-synced copies (r16
    # review; the copies had already diverged once — r14: a bare
    # clear_caches() here left the persisted IVF index resident, so
    # the "ground truth" was measured under a cheaper caching policy
    # than the loop it adjudicates)
    from bench import reset_session, session_warmup

    spark = get_spark(app_name=f"isolated_{name}")
    session_warmup(spark, sf_dir)
    fn = QUERIES[name]
    runs: list[float] = []
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir).collect()
        runs.append(round(time.time() - t0, 2))
        reset_session(spark)
    print(json.dumps({"query": name, "samples": runs}))
    spark.stop()


if __name__ == "__main__":
    main()
