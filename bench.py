"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_query_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": "..."}

Also measures queue push/pop against the reference baseline
(README.md:97-101: 3.597 ms/push, 2.198 ms/pop on 1 KiB BINARY items)
as `queue_push_1k` / `queue_pop_1k` entries (seconds for 1,000 single
records of 1 KiB, same workload shape as Performance.scala:10-51).
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def bench_queries(spark, sf_dir: str) -> tuple[dict[str, float], dict]:
    """Best-of-2 per query: the container's background load varies 2-3x
    between runs (observed same-code swings of that size), so a single
    sample measures whichever load spike it landed on; the min of two
    runs measures the plan. Methodology note: this is steady-state
    query cost — first-run classloading/page-cache effects are covered
    by the explicit warmups in main().

    Every sample is kept and reported (round-4 review: best-of-k minima
    alone made a 3.8x floor shift on an unchanged query undiagnosable),
    and operator-level cache handles are released between queries so one
    query's residency cannot tax the next — only the IVF index survives,
    deliberately (cross-query reuse is that operator's design).
    """
    from quebic_spark import clear_caches
    from quebic_spark.operators import QUERIES

    times: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name, fn in QUERIES.items():
        runs: list[float] = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            runs.append(round(time.time() - t0, 3))
            clear_caches()
        samples[name] = runs
        times[name] = min(runs)
    return times, samples


def bench_queue() -> dict[str, float]:
    from quebic_spark import BINARY, INTEGER, Queue, Schema

    rnd = random.Random(42)
    payload = bytes(rnd.getrandbits(8) for _ in range(1024))
    n = 1000

    def one_cycle() -> tuple[float, float]:
        path = tempfile.mkdtemp(prefix="quebic_bench_") + "/q"
        # parity with the reference's harness (Performance.scala:14-15):
        # auto-migration effectively off, one manual compaction between
        # the push and pop phases
        q = Queue(path, Schema(INTEGER, BINARY), capacity=n + 1,
                  auto_compact_files=None)
        pub, sub = q.publisher(), q.subscriber()
        t0 = time.time()
        for i in range(n):
            pub.try_push([i, payload])
        push_s = time.time() - t0
        q.compact()
        t0 = time.time()
        for _ in range(n):
            sub.try_pop()
        pop_s = time.time() - t0
        q.dispose()
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)
        return push_s, pop_s

    # best-of-3, same rationale as bench_queries: these are
    # rename/metadata-bound loops and background load swings them 2-3x
    # run to run; a cycle is a few seconds, so the extra runs are cheap
    # insurance. Medians are reported alongside (see main()) so the
    # best-of-k choice is visible, not hidden.
    cycles = [one_cycle() for _ in range(3)]
    pushes = sorted(c[0] for c in cycles)
    pops = sorted(c[1] for c in cycles)
    return {
        "queue_push_1k": round(pushes[0], 3),
        "queue_pop_1k": round(pops[0], 3),
    }, {
        "queue_push_1k_median": round(pushes[len(pushes) // 2], 3),
        "queue_pop_1k_median": round(pops[len(pops) // 2], 3),
        # raw per-cycle samples, same diagnosability contract as the
        # query `samples` field
        "queue_push_1k_samples": [round(c[0], 3) for c in cycles],
        "queue_pop_1k_samples": [round(c[1], 3) for c in cycles],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from quebic_spark.session import get_spark

    spark = get_spark(app_name="quebic_bench")
    # warm up the JVM/codegen paths so per-query numbers measure the
    # plan, not first-run classloading
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    # warm the Python/Arrow worker daemons too: whichever Pandas-UDF
    # query runs first otherwise pays worker spin-up — r2 recorded
    # multimodal_decode at 2.5 s vs 0.5 s with unchanged code purely
    # because registry reordering moved it to the front of the UDF pack
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    times, samples = bench_queries(spark, sf_dir)
    queue_best, queue_median = bench_queue()
    times.update(queue_best)
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf_dir,
                # methodology is part of the record: round-over-round
                # totals are only comparable when the sampling method
                # matches (queries best-of-2, queue cycles best-of-3;
                # queue medians reported for the load-swing context)
                "method": (
                    "queries_best_of_2_all_samples_reported"
                    ";caches_cleared_between_queries;queue_best_of_3"
                ),
                "samples": samples,
                "queue_median": queue_median,
            }
        )
    )


if __name__ == "__main__":
    main()
