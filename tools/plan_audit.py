"""Physical-plan audit over every live gate: the scale-design claims
("one exchange", "pushdown reaches the scan", "small side broadcast",
"whole-stage codegen") as MEASURED numbers instead of prose.

For each ``GATE_ORDER`` query this prints/records, from the EXECUTED
plan string at the given scale factor:

  * n_exchange           — shuffle count (hashpartitioning etc.)
  * n_broadcast          — broadcast exchanges (small-side joins)
  * n_wholestage         — WholeStageCodegen spans (JVM-side compute)
  * n_python_eval        — Arrow/Python eval nodes (the slow path;
                           should only appear where pandas UDFs are
                           the design)
  * has_pushed_filters   — a scan carries PushedFilters beyond []
  * n_scans              — FileScan/BatchScan nodes

Usage:
    python tools/plan_audit.py [--sf /root/testdata/sf0.01] [--out PLAN_AUDIT.json]

The driver-facing artifact (``PLAN_AUDIT.json``) lets a reviewer check
any operator's plan-shape claim without re-deriving the plan.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit_plan(plan: str) -> dict:
    return {
        "n_exchange": len(re.findall(r"\bExchange (?!SinglePartition)",
                                     plan)),
        "n_single_partition": len(
            re.findall(r"\bExchange SinglePartition", plan)
        ),
        "n_broadcast": plan.count("BroadcastExchange"),
        # executedPlan().toString() renders codegen spans as "*(N) Op"
        # operator prefixes, not the literal "WholeStageCodegen" node
        # name (that only appears in formatted explain) — count the
        # DISTINCT span ids so nested operators in one span count once
        "n_wholestage": len(set(re.findall(r"\*\((\d+)\) ", plan))),
        "n_python_eval": (
            plan.count("ArrowEvalPython")
            + plan.count("BatchEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
        ),
        "has_pushed_filters": bool(
            re.search(r"PushedFilters: \[[^\]]+\]", plan)
        ),
        "n_scans": len(re.findall(r"FileScan|BatchScan", plan)),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from quebic_spark.operators import ALL_QUERIES, GATE_ORDER
    from quebic_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(
        app_name="quebic_plan_audit",
        master=f"local[{cpus}]",
        shuffle_partitions=32,
    )
    names = (
        args.only.split(",") if args.only else list(GATE_ORDER)
    )
    out: dict[str, dict] = {}
    for name in names:
        try:
            df = ALL_QUERIES[name](spark, args.sf)
            # Execute before capturing: under AQE the pre-execution
            # plan is isFinalPlan=false with NO codegen "*(N)" prefixes
            # (r6's audit read 0 for every gate). Must run THIS df's
            # own QueryExecution — a noop write wraps a fresh one and
            # leaves this AdaptiveSparkPlanExec unfinalized. Gate
            # outputs are driver-small by contract (the driver
            # collects them too), so collect() is safe here.
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            out[name] = audit_plan(plan)
        except Exception as e:  # noqa: BLE001 — audit must not abort
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        finally:
            from quebic_spark.cache import clear_caches

            clear_caches(include_ivf_index=True)
    record = {"sf": args.sf, "plans": out}
    line = json.dumps(record)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(record, fh, indent=1)
    # a gate that cannot even build its plan is an audit failure, not
    # a row to gloss over (review catch: unconditional exit 0)
    n_err = sum(1 for v in out.values() if "error" in v)
    if n_err:
        print(f"{n_err} gate(s) errored", file=sys.stderr)
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
