"""Dump .explain('formatted') for registry queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> <q1,q2,...> [sf_dir]
Writes plans/<tag>/<query>_<suffix>.txt (suffix from $QUEBIC_PLAN_SUFFIX,
default 'before').
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    suffix = os.environ.get("QUEBIC_PLAN_SUFFIX", "before")
    out_dir = os.path.join(_REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    from quebic_spark.operators import QUERIES
    from quebic_spark.session import get_spark

    from bench import reset_session, session_warmup

    spark = get_spark(app_name=f"plans_{tag}")
    session_warmup(spark, sf_dir)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        reset_session(spark)
    spark.stop()


if __name__ == "__main__":
    main()
