"""Dump .explain('formatted') for named roster queries to files.

Usage:
    python tools/dump_plans.py <repo_root> <out_dir> <suffix> <query> [...]

Writes <out_dir>/<query>_<suffix>.txt for each query. Driver-side
planning only (no job execution) — safe to run next to a bench.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    repo, out_dir, suffix, *names = sys.argv[1:]
    sys.path.insert(0, repo)
    from dbt_customer360_spark.plans.queries import EXTRA_QUERIES, QUERIES
    from dbt_customer360_spark.session import get_spark

    roster = {**QUERIES, **EXTRA_QUERIES}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app="dump_plans", cores="4")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = roster[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
