"""Per-query isolation bench (guide §1.4) — NOT the driver metric.

Times any subset of the roster with the noop sink, interleaved
min-of-N (same methodology as bench.py), at any data directory —
used for the before/after evidence in OPTIMIZATION_r06.md, including
the synthetic 10x scale-up of sf0.1 that reproduces the driver's
sf=1.0 escalation locally.

    python bench_extra.py [--sf DIR] [--reps N] [query ...]

With no query names, runs bench.py's full BENCH_QUERIES roster
(queries only — the CDC probes stay in bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from bench import BENCH_QUERIES
    from dbt_customer360_spark.plans.queries import EXTRA_QUERIES, QUERIES
    from dbt_customer360_spark.session import get_spark

    roster = {**QUERIES, **EXTRA_QUERIES}
    names = args.queries or BENCH_QUERIES
    spark = get_spark(app="bench_extra", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    best: dict[str, float] = {}
    for _ in range(args.reps):
        for name in names:
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            roster[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            best[name] = min(best.get(name, float("inf")), dt)
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": args.sf, "reps": args.reps, "queries": best,
                      "total": round(sum(best.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
