"""Two-parallelism scaling evidence (BASELINE.json north_rule adaptation).

The rule demands throughput scaling efficiency >= 0.8 from N to 4N
executors; the sandbox substitute (task brief) is the same CDC replay
at local[8] vs local[32] on identical input. Each run happens in a
fresh subprocess so JVM/core settings are clean.

Writes BENCH/BASELINE.md with events/sec at both sizes + efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

RUNNER = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from dbt_customer360_spark.session import get_spark
from dbt_customer360_spark.sources.cdc import generate_change_events
from dbt_customer360_spark.streaming.apply import CDCApplier, replay_batch

cores = int(sys.argv[1]); n_events = int(sys.argv[2])
spark = get_spark(app=f"scaling-{{cores}}", cores=cores, shuffle_partitions=max(cores * 2, 16))
spark.sparkContext.setLogLevel("ERROR")
events = generate_change_events(spark, n_events=n_events, n_repos=200, paths_per_repo=100).persist()
events.count()
root = tempfile.mkdtemp(prefix="scaling_")
t0 = time.time()
ap = CDCApplier(spark, root + "/repos", buckets=max(cores, 16))
replay_batch(ap, events, n_batches=4)
dt = time.time() - t0
final_rows = ap.state().count()
shutil.rmtree(root, ignore_errors=True)
print(json.dumps({{"cores": cores, "sec": dt, "events_per_sec": n_events / dt, "final_rows": final_rows}}))
spark.stop()
"""


def run(cores: int, n_events: int) -> dict:
    script = RUNNER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n_events)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_events = int(os.environ.get("SPARK_GRAFT_SCALING_EVENTS", "400000"))
    r8 = run(8, n_events)
    r32 = run(32, n_events)
    eff = (r32["events_per_sec"] / r8["events_per_sec"]) / (32 / 8)
    md = f"""# BENCH/BASELINE — CDC replay scaling evidence

Sandbox substitute for the north_rule's N vs 4N executor criterion
(no real cluster available): the same job — generate a deterministic
{n_events:,}-event LSN-ordered change stream, replay it through the
foreachBatch-style applier (max-LSN dedup -> salted repartition ->
bucketed MERGE with tombstones + lineage) — at local[8] and local[32]
on identical input. Fresh subprocess per size.

| parallelism | wall sec | events/sec | final rows |
|---|---|---|---|
| local[8]  | {r8["sec"]:.1f} | {r8["events_per_sec"]:.0f} | {r8["final_rows"]} |
| local[32] | {r32["sec"]:.1f} | {r32["events_per_sec"]:.0f} | {r32["final_rows"]} |

**Scaling efficiency (8 -> 32 cores) = {eff:.3f}** (rule: >= 0.8 would
be 1.0 at perfect linear scaling; single-machine memory-bandwidth
limits apply — see notes).

Machine: 32 cores, 128 GiB, PySpark 4.1.2, local mode (single JVM).
Date: {time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())}.
"""
    with open(os.path.join(HERE, "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
