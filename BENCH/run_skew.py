"""Hot-key skew evidence: salted vs unsalted merge on a stream where
ONE key carries SPARK_GRAFT_SKEW_HOT percent (default 99) of events,
driven through the REAL spark-submit --py-files job surface
(north_rule invocation shape), with partition-grain lineage on.

The engine's default one-shuffle merge hash-partitions the union by the
merge keys (repo, path) — the layout that makes the groupBy and the
bucketed write exchange-free. On a single-hot-key stream
(one monorepo file churning), that shuffle piles the hot key into a single
reducer task; ``--hot-key-salt S`` switches to the two-phase salted
merge (phase 1 reduces per (key, salt) so the hot key fans out over S
reducers; phase 2 collapses the <= S candidates per key) at the cost of
one extra (tiny) shuffle. This harness measures both on identical
staged input and appends the numbers to BENCH/BASELINE.md.

Protocol mirrors BENCH/run_scaling.py: staged parquet input, fresh
subprocess + fresh tmpfs table per run, untimed OS-cache warm,
interleaved best-of-N on this time-shared host. Both configs also run
``--lineage-grain partition`` so the per-source-partition lineage path
is exercised end-to-end under skew.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

GEN = r"""
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from dbt_customer360_spark.session import get_spark
from dbt_customer360_spark.sources.cdc import generate_change_events

out_dir, n_events, hot_pct = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(app="skew-gen", cores=32)
spark.sparkContext.setLogLevel("ERROR")
ev = generate_change_events(spark, n_events=n_events, n_repos=500, paths_per_repo=200)
# redirect hot_pct% of events onto ONE (repo, path) key — the
# pathological single-hot-key stream the salt knob exists for
# (one monorepo file churning; deterministic pick)
hot = F.pmod(F.xxhash64("lsn", F.lit(1234)), F.lit(100)) < hot_pct
ev = ev.withColumn("repo", F.when(hot, F.lit("hot/repo")).otherwise(F.col("repo")))
ev = ev.withColumn("path", F.when(hot, F.lit("src/hot_file.c")).otherwise(F.col("path")))
ev.repartitionByRange(128, "lsn").write.mode("overwrite").parquet(out_dir)
print(json.dumps({{"staged": n_events}}))
spark.stop()
"""


def _build_zip(work: str) -> str:
    zip_path = os.path.join(work, "engine.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "dbt_customer360_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith((".py", ".csv")):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zip_path


def _spark_submit() -> str:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _run_job(zip_path: str, events_dir: str, salt: int | None, n_events: int) -> dict:
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix=f"skew_{salt or 0}_", dir=shm)
    # shuffle on DISK, not tmpfs: shuffle temp files intermittently
    # vanish mid-job on this host's /dev/shm (ENOENT on temp_shuffle
    # create); identical setting for both configs keeps the salted vs
    # unsalted comparison fair
    shuffle_dir = tempfile.mkdtemp(prefix=f"skew_shuf_{salt or 0}_")
    env = dict(os.environ, SPARK_GRAFT_CPUS="32", SPARK_GRAFT_DRIVER_MEM="24g")
    cmd = [
        _spark_submit(),
        "--master", "local[32]",
        # --driver-memory MUST be on the submit command line: the
        # session builder's spark.driver.memory is ignored once
        # spark-submit has already launched the JVM, so without this
        # the job runs on the 1g default and OOMs (observed as task
        # aborts + phantom missing temp_shuffle files)
        "--driver-memory", "24g",
        "--conf", f"spark.local.dir={shuffle_dir}",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "cdc_replay_job.py"),
        "--events", events_dir,
        "--table", f"{work}/repos",
        "--lineage", f"{work}/lineage",
        "--mode", "batch", "--batches", "4", "--buckets", "64",
        "--dense-batches", "--lineage-grain", "partition",
    ]
    if salt:
        cmd += ["--hot-key-salt", str(salt)]
    t0 = time.time()
    lines = []
    for attempt in range(2):  # one retry: transient task aborts happen on this shared host
        out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3000)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if lines:
            break
        shutil.rmtree(f"{work}/repos", ignore_errors=True)
        shutil.rmtree(f"{work}/lineage", ignore_errors=True)
        shutil.rmtree(shuffle_dir, ignore_errors=True)
        os.makedirs(shuffle_dir, exist_ok=True)
        print(f"run failed (attempt {attempt + 1}): {out.stderr[-800:]}", file=sys.stderr)
    if not lines:
        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(shuffle_dir, ignore_errors=True)
        raise RuntimeError("job failed twice; see stderr above")
    res = json.loads(lines[-1])
    res["events_per_sec"] = n_events / res["wall_sec"]
    res["submit_wall"] = round(time.time() - t0, 1)
    shutil.rmtree(work, ignore_errors=True)
    shutil.rmtree(shuffle_dir, ignore_errors=True)
    return res


SECTION = "## Hot-key skew: salted vs unsalted merge"


def main() -> None:
    n_events = int(os.environ.get("SPARK_GRAFT_SKEW_EVENTS", "16000000"))
    hot_pct = int(os.environ.get("SPARK_GRAFT_SKEW_HOT", "99"))
    repeats = int(os.environ.get("SPARK_GRAFT_SKEW_REPEATS", "3"))
    salt = int(os.environ.get("SPARK_GRAFT_SKEW_SALT", "32"))
    events_dir = tempfile.mkdtemp(prefix="skew_events_")
    workdir = tempfile.mkdtemp(prefix="skew_zip_")
    runs: dict[str, list[dict]] = {"unsalted": [], "salted": []}
    try:
        subprocess.run(
            [sys.executable, "-c", GEN.format(repo=REPO), events_dir, str(n_events), str(hot_pct)],
            check=True, capture_output=True, text=True, timeout=3000,
        )
        zip_path = _build_zip(workdir)
        # untimed cache warm: first run reads the staged parquet cold
        _run_job(zip_path, events_dir, None, n_events)
        for _ in range(repeats):  # interleave configs against host drift
            runs["unsalted"].append(_run_job(zip_path, events_dir, None, n_events))
            runs["salted"].append(_run_job(zip_path, events_dir, salt, n_events))
    finally:
        shutil.rmtree(events_dir, ignore_errors=True)
        shutil.rmtree(workdir, ignore_errors=True)

    b_un = min(runs["unsalted"], key=lambda r: r["wall_sec"])
    b_sa = min(runs["salted"], key=lambda r: r["wall_sec"])
    speedup = b_sa["events_per_sec"] / b_un["events_per_sec"]
    assert b_un["final_rows"] == b_sa["final_rows"], (
        "salted and unsalted merges must produce identical final state"
    )
    md = f"""
{SECTION}

{n_events:,} change events, {hot_pct}% of them on ONE (repo, path)
key (one monorepo file churning) —
generated deterministically, staged as parquet, replayed via
spark-submit --py-files (jobs/cdc_replay_job.py) at local[32] in 4
micro-batches with --lineage-grain partition, fresh tmpfs table per
run. The default one-shuffle merge repartitions by the merge keys, so
the hot key serializes into a single reducer; --hot-key-salt {salt}
switches to the two-phase combine-first salted merge.

| config | wall sec | events/sec | final rows |
|---|---|---|---|
| unsalted (one-shuffle) | {b_un["wall_sec"]:.1f} | {b_un["events_per_sec"]:.0f} | {b_un["final_rows"]} |
| salted (--hot-key-salt {salt}) | {b_sa["wall_sec"]:.1f} | {b_sa["events_per_sec"]:.0f} | {b_sa["final_rows"]} |

**Salted speedup on the skewed stream: x{speedup:.2f}** (best of
{repeats} interleaved runs per config; all runs: unsalted
{[round(r["wall_sec"], 1) for r in runs["unsalted"]]} s, salted
{[round(r["wall_sec"], 1) for r in runs["salted"]]} s). Identical
final_rows across configs pins salted == unsalted result equivalence
on this stream (the unit suite additionally pins byte-identical
state). On an un-skewed stream the one-shuffle plan stays the default:
salting spends an extra shuffle to buy combine-first reduction, which
only pays when one key dominates whole partitions.
Date: {time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())}.
"""
    path = os.path.join(HERE, "BASELINE.md")
    base = ""
    if os.path.exists(path):
        with open(path) as f:
            base = f.read()
        base = re.split(re.escape(SECTION), base)[0].rstrip() + "\n"
    with open(path, "w") as f:
        f.write(base + md)
    print(md)


if __name__ == "__main__":
    main()
