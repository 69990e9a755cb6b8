"""Merge-on-read vs copy-on-write write-amplification evidence.

A dense CDC stream touches (essentially) every bucket each epoch, so
copy-on-write rewrites the WHOLE table once per micro-batch — at E
epochs the bytes written are ~E x final-table-size. Merge-on-read
(``--write-mode mor``) appends only the epoch's deduped delta files
and folds them with ONE compaction at the end: bytes written are
~input + 1 x final-table-size regardless of E. This harness replays
the same staged stream both ways at an epoch count high enough for
the amplification to dominate (default 16), through the REAL
spark-submit --py-files job surface, and appends the numbers to
BENCH/BASELINE.md.

Protocol mirrors BENCH/run_skew.py: staged parquet input, fresh
subprocess + fresh table per run, untimed OS-cache warm, interleaved
best-of-N on this time-shared host. The MoR runs include
``--final-compact`` so both configs END base-only with identical
physical layouts — the comparison is end-state-fair, not a deferred
cost hiding in the read path.
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
from dbt_customer360_spark.session import get_spark
from dbt_customer360_spark.sources.cdc import generate_change_events

out_dir, n_events = sys.argv[1], int(sys.argv[2])
spark = get_spark(app="mor-gen", cores=32)
spark.sparkContext.setLogLevel("ERROR")
ev = generate_change_events(spark, n_events=n_events, n_repos=500, paths_per_repo=200)
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


def _run_job(
    zip_path: str, events_dir: str, mode: str, n_events: int, batches: int
) -> dict:
    work = tempfile.mkdtemp(prefix=f"morbench_{mode}_")
    shuffle_dir = tempfile.mkdtemp(prefix=f"morbench_shuf_{mode}_")
    env = dict(os.environ, SPARK_GRAFT_CPUS="32", SPARK_GRAFT_DRIVER_MEM="24g")
    cmd = [
        _spark_submit(),
        "--master", "local[32]",
        "--driver-memory", "24g",
        "--conf", f"spark.local.dir={shuffle_dir}",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "cdc_replay_job.py"),
        "--events", events_dir,
        "--table", f"{work}/repos",
        "--mode", "batch", "--batches", str(batches), "--buckets", "64",
        "--maintenance-every", "0",
        "--write-mode", mode,
    ]
    if mode == "cow":
        cmd += ["--dense-batches"]
    else:
        cmd += ["--final-compact"]
    lines = []
    for attempt in range(2):
        out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3000)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if lines:
            break
        shutil.rmtree(f"{work}/repos", ignore_errors=True)
        shutil.rmtree(shuffle_dir, ignore_errors=True)
        os.makedirs(shuffle_dir, exist_ok=True)
        print(f"run failed (attempt {attempt + 1}): {out.stderr[-800:]}", file=sys.stderr)
    if not lines:
        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(shuffle_dir, ignore_errors=True)
        raise RuntimeError("job failed twice; see stderr above")
    res = json.loads(lines[-1])
    res["events_per_sec"] = n_events / res["wall_sec"]
    shutil.rmtree(work, ignore_errors=True)
    shutil.rmtree(shuffle_dir, ignore_errors=True)
    return res


SECTION = "## Merge-on-read vs copy-on-write replay"


def main() -> None:
    n_events = int(os.environ.get("SPARK_GRAFT_MOR_EVENTS", "16000000"))
    batches = int(os.environ.get("SPARK_GRAFT_MOR_BATCHES", "16"))
    repeats = int(os.environ.get("SPARK_GRAFT_MOR_REPEATS", "3"))
    events_dir = tempfile.mkdtemp(prefix="mor_events_")
    workdir = tempfile.mkdtemp(prefix="mor_zip_")
    runs: dict[str, list[dict]] = {"cow": [], "mor": []}
    try:
        subprocess.run(
            [sys.executable, "-c", GEN.format(repo=REPO), events_dir, str(n_events)],
            check=True, capture_output=True, text=True, timeout=3000,
        )
        zip_path = _build_zip(workdir)
        _run_job(zip_path, events_dir, "cow", n_events, batches)  # cache warm, untimed
        for _ in range(repeats):
            runs["cow"].append(_run_job(zip_path, events_dir, "cow", n_events, batches))
            runs["mor"].append(_run_job(zip_path, events_dir, "mor", n_events, batches))
    finally:
        shutil.rmtree(events_dir, ignore_errors=True)
        shutil.rmtree(workdir, ignore_errors=True)

    b_cow = min(runs["cow"], key=lambda r: r["wall_sec"])
    b_mor = min(runs["mor"], key=lambda r: r["wall_sec"])
    speedup = b_mor["events_per_sec"] / b_cow["events_per_sec"]
    assert b_cow["final_rows"] == b_mor["final_rows"], (
        "MoR and CoW replays must produce identical final state"
    )
    md = f"""
{SECTION}

{n_events:,} change events replayed in {batches} micro-batches via
spark-submit --py-files (jobs/cdc_replay_job.py) at local[32], 64
buckets, fresh table per run. CoW (--dense-batches) rewrites every
touched bucket each epoch — ~{batches} full-table rewrites on this
dense stream. MoR (--write-mode mor --final-compact) appends each
epoch's deduped delta files (no target read or rewrite) and folds
them with ONE end-of-replay compaction, so both configs finish with
identical base-only physical layouts.

| config | wall sec | events/sec | final rows |
|---|---|---|---|
| copy-on-write | {b_cow["wall_sec"]:.1f} | {b_cow["events_per_sec"]:.0f} | {b_cow["final_rows"]} |
| merge-on-read + 1 fold | {b_mor["wall_sec"]:.1f} | {b_mor["events_per_sec"]:.0f} | {b_mor["final_rows"]} |

**MoR speedup at {batches} epochs: x{speedup:.2f}** (best of
{repeats} interleaved runs per config; all runs: cow
{[round(r["wall_sec"], 1) for r in runs["cow"]]} s, mor
{[round(r["wall_sec"], 1) for r in runs["mor"]]} s). Identical
final_rows pins result equivalence (the unit suite pins byte-identical
state and the oracle gate attests cdc_final_state_mor against the SQL
closed form). The gap GROWS with epoch count — CoW write bytes are
O(epochs x table), MoR's are O(input + table) — which is exactly the
10^10-event regime the north_rule targets. CoW remains the right
default for read-heavy tables: MoR reads pay one LWW resolution until
compaction, and maybe_compact counts delta files as full debt so
steady-state streams fold automatically.
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
