"""Key-subset bucket layout (LakeTable bucket_cols — Iceberg's
partition-spec vs identifier-fields split): prefix locality, identical
merge semantics, one-shuffle preservation, read_prefix single-bucket
serving, CoW/MoR interleave, and layout validation."""

import tempfile

import pytest
from pyspark.sql import functions as F

from dbt_customer360_spark.lake.table import LakeTable

SCHEMA = "repo string, path string, v int, __max_lsn bigint"
KEYS = ["repo", "path"]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(n=60, repos=6):
    return [
        (f"r{i % repos}", f"p{i}", i, i) for i in range(n)
    ]


def _state(t):
    return sorted(
        (r.repo, r.path, r.v, r["__max_lsn"]) for r in t.read().collect()
    )


def test_bucket_cols_state_equals_full_key_layout(spark):
    """Same merges under bucket_cols=['repo'] and the default layout
    produce identical table state (the layout is physical only)."""
    a = LakeTable(spark, tempfile.mkdtemp(prefix="bc_a_"), buckets=4)
    b = LakeTable(
        spark, tempfile.mkdtemp(prefix="bc_b_"), buckets=4, bucket_cols=["repo"]
    )
    for t in (a, b):
        t.merge_lsn(_df(spark, _rows()), KEYS, batch_id="e0")
        t.merge_lsn(
            _df(spark, [("r1", "p1", 99, 100), ("r2", "pX", 5, 101)]),
            KEYS,
            batch_id="e1",
        )
    assert _state(a) == _state(b)


def test_prefix_colocation_and_touched_pruning(spark):
    """Every path of a repo lands in ONE bucket, and a batch touching
    one repo rewrites only that bucket's files."""
    t = LakeTable(
        spark, tempfile.mkdtemp(prefix="bc_loc_"), buckets=8, bucket_cols=["repo"]
    )
    t.merge_lsn(_df(spark, _rows(120, repos=8)), KEYS, batch_id="e0")
    m = t._read_manifest()
    # co-location: rows of each repo live in exactly one bucket dir
    per_bucket = {
        b: {r.repo for r in t._read_paths(m, paths).select("repo").collect()}
        for b, paths in m["files"].items()
    }
    repo_buckets = {}
    for b, repos in per_bucket.items():
        for r in repos:
            repo_buckets.setdefault(r, set()).add(b)
    assert all(len(bs) == 1 for bs in repo_buckets.values())
    # touched-bucket pruning: an update to one repo rewrites one bucket
    before = dict(m["files"])
    t.merge_lsn(_df(spark, [("r3", "p3", 77, 200)]), KEYS, batch_id="e1")
    after = t._read_manifest()["files"]
    changed = [b for b in after if after[b] != before.get(b)]
    assert changed == list(repo_buckets["r3"])


def test_one_shuffle_merge_preserved(spark):
    """HashPartitioning on the key subset must still satisfy the merge
    groupBy's clustering: exactly one Exchange in the merge plan."""
    t = LakeTable(
        spark, tempfile.mkdtemp(prefix="bc_plan_"), buckets=4, bucket_cols=["repo"]
    )
    t.merge_lsn(_df(spark, _rows()), KEYS, batch_id="e0")
    m = t._read_manifest()
    batch = _df(spark, [("r0", "p0", 1, 500)])
    unioned = t.read().withColumn("__is_target", F.lit(1)).unionByName(
        batch.withColumn("__is_target", F.lit(0))
    )
    cols = [n for n, _ in m["schema"]]
    row = F.struct(*[F.col(c) for c in cols])
    order = F.struct(F.col("__max_lsn"), F.col("__is_target"))
    merged = (
        unioned.repartition(4, "repo")
        .groupBy("repo", "path")
        .agg(F.max_by(row, order).alias("__w"))
        .select("__w.*")
    )
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_read_prefix_single_bucket(spark):
    t = LakeTable(
        spark, tempfile.mkdtemp(prefix="bc_rp_"), buckets=8, bucket_cols=["repo"]
    )
    t.merge_lsn(_df(spark, _rows(120, repos=8)), KEYS, batch_id="e0")
    # MoR delta on one of r3's paths: read_prefix must LWW-resolve it
    t.merge_lsn(_df(spark, [("r3", "p3", 42, 999)]), KEYS, batch_id="e1", mor=True)
    got = {(r.path): (r.v, r["__max_lsn"]) for r in t.read_prefix({"repo": "r3"}).collect()}
    expect_paths = {f"p{i}" for i in range(120) if i % 8 == 3}
    assert set(got) == expect_paths
    assert got["p3"] == (42, 999)
    # single-bucket scan: strictly fewer input files than the table
    pf = set(t.read_prefix({"repo": "r3"}).inputFiles())
    assert pf and pf < set(t.read().inputFiles())
    # wrong prefix keys refuse
    with pytest.raises(ValueError, match="layout columns"):
        t.read_prefix({"path": "p3"})


def test_read_prefix_refuses_full_key_layout_partial(spark):
    t = LakeTable(spark, tempfile.mkdtemp(prefix="bc_fk_"), buckets=4)
    t.merge_lsn(_df(spark, _rows()), KEYS, batch_id="e0")
    with pytest.raises(ValueError, match="layout columns"):
        t.read_prefix({"repo": "r1"})  # full-key layout: prefix ≠ bucket


def test_bucket_cols_subset_validation(spark):
    t = LakeTable(
        spark, tempfile.mkdtemp(prefix="bc_val_"), buckets=4, bucket_cols=["nope"]
    )
    with pytest.raises(ValueError, match="subset"):
        t.merge_lsn(_df(spark, _rows()), KEYS, batch_id="e0")


def test_rebucket_changes_prefix_layout(spark):
    t = LakeTable(spark, tempfile.mkdtemp(prefix="bc_rb_"), buckets=4)
    t.merge_lsn(_df(spark, _rows()), KEYS, batch_id="e0")
    state = _state(t)
    t.rebucket(8, bucket_cols=["repo"])
    assert _state(t) == state
    assert t._read_manifest()["bucket_cols"] == ["repo"]
    got = {r.path for r in t.read_prefix({"repo": "r1"}).collect()}
    assert got == {f"p{i}" for i in range(60) if i % 6 == 1}
