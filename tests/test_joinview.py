"""Incremental join view (lake/joinview.py): initial sync, fact-side
and dim-side incremental refreshes, retractions from both sides,
bucket-pruned dim-driven recompute, and convergence to the from-scratch
join after every step."""

import tempfile

from pyspark.sql import functions as F

from dbt_customer360_spark.lake.joinview import IncrementalJoinView
from dbt_customer360_spark.lake.table import LakeTable

FACT_DDL = "ok bigint, ck bigint, amount bigint"
DIM_DDL = "ck bigint, segment string"


def _setup(spark, bucket_cols=None):
    root = tempfile.mkdtemp(prefix="jv_")
    fact = LakeTable(spark, f"{root}/fact", buckets=8, bucket_cols=bucket_cols)
    dim = LakeTable(spark, f"{root}/dim", buckets=2)
    view = LakeTable(spark, f"{root}/view", buckets=8)
    # prefix-bucketing the fact on its fk requires the fk IN the merge
    # key (else an update could move a row across buckets) — the same
    # composite shape as the CDC repos table's (repo, path)
    jv = IncrementalJoinView(
        fact, dim, view, ["ck", "ok"], "ck", "ck", ["segment"], f"{root}/cursors"
    )
    return fact, dim, view, jv


def _fdf(spark, rows):
    return spark.createDataFrame(rows, FACT_DDL)


def _ddf(spark, rows):
    return spark.createDataFrame(rows, DIM_DDL)


def _expect(fact, dim):
    """From-scratch join the view must converge to after refresh."""
    f = fact.read()
    d = dim.read().select(F.col("ck"), "segment")
    return sorted(
        (r.ok, r.ck, r.amount, r.segment)
        for r in f.join(d, "ck", "inner").collect()
    )


def _got(view):
    return sorted(
        (r.ok, r.ck, r.amount, r.segment) for r in view.read().collect()
    )


def test_join_view_initial_and_fact_updates(spark):
    fact, dim, view, jv = _setup(spark)
    dim.merge(_ddf(spark, [(1, "gold"), (2, "basic")]), ["ck"], batch_id="d0")
    fact.merge(
        _fdf(spark, [(10, 1, 100), (11, 2, 50), (12, 9, 7)]), ["ck", "ok"], batch_id="f0"
    )
    jv.refresh()
    # ok=12 references no dim key -> excluded (inner join)
    assert _got(view) == _expect(fact, dim)
    assert (10, 1, 100, "gold") in _got(view) and len(_got(view)) == 2
    # fact update + delete + insert, one commit
    batch = spark.createDataFrame(
        [(10, 1, 999, False), (11, 2, 0, True), (13, 2, 5, False)],
        FACT_DDL + ", del boolean",
    )
    fact.merge(batch, ["ck", "ok"], batch_id="f1", delete_col="del")
    jv.refresh()
    assert _got(view) == _expect(fact, dim)
    got = dict(((r[0]), r[3]) for r in _got(view))
    assert 11 not in got and got[13] == "basic"
    # caught up: no-op
    assert jv.refresh() is None


def test_join_view_dim_updates_and_deletes(spark):
    fact, dim, view, jv = _setup(spark, bucket_cols=["ck"])
    dim.merge(_ddf(spark, [(1, "gold"), (2, "basic")]), ["ck"], batch_id="d0")
    fact.merge(
        _fdf(spark, [(i, 1 + i % 2, 10 * i) for i in range(20)]),
        ["ck", "ok"],
        batch_id="f0",
    )
    jv.refresh()
    assert _got(view) == _expect(fact, dim)
    # dim payload change: every ck=1 view row re-enriches
    dim.merge(_ddf(spark, [(1, "platinum")]), ["ck"], batch_id="d1")
    jv.refresh()
    assert _got(view) == _expect(fact, dim)
    assert {r[3] for r in _got(view) if r[1] == 1} == {"platinum"}
    # dim delete: ck=2 view rows retract; dim insert: ck=9 rows appear
    dim.merge(
        spark.createDataFrame([(2, None, True), (9, "new", False)],
                              DIM_DDL + ", del boolean"),
        ["ck"], batch_id="d2", delete_col="del",
    )
    fact.merge(_fdf(spark, [(100, 9, 1)]), ["ck", "ok"], batch_id="f1")
    jv.refresh()
    assert _got(view) == _expect(fact, dim)
    assert not [r for r in _got(view) if r[1] == 2]
    assert (100, 9, 1, "new") in _got(view)


def test_dim_driven_recompute_is_bucket_pruned(spark):
    """With fact bucket_cols=['ck'], the dim-driven recompute reads
    only the changed keys' buckets."""
    fact, dim, view, jv = _setup(spark, bucket_cols=["ck"])
    dim.merge(_ddf(spark, [(k, f"s{k}") for k in range(8)]), ["ck"], batch_id="d0")
    fact.merge(
        _fdf(spark, [(i, i % 8, i) for i in range(160)]), ["ck", "ok"], batch_id="f0"
    )
    jv.refresh()
    k = spark.createDataFrame([(3,)], "ck bigint")
    rows = jv._fact_rows_for_dim_keys(fact.current_snapshot_id(), k)
    files = set(rows.inputFiles())
    assert files and files < set(fact.read().inputFiles())
    assert {r.ck for r in rows.collect()} == {3}


def test_join_view_exactly_once_batch_id(spark):
    """Re-delivering the SAME span (crash before cursor commit) is a
    no-op via the view's batch ledger."""
    fact, dim, view, jv = _setup(spark)
    dim.merge(_ddf(spark, [(1, "gold")]), ["ck"], batch_id="d0")
    fact.merge(_fdf(spark, [(10, 1, 100)]), ["ck", "ok"], batch_id="f0")
    # simulate crash: refresh, then rewind the cursors and refresh again
    jv.refresh()
    state = _got(view)
    snap = view.current_snapshot_id()
    jv.fact_reader.commit(0)
    jv.dim_reader.commit(0)
    jv.refresh()  # same span 0->1 on both sides -> same batch id -> no-op
    assert view.current_snapshot_id() == snap
    assert _got(view) == state


def test_join_view_streaming_via_applier(spark):
    """The CDCApplier's per-epoch rollup hook drives the join view too
    (duck-typed refresh()): a replayed CDC stream keeps a repos ⋈
    repo-dim enrichment fresh after every epoch, with tombstone flips
    retracting through the fact_row_filter."""
    import tempfile as tf

    from dbt_customer360_spark.sources.cdc import generate_change_events
    from dbt_customer360_spark.streaming.apply import CDCApplier, replay_batch

    root = tf.mkdtemp(prefix="jv_stream_")
    ap = CDCApplier(spark, f"{root}/repos", buckets=8, bucket_cols=["repo"])
    dim = LakeTable(spark, f"{root}/dim", buckets=2)
    view = LakeTable(spark, f"{root}/view", buckets=8)
    events = generate_change_events(spark, n_events=4000, n_repos=10, paths_per_repo=6)
    repos = [r.repo for r in events.select("repo").distinct().collect()]
    dim.merge(
        spark.createDataFrame([(r, len(r)) for r in repos], "repo string, stars int"),
        ["repo"],
        batch_id="d0",
    )
    jv = IncrementalJoinView(
        ap.table, dim, view, ["repo", "path"], "repo", "repo", ["stars"],
        f"{root}/cursors",
        fact_row_filter="not coalesce(__deleted, false)",
    )
    ap.rollup = jv  # duck-typed: the applier refreshes after each epoch
    replay_batch(ap, events, n_batches=4)
    live = ap.table.read().filter(~F.col("__deleted"))
    expect = sorted(
        (r.repo, r.path, r.stars)
        for r in live.join(dim.read(), "repo").select("repo", "path", "stars").collect()
    )
    got = sorted((r.repo, r.path, r.stars) for r in view.read().collect())
    assert got == expect and len(got) > 0


def test_job_cli_join_view(spark):
    """--join-view through the spark-submit entry point: the replayed
    stream's enrichment view matches the from-scratch join of the
    final states; --join-view without --join-dim exits 2."""
    import io
    import sys as _sys
    import tempfile as tf
    from contextlib import redirect_stdout

    if "/root/repo" not in _sys.path:
        _sys.path.insert(0, "/root/repo")
    from jobs.cdc_replay_job import main as job_main

    root = tf.mkdtemp(prefix="jv_cli_")
    dim = LakeTable(spark, f"{root}/dim", buckets=4)
    dim.merge(
        spark.createDataFrame(
            [(f"org{i % 7}/repo{i}", i % 3) for i in range(64)],
            "repo string, tier int",
        ),
        ["repo"],
        batch_id="d0",
    )
    assert job_main(["--table", f"{root}/repos", "--join-view", f"{root}/view"]) == 2
    out = io.StringIO()
    with redirect_stdout(out):
        rc = job_main(
            ["--generate", "20000", "--table", f"{root}/repos", "--buckets", "8",
             "--batches", "2", "--join-view", f"{root}/view",
             "--join-dim", f"{root}/dim"]
        )
    assert rc == 0
    repos = LakeTable(spark, f"{root}/repos", buckets=8)
    live = repos.read().filter(~F.col("__deleted"))
    expect = sorted(
        (r.repo, r.path, r.tier)
        for r in live.join(dim.read(), "repo").select("repo", "path", "tier").collect()
    )
    view = LakeTable(spark, f"{root}/view", buckets=8)
    got = sorted((r.repo, r.path, r.tier) for r in view.read().collect())
    assert got == expect and got


def test_join_view_random_interleavings_converge(spark):
    """Seeded random interleavings of fact/dim upserts+deletes, with
    refreshes sometimes deferred across multiple commits (multi-span
    changelogs): after every refresh the view equals the from-scratch
    join. This is the property that makes delta-join IVM trustworthy —
    convergence independent of commit order and refresh cadence."""
    import random

    rng = random.Random(42)
    fact, dim, view, jv = _setup(spark, bucket_cols=["ck"])
    dim.merge(_ddf(spark, [(k, f"s{k}") for k in range(5)]), ["ck"], batch_id="d_init")
    fact.merge(
        _fdf(spark, [(i, i % 5, i) for i in range(30)]), ["ck", "ok"], batch_id="f_init"
    )
    jv.refresh()
    assert _got(view) == _expect(fact, dim)
    live_oks = set(range(30))
    next_ok = 30
    for rnd in range(6):
        if rng.random() < 0.7:  # fact commit: mixed upsert/insert/delete
            rows = []
            for _ in range(rng.randint(1, 6)):
                kind = rng.random()
                if kind < 0.4 and live_oks:  # update existing
                    ok = rng.choice(sorted(live_oks))
                    rows.append((ok, ok % 5, rng.randint(0, 999), False))
                elif kind < 0.7:  # insert new (possibly dangling fk 7)
                    rows.append((next_ok, rng.choice([0, 1, 2, 7]), next_ok, False))
                    live_oks.add(next_ok)
                    next_ok += 1
                elif live_oks:  # delete
                    ok = rng.choice(sorted(live_oks))
                    rows.append((ok, ok % 5, 0, True))
                    live_oks.discard(ok)
            if rows:
                # one row per key per batch: merge() is not LSN-ordered
                uniq = {r[0]: r for r in rows}
                fact.merge(
                    spark.createDataFrame(list(uniq.values()), FACT_DDL + ", del boolean"),
                    ["ck", "ok"], batch_id=f"f{rnd}", delete_col="del",
                )
        if rng.random() < 0.6:  # dim commit: re-segment or delete/revive a key
            k = rng.randint(0, 7)
            delete = rng.random() < 0.3
            dim.merge(
                spark.createDataFrame(
                    [(k, None if delete else f"s{k}v{rnd}", delete)],
                    DIM_DDL + ", del boolean",
                ),
                ["ck"], batch_id=f"d{rnd}", delete_col="del",
            )
        if rng.random() < 0.7:  # sometimes defer the refresh a round
            jv.refresh()
            assert _got(view) == _expect(fact, dim), f"diverged at round {rnd}"
    jv.refresh()
    assert _got(view) == _expect(fact, dim)


def test_dim_side_broadcast_is_key_pruned(spark):
    """The refresh's dim read is bucket-pruned to the candidate keys'
    buckets (never the whole dim), mirroring the fact side — the r5
    'whole-dim broadcast' scale gap."""
    fact, dim, view, jv = _setup(spark, bucket_cols=["ck"])
    dim.merge(_ddf(spark, [(k, f"s{k}") for k in range(64)]), ["ck"], batch_id="d0")
    fact.merge(
        _fdf(spark, [(i, i % 64, i) for i in range(64)]), ["ck", "ok"], batch_id="f0"
    )
    jv.refresh()
    # pick keys hashing to ONE of the dim's 2 buckets
    m = dim._read_manifest()
    probe = (
        _ddf(spark, [(k, "x") for k in range(64)])
        .select(F.col("ck"), dim._bucket_expr(["ck"], m).alias("__b"))
        .collect()
    )
    b0 = [r["ck"] for r in probe if str(r["__b"]) == "0"]
    assert b0, "expected some keys in bucket 0"
    keys = spark.createDataFrame([(k,) for k in b0[:3]], "ck bigint")
    rows = jv._bucket_pruned_rows(dim, dim.current_snapshot_id(), keys, "ck", ["ck"])
    files = set(rows.inputFiles())
    assert files and files < set(dim.read().inputFiles())
    # refresh correctness after a dim change is unchanged
    dim.merge(_ddf(spark, [(b0[0], "changed")]), ["ck"], batch_id="d1")
    jv.refresh()
    assert _got(view) == _expect(fact, dim)


def test_join_view_dim_before_first_fact_commit(spark):
    """A dim commit before the fact's FIRST commit is a clean no-op
    that still advances the dim cursor (r5 ADVICE #2)."""
    fact, dim, view, jv = _setup(spark)
    dim.merge(_ddf(spark, [(1, "gold")]), ["ck"], batch_id="d0")
    assert jv.refresh() is None
    assert jv.dim_reader.position() == dim.current_snapshot_id()
    # later commits on both sides then converge normally
    fact.merge(_fdf(spark, [(10, 1, 100)]), ["ck", "ok"], batch_id="f0")
    dim.merge(_ddf(spark, [(2, "basic")]), ["ck"], batch_id="d1")
    jv.refresh()
    assert _got(view) == _expect(fact, dim)
