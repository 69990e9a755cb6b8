"""Watermarked windowed aggregation + applyInPandasWithState operator.

Late-data semantics are exercised with a real two-trigger file stream:
trigger 1 advances the event-time watermark, trigger 2 delivers a
late event that must be DROPPED and a stale LSN that must be
suppressed by the stateful high-watermark filter.
"""

import os
import tempfile
import time

from pyspark.sql import functions as F

from dbt_customer360_spark.streaming import stateful

EVENT_DDL = "repo string, path string, lsn long, op string, content string, ts timestamp"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, EVENT_DDL).coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)  # distinct mtimes -> deterministic trigger order


def _ts(minute, second=0):
    import datetime as dt

    return dt.datetime(2024, 1, 1, 10, minute, second)


def _run_two_trigger_stream(spark, src, build_query, sink_name):
    reader = spark.readStream.schema(EVENT_DDL).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        build_query(reader)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {sink_name}")


def test_windowed_counts_drop_late_events(spark):
    src = tempfile.mkdtemp(prefix="stream_win_")
    # trigger 1: two events in the 10:00 window, one at 10:05 that
    # pushes the watermark to 10:03 (lateness = 2 minutes)
    _write_batch(spark, src, [
        ("r1", "a", 1, "update", "c1", _ts(0, 10)),
        ("r1", "b", 2, "update", "c2", _ts(0, 20)),
        ("r1", "c", 3, "update", "c3", _ts(5, 0)),
    ])
    # trigger 2: the 10:00 window (end 10:01 < watermark 10:03) is
    # finalized and its state evicted during this batch
    _write_batch(spark, src, [
        ("r1", "x", 9, "update", "cx", _ts(6, 0)),
    ])
    # trigger 3: a LATE event for the already-finalized 10:00 window —
    # guaranteed dropped (window end is below the watermark and the
    # state is gone); plus a fresh event far ahead
    _write_batch(spark, src, [
        ("r1", "d", 4, "update", "c4", _ts(0, 30)),
        ("r1", "e", 5, "delete", None, _ts(9, 0)),
    ])
    out = _run_two_trigger_stream(
        spark, src, lambda df: stateful.windowed_change_counts(df), "win_counts"
    )
    rows = {r.window_start.minute: r.n_changes for r in out.collect()}
    assert rows.get(0) == 2  # late 10:00:30 event was dropped


def test_streaming_exact_dedup_within_watermark(spark):
    """At-least-once redelivery of the SAME (repo, path, lsn) across
    triggers is suppressed while inside the lateness bound; distinct
    lsns pass. State is bounded by the watermark (eviction itself is a
    timing property; the operator contract pinned here is dedup)."""
    src = tempfile.mkdtemp(prefix="stream_dedup_")
    _write_batch(spark, src, [
        ("r1", "p", 1, "insert", "v1", _ts(0)),
        ("r1", "p", 1, "insert", "v1", _ts(0)),   # in-batch duplicate
        ("r1", "p", 2, "update", "v2", _ts(1)),
    ])
    _write_batch(spark, src, [
        ("r1", "p", 2, "update", "v2", _ts(1)),   # cross-trigger redelivery
        ("r1", "p", 3, "update", "v3", _ts(2)),
        ("r2", "q", 1, "insert", "w1", _ts(2)),
    ])
    out = _run_two_trigger_stream(
        spark, src, lambda df: stateful.streaming_exact_dedup(df, delay="10 minutes"),
        "dedup_sink",
    )
    rows = [(r.repo, r.path, r.lsn) for r in out.collect()]
    assert sorted(rows) == [
        ("r1", "p", 1), ("r1", "p", 2), ("r1", "p", 3), ("r2", "q", 1),
    ]


def test_stateful_lsn_filter_suppresses_stale_replays(spark):
    src = tempfile.mkdtemp(prefix="stream_lsn_")
    _write_batch(spark, src, [
        ("r1", "p", 1, "insert", "v1", _ts(0)),
        ("r1", "p", 3, "update", "v3", _ts(1)),
        ("r1", "p", 3, "update", "v3", _ts(1)),  # in-batch duplicate
        ("r1", "p", 2, "update", "v2", _ts(2)),
    ])
    _write_batch(spark, src, [
        ("r1", "p", 2, "update", "v2-stale", _ts(3)),  # stale replay
        ("r1", "p", 3, "update", "v3-stale", _ts(3)),  # equal -> stale
        ("r1", "p", 5, "update", "v5", _ts(4)),
        ("r2", "q", 1, "insert", "w1", _ts(4)),
    ])
    out = _run_two_trigger_stream(
        spark, src, lambda df: stateful.stateful_lsn_filter(df), "lsn_filtered"
    )
    got = {(r.repo, r.path, r.lsn): r.content for r in out.collect()}
    # batch 1 emits the in-order advancing prefix 1,2,3 (sorted within
    # the batch); batch 2 only the genuinely new lsn 5 + the new key
    assert set(got) == {
        ("r1", "p", 1), ("r1", "p", 2), ("r1", "p", 3), ("r1", "p", 5), ("r2", "q", 1),
    }
    assert got[("r1", "p", 5)] == "v5"
    assert got[("r1", "p", 3)] == "v3"  # not the stale replay's payload


def test_stateful_lsn_filter_idle_ttl_evicts_state(spark, tmp_path):
    """r4 VERDICT Next #5: with idle_timeout_ms set, a key whose last
    event time falls TTL behind the watermark is evicted on a later
    trigger — a subsequent STALE lsn for it passes the filter again
    (proving eviction), which is exactly why the table's __max_lsn
    merge guard stays the second line of defense. Without the TTL the
    same stale event is suppressed. Event-time timeout, so no
    wall-clock sleeps: trigger 2's fresh events advance the watermark
    past trigger 1's keys."""
    import shutil

    def run_stream(src, ck, sink, ttl):
        reader = spark.readStream.schema(EVENT_DDL).parquet(src)
        q = (
            stateful.stateful_lsn_filter(
                reader, idle_timeout_ms=ttl, watermark_delay="10 seconds"
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180) is True

    def scenario(ttl, tag):
        src = str(tmp_path / f"src_{tag}")
        ck = str(tmp_path / f"ck_{tag}")
        sink = str(tmp_path / f"out_{tag}")
        # trigger 1: key A advances to lsn 5; key B to lsn 1 (ts 10:00)
        _write_batch(spark, src, [
            ("rA", "p", 5, "insert", "a5", _ts(0)),
            ("rB", "q", 1, "insert", "b1", _ts(0)),
        ])
        run_stream(src, ck, sink, ttl)
        # trigger 2 carries data ONLY for B, 10 minutes later: the
        # watermark moves to ~10:09:50, far past A's 1-minute TTL
        # deadline (10:01) — A's event-time timeout fires (timeouts
        # fire for keys WITHOUT data once the watermark passes)
        _write_batch(spark, src, [("rB", "q", 2, "update", "b2", _ts(10))])
        run_stream(src, ck, sink, ttl)
        # trigger 3: a stale replay for A (lsn 3 < 5)
        _write_batch(spark, src, [("rA", "p", 3, "update", "a3-stale", _ts(11))])
        run_stream(src, ck, sink, ttl)
        out = {(r.repo, r.path, r.lsn) for r in spark.read.parquet(sink).collect()}
        shutil.rmtree(src, ignore_errors=True)
        return out

    with_ttl = scenario(60_000, "ttl")
    # state for rA was evicted -> the stale lsn 3 re-passes the filter
    assert ("rA", "p", 3) in with_ttl
    assert {("rA", "p", 5), ("rB", "q", 1), ("rB", "q", 2)} <= with_ttl

    no_ttl = scenario(None, "nottl")
    # NoTimeout keeps state forever -> the stale replay stays suppressed
    assert ("rA", "p", 3) not in no_ttl
    assert {("rA", "p", 5), ("rB", "q", 1), ("rB", "q", 2)} == no_ttl


def test_session_windows_finalize_with_watermark(spark):
    """Session windows on a real stream: events < gap apart merge, a
    gap >= `gap` splits, and a session is emitted (append mode)
    exactly once — after the watermark passes its end."""
    src = tempfile.mkdtemp(prefix="stream_sess_")
    # session A: two events 5 min apart (gap = 10 minutes)
    _write_batch(spark, src, [
        ("r1", "a", 1, "update", "c1", _ts(0, 0)),
        ("r1", "b", 2, "insert", "c2", _ts(5, 0)),
    ])
    # exactly-gap boundary: 10:15 is 10 min after 10:05 — EXTENDS the
    # session (closing-boundary adjacency merges; the oracle's strict
    # > comparator encodes the same rule); 10:27 is 12 min after
    # 10:15 — strictly past the gap, so it opens session B
    _write_batch(spark, src, [
        ("r1", "c", 3, "update", "c3", _ts(15, 0)),
        ("r1", "d", 4, "update", "c4", _ts(27, 0)),
    ])
    # far-future event: watermark (lateness 1 min) passes both
    # sessions' ends so they finalize and emit
    _write_batch(spark, src, [
        ("r2", "z", 9, "update", "cz", _ts(59, 0)),
    ])
    out = _run_two_trigger_stream(
        spark,
        src,
        lambda df: stateful.session_windows(
            df, key="repo", gap="10 minutes", lateness="1 minute", type_col="op"
        ),
        "sess_win",
    )
    got = {
        (r.repo, r.session_start.minute, r.session_end.minute, r.n_events, r.n_event_types)
        for r in out.collect()
    }
    # session A: [10:00, 10:15 + 10min = 10:25) — the exact-gap 10:15
    # event merged in — 3 events, 2 op types
    # session B: [10:27, 10:37), 1 event — opened by the 12-min gap
    assert (("r1", 0, 25, 3, 2) in got) and (("r1", 27, 37, 1, 1) in got), got


def test_stream_stream_interval_join(spark):
    """Two real file streams joined within a per-key time interval:
    results equal the batch theta join over the same input (unified
    semantics), and the plan is a streaming symmetric-hash join with
    watermark state bounds (no unbounded buffering)."""
    clicks_ddl = "user string, ts timestamp, page string"
    buys_ddl = "user string, ts timestamp, amount long"
    croot = tempfile.mkdtemp(prefix="ssj_clicks_")
    broot = tempfile.mkdtemp(prefix="ssj_buys_")
    clicks = [
        ("u1", _ts(0), "home"),
        ("u1", _ts(10), "item"),
        ("u2", _ts(5), "home"),
    ]
    buys = [
        ("u1", _ts(3), 100),   # joins the 10:00 click (within 30 min)
        ("u1", _ts(50), 200),  # joins NO click (>30 min after both)
        ("u2", _ts(20), 300),  # joins u2's 10:05 click
    ]
    spark.createDataFrame(clicks, clicks_ddl).write.mode("append").parquet(croot)
    spark.createDataFrame(buys, buys_ddl).write.mode("append").parquet(broot)

    def build(l, r):
        return stateful.stream_stream_interval_join(
            l, r, "user", "ts", "ts", lower_s=0, upper_s=1800,
            watermark="1 hour",
        )

    ls = spark.readStream.schema(clicks_ddl).parquet(croot)
    rs = spark.readStream.schema(buys_ddl).parquet(broot)
    q = (
        build(ls, rs)
        .writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ssj_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300) is True
    stream_rows = sorted(
        (r.user, r.page, r.r_amount)
        for r in spark.sql("select * from ssj_out").collect()
    )
    batch = build(
        spark.createDataFrame(clicks, clicks_ddl),
        spark.createDataFrame(buys, buys_ddl),
    )
    batch_rows = sorted((r.user, r.page, r.r_amount) for r in batch.collect())
    assert stream_rows == batch_rows
    # the 10:03 buy follows only the 10:00 click (buys join FORWARD
    # within [click, click+30min]); the 10:10 click has no later buy
    assert stream_rows == [("u1", "home", 100), ("u2", "home", 300)]
    assert all(a != 200 for _, _, a in stream_rows)  # out-of-interval buy
