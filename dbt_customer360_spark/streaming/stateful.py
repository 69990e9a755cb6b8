"""Structured Streaming operators beyond foreachBatch MERGE.

First-class streaming shapes the task brief calls for:

- :func:`streaming_exact_dedup` — exact duplicate suppression with
  bounded state (``dropDuplicatesWithinWatermark``): the streaming
  twin of the batch hash-groupBy dedup, state evicted by watermark.

- :func:`windowed_change_counts` — event-time windowed aggregation
  with a watermark: per (window, repo) change counts that tolerate
  late/out-of-order CDC events up to the lateness bound and then
  finalize (append mode emits a window only once its watermark
  passes — the idiom for streaming rollup tables).
- :func:`stateful_lsn_filter` — a custom stateful operator via
  ``applyInPandasWithState``: keeps the per-(repo, path) max-LSN
  high-watermark in GroupState and emits only events that advance it.
  This is the streaming-native form of the applier's stale-replay
  rejection: duplicates and regressions are suppressed *before* the
  sink, so a downstream at-least-once writer only ever sees
  monotonically increasing LSNs per key.

Scale notes: both operators shuffle once on their grouping key and
keep state partitioned by it — state size is O(live keys) for the
filter and O(open windows x repos) for the counts; the watermark
bounds the latter. Arrow moves the state operator's batches
(input_hint: vectorized pandas UDFs, no per-row Python at the
DataFrame layer — inside the state function we touch only numpy/
pandas vector ops).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "max_lsn long"
FILTER_OUTPUT_SCHEMA = (
    "repo string, path string, lsn long, op string, content string"
)


def windowed_change_counts(
    events: DataFrame,
    window: str = "1 minute",
    lateness: str = "2 minutes",
) -> DataFrame:
    """Per (event-time window, repo) change counts with a watermark.

    Works on a streaming OR batch frame (batch ignores the watermark,
    which is exactly Spark's unified-semantics contract)."""
    return (
        events.withWatermark("ts", lateness)
        .groupBy(F.window("ts", window).alias("w"), F.col("repo"))
        .agg(
            F.count("*").alias("n_changes"),
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("n_deletes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "repo",
            "n_changes",
            "n_deletes",
        )
    )


def session_windows(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    lateness: str = "1 hour",
    type_col: str = "event_type",
) -> DataFrame:
    """Event-time SESSION windows per ``key``: consecutive events at
    most ``gap`` apart merge into one session; only a STRICTLY larger
    gap starts a new one (an event exactly ``gap`` after its
    predecessor lands on the session's closing boundary and extends
    it — pinned by a real-stream test). Emits (key, session_start,
    session_end = last event + gap, n_events, n_event_types).

    Unified batch/stream: on a stream the ``lateness`` watermark
    bounds the session-merge state (a session finalizes once the
    watermark passes its end — append mode emits it exactly once);
    on a batch frame the same plan computes the gaps-and-islands
    result directly. Scale: one shuffle on ``key``; state is O(open
    sessions), not O(events) — Spark merges overlapping per-event
    [ts, ts+gap) intervals inside the session-window aggregation.
    """
    df = events.withWatermark(ts_col, lateness) if events.isStreaming else events
    return (
        df.groupBy(F.col(key), F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.size(F.collect_set(type_col)).alias("n_event_types"),
        )
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "n_event_types",
        )
    )


def streaming_exact_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps one state row per distinct
    key and evicts it once the event-time watermark passes the row's
    timestamp plus ``delay`` — the streaming twin of the batch
    hash-groupBy exact dedup, for at-least-once CDC feeds that can
    redeliver the same (key, lsn) event within the lateness bound.

    Plain ``dropDuplicates`` on a stream grows state forever (every key
    ever seen); the watermark variant is the 100 TB-viable form — state
    is O(keys arriving within one lateness window). Works on a batch
    frame too (unified semantics: the watermark is ignored and it
    degrades to exact dropDuplicates)."""
    keys = keys or ["repo", "path", "lsn"]
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def _make_lsn_filter_fn(idle_timeout_ms: int | None, out_cols: list[str]):
    """Build the state function; ``idle_timeout_ms`` arms an EVENT-TIME
    timeout that evicts a key once the stream's watermark passes the
    key's last event time plus the TTL.

    Event-time (not processing-time) on purpose: with
    ``ProcessingTimeTimeout`` Spark's ``shouldRunAnotherBatch`` is
    unconditionally true, so a ``Trigger.AvailableNow`` run NEVER
    terminates (it keeps scheduling empty batches to poll wall-clock
    timeouts — measured in round 5). The event-time variant only
    re-runs while the watermark advances, and "idle" measured in
    stream time is the right semantic for a CDC feed anyway: a key is
    evicted because the feed has provably moved past it, not because
    the consumer paused."""

    def _lsn_filter_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Emit rows whose lsn advances the per-key high watermark.

        Within one micro-batch the rows for a key may arrive unsorted
        and duplicated; a cummax over the lsn-sorted frame keeps exactly
        the advancing rows (vectorized — no python row loop)."""
        if state.hasTimedOut:
            # idle past the TTL: drop the watermark. A later stale
            # replay for this key will pass THIS filter again — the
            # table's __max_lsn merge guard is the second line of
            # defense (lake/table.py), so correctness is preserved;
            # the trade buys bounded state on key-churning feeds.
            state.remove()
            return
        (max_lsn,) = state.get if state.exists else (-1,)
        max_ts = None
        for pdf in pdfs:
            if idle_timeout_ms is not None and len(pdf):
                t = pdf["ts"].max()
                if not pd.isna(t):
                    max_ts = t if max_ts is None else max(max_ts, t)
            pdf = pdf.sort_values("lsn", kind="mergesort")
            advancing = pdf[pdf["lsn"] > max_lsn]
            if len(advancing):
                keep = advancing[advancing["lsn"] > advancing["lsn"].shift(1, fill_value=max_lsn)]
                # sorted input: every remaining row strictly advances
                max_lsn = int(keep["lsn"].iloc[-1])
                yield keep[out_cols]
        state.update((max_lsn,))
        if idle_timeout_ms is not None and max_ts is not None:
            state.setTimeoutTimestamp(
                int(pd.Timestamp(max_ts).timestamp() * 1000) + idle_timeout_ms
            )

    return _lsn_filter_fn


# default instance kept importable for tests/back-compat
_lsn_filter_fn = _make_lsn_filter_fn(None, ["repo", "path", "lsn", "op", "content"])


def stateful_lsn_filter(
    events: DataFrame,
    idle_timeout_ms: int | None = None,
    ts_col: str = "ts",
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """applyInPandasWithState high-watermark filter keyed by
    (repo, path): exactly-once-ish dedup for at-least-once upstreams,
    state = one long per live key.

    ``idle_timeout_ms`` bounds state for key-churning feeds: a key
    whose last event time falls ``idle_timeout_ms`` behind the stream's
    watermark (``ts_col`` watermarked by ``watermark_delay``) is
    evicted via an event-time GroupState timeout. Stale replays for an
    evicted key then rely on the table's __max_lsn merge guard — the
    second line of defense — so the filter stays best-effort-exact
    with HARD-bounded state (O(keys active within one TTL window))
    instead of exact with O(all keys ever) state. Default None keeps
    the unbounded-but-exact behavior (state = live keys)."""
    out_cols = ["repo", "path", "lsn", "op", "content"]
    if idle_timeout_ms is None:
        inp = events.select(*out_cols)
        timeout = GroupStateTimeout.NoTimeout
    else:
        inp = events.withWatermark(ts_col, watermark_delay).select(*out_cols, ts_col)
        timeout = GroupStateTimeout.EventTimeTimeout
    return (
        inp.groupBy("repo", "path")
        .applyInPandasWithState(
            _make_lsn_filter_fn(idle_timeout_ms, out_cols),
            outputStructType=FILTER_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    *,
    lower_s: int = 0,
    upper_s: int = 3600,
    watermark: str = "10 minutes",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream inner join: right events within
    ``[left_ts + lower_s, left_ts + upper_s]`` of each left event on
    the same ``key`` — e.g. "purchases within an hour of a click".

    Both sides carry a watermark and the join condition carries the
    time-range bound — the TWO requirements Spark's streaming planner
    needs to age out buffered rows: each side's state holds only rows
    newer than (watermark − the interval width), so state is bounded
    by rate × (watermark + interval) regardless of stream length.
    Batch DataFrames take the same plan minus the state manager
    (unified semantics — the pytest pins stream ≡ batch on the same
    input). Right-side columns are prefixed to keep the joined schema
    collision-free.
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    rw = rw.select(
        F.col(key).alias(f"{right_prefix}{key}"),
        F.col(right_ts).alias(f"{right_prefix}{right_ts}"),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in (key, right_ts)
        ],
    )
    rk, rt = f"{right_prefix}{key}", f"{right_prefix}{right_ts}"
    cond = (
        (F.col(key) == F.col(rk))
        & (F.col(rt) >= F.col(left_ts) + F.expr(f"INTERVAL {lower_s} SECONDS"))
        & (F.col(rt) <= F.col(left_ts) + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    return lw.join(rw, cond, "inner").drop(rk)
