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


def _lsn_filter_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit rows whose lsn advances the per-key high watermark.

    Within one micro-batch the rows for a key may arrive unsorted and
    duplicated; a cummax over the lsn-sorted frame keeps exactly the
    advancing rows (vectorized — no python row loop)."""
    (max_lsn,) = state.get if state.exists else (-1,)
    for pdf in pdfs:
        pdf = pdf.sort_values("lsn", kind="mergesort")
        advancing = pdf[pdf["lsn"] > max_lsn]
        if len(advancing):
            keep = advancing[advancing["lsn"] > advancing["lsn"].shift(1, fill_value=max_lsn)]
            # sorted input: every remaining row strictly advances
            max_lsn = int(keep["lsn"].iloc[-1])
            yield keep
    state.update((max_lsn,))


def stateful_lsn_filter(events: DataFrame) -> DataFrame:
    """applyInPandasWithState high-watermark filter keyed by
    (repo, path): exactly-once-ish dedup for at-least-once upstreams,
    state = one long per live key."""
    return (
        events.select("repo", "path", "lsn", "op", "content")
        .groupBy("repo", "path")
        .applyInPandasWithState(
            _lsn_filter_fn,
            outputStructType=FILTER_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
