"""SCD2 (slowly-changing-dimension type 2) history from a change
stream.

The reference materializes only the LATEST state per key (its
incremental models overwrite matched rows — staging row_number scans,
models/int_customer360__*.sql); auditing "what did this record look
like when?" needs the full version history with validity intervals.
This operator derives it from the raw ordered change feed:

  1. order each key's events by (order_by, tiebreak);
  2. suppress no-op versions — a row whose tracked attributes equal
     its predecessor's opens no new interval (lag-compare filter; the
     defining SCD2 compaction);
  3. every surviving row's ``valid_to`` is the NEXT surviving row's
     timestamp (lead), ``NULL`` = still open; ``is_current`` follows.

Delete semantics (``op_col``): a delete row participates in step 3 —
its timestamp closes the predecessor's interval — but emits no version
row itself, so a key ending in a delete has no current row, and a
later re-insert opens a fresh interval. Consecutive deletes collapse
in step 2 (their attribute images are equal... a delete's image is
normalized to NULL attrs + a delete marker so delete-after-delete is a
no-op and value-after-delete always reopens, even with identical
attrs).

Scale shape: both windows share ``partitionBy(key)`` — Catalyst plans
ONE hash exchange and per-partition sorts, no joins, no driver rows
(plan-pinned in tests/test_scd2.py). Skewed keys are bounded by
per-key history length, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_history"]


def scd2_history(
    df: DataFrame,
    key: list[str],
    order_by: str,
    attrs: list[str],
    tiebreak: str | None = None,
    op_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Version intervals per key: all ``key`` + ``attrs`` columns plus
    ``valid_from``, ``valid_to`` (NULL = open) and ``is_current``.

    ``attrs``: the tracked attribute columns (a change in ANY opens a
    new version; equality on all suppresses the row). ``tiebreak``
    breaks equal-``order_by`` events deterministically (defaults to
    ``order_by`` alone). ``op_col``: optional change-type column whose
    ``delete_op`` rows close intervals without opening one.
    """
    order = [F.col(order_by)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*key).orderBy(*order)

    is_del = (
        F.col(op_col) == F.lit(delete_op) if op_col else F.lit(False)
    )
    # normalized attribute image: deletes carry NULL attrs plus a
    # marker bit, so delete==delete (suppressed) but value==delete
    # never holds even when the raw attrs match
    img = F.struct(
        is_del.alias("__del"),
        *[
            F.when(~is_del, F.col(a)).alias(a)
            for a in attrs
        ],
    )
    d = df.withColumn("__img", img)
    d = d.withColumn("__prev", F.lag("__img").over(w))
    # keep rows that CHANGE the image (first row per key included)
    d = d.filter(~F.col("__img").eqNullSafe(F.col("__prev")))
    # valid_to = next surviving row's timestamp (delete rows included
    # here: a delete closes its predecessor)
    d = d.withColumn("__valid_to", F.lead(F.col(order_by)).over(w))
    out = d.filter(~F.col("__img.__del")).select(
        *[F.col(k) for k in key],
        *[F.col(a) for a in attrs],
        F.col(order_by).alias("valid_from"),
        F.col("__valid_to").alias("valid_to"),
        F.col("__valid_to").isNull().alias("is_current"),
    )
    return out
