"""As-of (temporal point-in-time) join.

For every left row ``(key, ts)`` pick the single right row with the
same key and the greatest ``right_ts <= ts`` (``direction="backward"``,
the default) or the smallest ``right_ts >= ts`` (``"forward"``) —
the lookup the reference's incremental staging models approximate with
"latest record per key before the batch watermark" window scans
(models/staging: row_number over source-ordered partitions), and the
primitive a CDC consumer needs to enrich an event stream with the
dimension state *as of* the event time instead of the current state.

Spark has no ASOF JOIN, and the naive rendering — equi-join on the key
plus a ``right_ts <= ts`` theta filter, then a row_number window to keep
the latest — materialises every (event x older-version) pair before
pruning: O(|L| x versions-per-key) shuffle rows, quadratic on hot keys,
the classic 100 TB blow-up. This implementation uses the union-sort
shape instead:

  1. tag right rows side=0 carrying a struct payload, left rows side=1
     with a NULL payload;
  2. union and run ONE window per key ordered by (ts, side, tiebreak)
     taking ``last(payload, ignorenulls=True)`` over rows unbounded
     preceding — each left row sees exactly the latest right row at or
     before its timestamp (right sorts before left on ties, so an
     equal-timestamp right row IS visible, matching DuckDB/pandas
     ``merge_asof`` backward semantics);
  3. keep side=1 rows and unpack the struct.

Cost: ONE hash-partition shuffle of |L|+|R| rows on the key plus a
per-partition sort — linear, never pairwise, and AQE-splittable on
skewed keys. ``tiebreak`` makes equal-``right_ts`` winners
deterministic (greatest tiebreak wins), which a bare ASOF JOIN leaves
unspecified — required here because the oracle gate hash-compares
values.

``tolerance`` (seconds) turns stale matches into NULLs after the fact
(a filter on the matched payload, no second window): a backward match
further than ``tolerance`` behind the event is discarded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, TimestampNTZType, TimestampType

__all__ = ["asof_join"]


def _ts_seconds(col: Column, dtype: DataType) -> Column:
    # exact epoch-seconds double (microsecond fraction kept); NTZ has
    # no direct double cast and must hop through TIMESTAMP. Numeric ts
    # columns are already in caller units and pass through.
    if isinstance(dtype, TimestampNTZType):
        return col.cast("timestamp").cast("double")
    if isinstance(dtype, TimestampType):
        return col.cast("double")
    return col.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    *,
    direction: str = "backward",
    tiebreak: str | None = None,
    tolerance_s: int | None = None,
    matched_ts_col: str | None = None,
) -> DataFrame:
    """Return ``left`` with ``payload`` columns from the as-of matched
    right row (NULL when no right row qualifies).

    ``on``: equality key columns present on both sides. ``payload``:
    right columns to carry over (must not collide with left columns).
    ``tiebreak``: right column breaking equal-``right_ts`` ties
    (greatest wins); defaults to the first payload column.
    ``matched_ts_col``: when set, also emit the matched right row's
    timestamp under this name (needed by ``tolerance_s``, which is
    measured in seconds between the two timestamps).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    clash = [c for c in payload if c in left.columns]
    if clash:
        raise ValueError(f"payload columns collide with left columns: {clash}")
    tiebreak = tiebreak or payload[0]

    pay_struct = F.struct(
        *[F.col(c).alias(c) for c in payload],
        F.col(right_ts).alias("__rts"),
        F.col(tiebreak).alias("__tie"),
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        pay_struct.alias("__pay"),
    )
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__pay"].dataType).alias("__pay"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    r = r.withColumn("__lrow", F.lit(None).cast(l.schema["__lrow"].dataType))
    u = l.unionByName(r.select(*l.columns))

    if direction == "backward":
        # right(side 0) sorts before left(side 1) at equal ts -> inclusive;
        # among equal right ts the greatest tiebreak is LAST -> wins last()
        order = [F.col("__ts").asc(), F.col("__side").asc(), F.col("__pay.__tie").asc_nulls_first()]
    else:
        # forward: scan from the future down; right still sorts before
        # left at equal ts, smallest right_ts (and greatest tiebreak on
        # ties) must be the last value seen before the left row
        order = [F.col("__ts").desc(), F.col("__side").asc(), F.col("__pay.__tie").asc_nulls_first()]

    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__match", F.last("__pay", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1)

    if tolerance_s is not None:
        gap = F.abs(
            _ts_seconds(F.col("__ts"), left.schema[left_ts].dataType)
            - _ts_seconds(F.col("__match.__rts"), right.schema[right_ts].dataType)
        )
        out = out.withColumn(
            "__match",
            F.when(gap <= F.lit(tolerance_s), F.col("__match")),
        )

    cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    cols += [F.col(f"__match.{c}").alias(c) for c in payload]
    if matched_ts_col:
        cols.append(F.col("__match.__rts").alias(matched_ts_col))
    return out.select(*cols)
