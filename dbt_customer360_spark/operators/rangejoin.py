"""Range (interval) joins via bin blocking.

Spark compiles ``l.v BETWEEN r.lo AND r.hi`` (optionally plus an
equality key) into a join whose range predicate is evaluated AFTER the
pairing: with an equality key it degrades to every (point x interval)
pair per key before filtering; without one it is a
BroadcastNestedLoopJoin — both quadratic, the 100 TB cliff. The
reference's date-window scans (models/int_customer360 activity joins)
stay small only because its engine runs single-node on pre-filtered
batches.

Bin blocking makes the range predicate an EQUI-join: pick a bin width
``W``; a point lands in bin ``floor(v/W)``; an interval [lo, hi]
covers bins ``floor(lo/W) .. floor(hi/W)`` (``F.sequence`` +
``explode``). A point inside an interval shares EXACTLY the point's
own bin with it, so joining on (key, bin) finds every true pair
exactly once — no distinct needed — and the residual ``between`` is a
cheap post-filter on an already-linear pair stream. Shuffle volume:
|points| + |intervals| x (avg interval length / W) rows, tunable by W.

For interval-x-interval overlap both sides explode, a pair shares
every bin their overlap covers, and the classic dedup-free trick keeps
the pair only in the FIRST shared bin (``bin == floor(max(lo_l,
lo_r)/W)``) — again exactly-once with zero extra shuffle.

Runaway intervals (hi - lo >> W) would fan out into thousands of
replicas; ``max_bins_per_interval`` raises JVM-side (``raise_error``
inside the sequence branch, no driver action) so a skewed input fails
fast instead of exploding the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

__all__ = ["point_in_interval_join", "interval_overlap_join"]


def _num(df: DataFrame, col: str) -> Column:
    # epoch-seconds double (with the microsecond fraction) for
    # timestamps — NTZ must hop through TIMESTAMP, it has no direct
    # double cast; numeric passthrough. Used for BINNING only; the
    # residual range filters compare the original columns exactly.
    dt = df.schema[col].dataType
    if isinstance(dt, TimestampNTZType):
        return F.col(col).cast("timestamp").cast("double")
    if isinstance(dt, TimestampType):
        return F.col(col).cast("double")
    return F.col(col).cast("double")


def _bins(lo: Column, hi: Column, width: float, cap: int) -> Column:
    lo_b = F.floor(lo / F.lit(width)).cast("long")
    hi_b = F.floor(hi / F.lit(width)).cast("long")
    n = hi_b - lo_b + F.lit(1)
    return F.when(
        n > F.lit(cap),
        F.raise_error(
            F.concat(
                F.lit(f"interval spans more than {cap} bins of width {width}: "),
                n.cast("string"),
                F.lit(" — raise bin_width or max_bins_per_interval"),
            )
        ).cast("array<long>"),
    ).otherwise(F.sequence(lo_b, hi_b))


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    *,
    bin_width: float,
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """Inner-join each point row to every interval row with the same
    ``on`` key and ``lo_col <= point <= hi_col`` (bounds inclusive).
    Result carries all point columns plus all non-key interval
    columns; each qualifying pair appears exactly once."""
    clash = [c for c in intervals.columns if c not in on and c in points.columns]
    if clash:
        raise ValueError(f"interval columns collide with point columns: {clash}")
    p = points.withColumn(
        "__bin", F.floor(_num(points, point_col) / F.lit(bin_width)).cast("long")
    )
    i = intervals.withColumn(
        "__bin",
        F.explode(
            _bins(
                _num(intervals, lo_col),
                _num(intervals, hi_col),
                bin_width,
                max_bins_per_interval,
            )
        ),
    )
    j = p.join(i, on=[*on, "__bin"], how="inner").filter(
        F.col(point_col).between(F.col(lo_col), F.col(hi_col))
    )
    return j.select(
        *[F.col(c) for c in points.columns],
        *[F.col(c) for c in intervals.columns if c not in on],
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    *,
    bin_width: float,
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """Inner-join interval rows whose [lo, hi] ranges overlap (bounds
    inclusive) within the same ``on`` key. Each overlapping pair is
    emitted exactly once — kept only in the first bin the pair shares
    (``floor(max(lo_l, lo_r)/W)``), never deduplicated."""
    clash = [c for c in right.columns if c not in on and c in left.columns]
    if clash:
        raise ValueError(f"right columns collide with left columns: {clash}")
    l = left.withColumn(
        "__bin",
        F.explode(
            _bins(_num(left, left_lo), _num(left, left_hi), bin_width, max_bins_per_interval)
        ),
    )
    r = right.withColumn(
        "__bin",
        F.explode(
            _bins(_num(right, right_lo), _num(right, right_hi), bin_width, max_bins_per_interval)
        ),
    )
    first_shared = F.floor(
        F.greatest(_num(left, left_lo), _num(right, right_lo)) / F.lit(bin_width)
    ).cast("long")
    j = (
        l.join(r, on=[*on, "__bin"], how="inner")
        .filter(
            (F.col(left_lo) <= F.col(right_hi)) & (F.col(right_lo) <= F.col(left_hi))
        )
        .filter(F.col("__bin") == first_shared)
    )
    return j.select(
        *[F.col(c) for c in left.columns],
        *[F.col(c) for c in right.columns if c not in on],
    )
