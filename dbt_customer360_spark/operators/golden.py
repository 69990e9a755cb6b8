"""Golden-record serving: the reference's confidence-ranking idiom.

Five output models repeat one pattern (SURVEY.md §2.5, e.g.
customer360__name.sql:110-139):

    value_count        = count(*)            over (partition by id, value)
    value_last_updated = max(coalesce(u,c))  over (partition by id, value)
    confidence_rank    = dense_rank() over (partition by id order by
                           [garbage-values-last,] value_count desc,
                           value_last_updated desc)
    index              = row_number() over (same order)
    golden value       = rows where index = 1

``rank_values`` generalizes it; tie-breaks get a deterministic final
key (the value itself) so results are stable across partitionings —
the warehouse version is nondeterministic on ties (SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

GARBAGE_NAMES = ["permanently deleted", "placeholder contact", "not available"]


def rank_values(
    df: DataFrame,
    entity_col: str | Column,
    value_col: str,
    recency_col: Column | None = None,
    garbage_values: list[str] | None = None,
    deterministic: bool = True,
    tie_break_cols: list[str] | None = None,
) -> DataFrame:
    """Attach value_count, value_last_updated_at, confidence_rank, index.

    ``tie_break_cols``: secondary value columns appended to the window
    order (after the primary value) so multi-column attributes — phone
    (phone, extension), address (line_1, line_2, city, ...) — get a
    FULLY deterministic index even when the primary value ties
    (round-1 advice: index=1 must be stable across partitionings)."""
    entity = F.col(entity_col) if isinstance(entity_col, str) else entity_col
    value_w = Window.partitionBy(entity, F.col(value_col))
    df = df.withColumn("value_count", F.count("*").over(value_w))
    if recency_col is not None:
        df = df.withColumn("value_last_updated_at", F.max(recency_col).over(value_w))
    else:
        df = df.withColumn("value_last_updated_at", F.lit(None).cast("timestamp"))

    order = []
    if garbage_values:
        order.append(
            F.when(F.lower(F.col(value_col)).isin(garbage_values), 0).otherwise(1).desc()
        )
    order.append(F.col("value_count").desc())
    order.append(F.coalesce(F.col("value_last_updated_at"), F.lit("1970-01-01").cast("timestamp")).desc())
    if deterministic:
        order.append(F.col(value_col).asc_nulls_last())
        for c in tie_break_cols or []:
            if c != value_col:
                order.append(F.col(c).cast("string").asc_nulls_last())
    rank_w = Window.partitionBy(entity).orderBy(*order)
    return df.withColumn("confidence_rank", F.dense_rank().over(rank_w)).withColumn(
        "index", F.row_number().over(rank_w)
    )


def best_values(df: DataFrame, *cols: str) -> DataFrame:
    """index = 1 filter (customer360__summary.sql:53-100)."""
    return df.filter(F.col("index") == 1).select(*cols)


def weighted_avg(value_avg: Column, weight: Column) -> Column:
    """safe_divide(sum(avg*count), sum(count)) (customer360__customer.sql:92-96)."""
    num = F.sum(value_avg * weight)
    den = F.sum(weight)
    return F.when(den != 0, num / den)
