"""dbt-style schema tests as a batch operator.

dbt ships four generic schema tests — ``not_null``, ``unique``,
``accepted_values``, ``relationships`` — that model ymls attach to
columns; the framework compiles each into a violations query and the
run fails when any returns rows. The reference repo leans on that
framework being available (its CI is `dbt test`), so an engine
replacing it needs the same primitive: declarative per-column checks
compiled into ONE pass per table producing a uniform report.

:func:`run_schema_tests` compiles a test spec into per-table jobs:

- all ``not_null`` + ``accepted_values`` checks on a table fuse into a
  SINGLE full-table aggregate (parallel conditional-count expressions,
  map-side combined — adding a check never adds a scan);
- each ``unique`` check is one groupBy on the tested columns counting
  groups seen more than once (the only check that must shuffle the
  key space);
- each ``relationships`` check is a LEFT ANTI join from the child's
  distinct FK values to the parent key — the anti join broadcasts
  whenever the parent is a dim, and the child side aggregates to
  distinct keys BEFORE the join so the fact table's row count never
  crosses the exchange.

The report is long-form ``(test, target, n_violations, passed)`` —
same shape as `dbt test` output, and trivially unionable across
tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null_violations(cols: list[str]) -> dict[str, F.Column]:
    """One conditional-count agg expression per column (fuse them into
    a single df.agg with the accepted_values counts)."""
    return {
        c: F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}") for c in cols
    }


def accepted_values_violations(col: str, values: list) -> F.Column:
    """Rows whose value is outside the accepted set. NULLs do NOT
    violate (that's not_null's job — same split dbt makes)."""
    return F.sum(
        (~F.col(col).isin(values) & F.col(col).isNotNull()).cast("long")
    )


def unique_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key groups that occur more than once; n_violations counts the
    EXTRA rows (dbt counts rows in duplicate groups — we report the
    stricter 'rows beyond the first', which is 0 iff dbt's is 0)."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("n"))
    )


def relationship_violations(
    child: DataFrame, fk: str, parent: DataFrame, pk: str
) -> DataFrame:
    """Distinct non-null child FK values with no matching parent key.
    Distinct-before-join: the anti join's left side is the FK key
    space, never the fact rows."""
    fks = child.filter(F.col(fk).isNotNull()).select(fk).distinct()
    keys = parent.select(F.col(pk).alias(fk)).distinct()
    return fks.join(keys, on=fk, how="left_anti").agg(
        F.count(F.lit(1)).alias("n")
    )


def run_schema_tests(
    spark,
    tables: dict[str, DataFrame],
    spec: dict,
) -> DataFrame:
    """Execute a dbt-style test spec and return the long-form report.

    ``spec`` per table: ``{"not_null": [cols], "unique": [[cols]],
    "accepted_values": {col: [values]}, "relationships":
    [(fk, parent_table, pk)]}``. Scalar counts (not_null /
    accepted_values — one fused agg per table; unique / relationships
    — one tiny agg each) are assembled into the report via a JVM
    LocalRelation, so the report itself costs no extra shuffle.
    """
    from dbt_customer360_spark.session import local_df

    rows: list[tuple] = []
    for tname, tspec in spec.items():
        df = tables[tname]
        aggs = []
        labels = []
        for c, expr in not_null_violations(tspec.get("not_null", [])).items():
            aggs.append(expr)
            labels.append(("not_null", f"{tname}.{c}"))
        for c, vals in tspec.get("accepted_values", {}).items():
            aggs.append(accepted_values_violations(c, vals))
            labels.append(("accepted_values", f"{tname}.{c}"))
        if aggs:
            counts = df.agg(*aggs).first()
            for (test, target), n in zip(labels, counts):
                rows.append((test, target, int(n or 0)))
        for cols in tspec.get("unique", []):
            cols = [cols] if isinstance(cols, str) else list(cols)
            n = unique_violations(df, cols).first()["n"]
            rows.append(("unique", f"{tname}.{'+'.join(cols)}", int(n)))
        for fk, ptable, pk in tspec.get("relationships", []):
            n = relationship_violations(df, fk, tables[ptable], pk).first()["n"]
            rows.append(
                ("relationships", f"{tname}.{fk}->{ptable}.{pk}", int(n))
            )
    out = local_df(
        spark,
        [(t, g, n, n == 0) for t, g, n in rows],
        "test string, target string, n_violations bigint, passed boolean",
    )
    return out
