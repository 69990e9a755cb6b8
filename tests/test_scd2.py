"""SCD2 history operator (operators/scd2.py): version intervals with
consecutive-duplicate suppression and delete-closes-interval
semantics, plus the one-exchange plan pin."""

from pyspark.sql import functions as F

from dbt_customer360_spark.operators.scd2 import scd2_history


def _hist(spark, rows, **kw):
    df = spark.createDataFrame(rows, "k string, ts long, op string, v string")
    out = scd2_history(
        df, ["k"], "ts", ["v"], tiebreak="ts", op_col="op", **kw
    )
    return sorted(
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current) for r in out.collect()
    )


def test_versions_suppression_deletes_reopen(spark):
    rows = [
        ("a", 1, "insert", "x"),
        ("a", 2, "update", "x"),   # no-op: suppressed
        ("a", 3, "update", "y"),   # new version
        ("a", 4, "delete", "y"),   # closes y, emits nothing
        ("a", 5, "delete", "y"),   # delete-after-delete: suppressed
        ("a", 6, "insert", "y"),   # SAME attrs after delete -> reopens
        ("b", 7, "insert", None),  # NULL attrs are a real version
        ("b", 8, "update", None),  # suppressed (NULL == NULL image)
        ("c", 9, "delete", "z"),   # delete of unknown key: no output
    ]
    assert _hist(spark, rows) == [
        ("a", "x", 1, 3, False),
        ("a", "y", 3, 4, False),   # closed BY the delete's timestamp
        ("a", "y", 6, None, True),
        ("b", None, 7, None, True),
    ]


def test_no_op_col_pure_attribute_tracking(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("a", 3, "y"), ("a", 4, "x")],
        "k string, ts long, v string",
    )
    out = scd2_history(df, ["k"], "ts", ["v"])
    got = sorted((r.v, r.valid_from, r.valid_to) for r in out.collect())
    assert got == [("x", 1, 2), ("x", 4, None), ("y", 2, 4)]
    assert [r.is_current for r in out.orderBy("valid_from").collect()] == [
        False,
        False,
        True,
    ]


def test_plan_single_exchange_no_join(spark):
    df = spark.createDataFrame([("a", 1, "x")], "k string, ts long, v string")
    plan = (
        scd2_history(df, ["k"], "ts", ["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
