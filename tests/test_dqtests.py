"""dbt-style schema tests (operators/dqtests.py): each check's
violation semantics on hand-built frames, the fused single-agg plan,
and the anti-join shape of relationships."""

from pyspark.sql import functions as F

from dbt_customer360_spark.operators import dqtests


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_run_schema_tests_report(spark):
    child = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, None, 30), (3, "zz", None)],
        "id bigint, status string, fk bigint",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk bigint")
    report = dqtests.run_schema_tests(
        spark,
        {"child": child, "parent": parent},
        {
            "child": {
                "not_null": ["status", "fk"],
                "accepted_values": {"status": ["a", "b"]},
                "unique": [["id"]],
                "relationships": [("fk", "parent", "pk")],
            }
        },
    )
    got = {(r.test, r.target): (r.n_violations, r.passed) for r in report.collect()}
    assert got[("not_null", "child.status")] == (1, False)
    assert got[("not_null", "child.fk")] == (1, False)
    # NULL status does not violate accepted_values (not_null's job)
    assert got[("accepted_values", "child.status")] == (1, False)  # only 'zz'
    assert got[("unique", "child.id")] == (1, False)  # one extra row for id=1
    # fk=30 has no parent; NULL fk is not an orphan
    assert got[("relationships", "child.fk->parent.pk")] == (1, False)


def test_all_green_report(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string")
    report = dqtests.run_schema_tests(
        spark,
        {"t": df},
        {"t": {"not_null": ["id", "s"], "unique": [["id"]],
               "accepted_values": {"s": ["a", "b"]}}},
    )
    assert all(r.passed and r.n_violations == 0 for r in report.collect())


def test_scalar_checks_fuse_into_one_agg(spark):
    """All not_null + accepted_values checks on a table are parallel
    agg expressions over ONE scan — adding a check adds no scan."""
    df = spark.createDataFrame([(1, "a")], "id bigint, s string")
    aggs = [
        F.sum(F.col("id").isNull().cast("long")),
        F.sum(F.col("s").isNull().cast("long")),
        dqtests.accepted_values_violations("s", ["a"]),
    ]
    plan = _plan(df.agg(*aggs))
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 1


def test_relationship_distinct_before_join(spark):
    """The anti join's left side is the distinct FK key space, pinned
    by an aggregate below the join in the plan."""
    child = spark.createDataFrame([(i % 3,) for i in range(100)], "fk bigint")
    parent = spark.createDataFrame([(0,), (1,)], "pk bigint")
    df = dqtests.relationship_violations(child, "fk", parent, "pk")
    assert df.first()["n"] == 1  # fk=2 orphaned
    plan = _plan(df)
    assert "LeftAnti" in plan
