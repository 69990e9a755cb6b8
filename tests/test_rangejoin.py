"""Bin-blocked range joins (operators/rangejoin.py): exactly-once
pairing pinned against the naive theta join on seeded random data,
across bin widths (pair set must be width-invariant), plus the
JVM-side runaway-interval guard and a plan pin that the pairing is an
equi-join, never a nested-loop/cartesian."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.errors import PySparkException

from dbt_customer360_spark.operators.rangejoin import (
    interval_overlap_join,
    point_in_interval_join,
)


def _data(spark, seed=7, nk=5, npts=300, nint=120):
    rng = np.random.default_rng(seed)
    pts = pd.DataFrame(
        {
            "k": rng.integers(0, nk, npts).astype(str),
            "v": rng.integers(0, 1000, npts).astype(float),
            "pid": np.arange(npts),
        }
    )
    lo = rng.integers(0, 950, nint).astype(float)
    ivs = pd.DataFrame(
        {
            "k": rng.integers(0, nk + 1, nint).astype(str),
            "lo": lo,
            "hi": lo + rng.integers(0, 120, nint),
            "iid": np.arange(nint),
        }
    )
    return spark.createDataFrame(pts), spark.createDataFrame(ivs)


@pytest.mark.parametrize("width", [7.0, 64.0, 1000.0])
def test_point_in_interval_matches_theta_join(spark, width):
    p, i = _data(spark)
    got = {
        (r.pid, r.iid)
        for r in point_in_interval_join(
            p, i, ["k"], "v", "lo", "hi", bin_width=width
        ).collect()
    }
    exp = {
        (r.pid, r.iid)
        for r in p.alias("p")
        .join(i.alias("i"), (F.col("p.k") == F.col("i.k")) & F.col("p.v").between(F.col("i.lo"), F.col("i.hi")))
        .select("pid", "iid")
        .collect()
    }
    assert got == exp and exp  # same pairs, non-trivial


@pytest.mark.parametrize("width", [13.0, 200.0])
def test_interval_overlap_exactly_once(spark, width):
    _, a = _data(spark, seed=1)
    _, b = _data(spark, seed=2)
    b = b.withColumnRenamed("lo", "blo").withColumnRenamed("hi", "bhi").withColumnRenamed("iid", "bid")
    rows = interval_overlap_join(
        a, b, ["k"], "lo", "hi", "blo", "bhi", bin_width=width
    ).collect()
    pairs = [(r.iid, r.bid) for r in rows]
    assert len(pairs) == len(set(pairs))  # wide intervals never duplicate a pair
    exp = {
        (r.iid, r.bid)
        for r in a.join(b, on="k")
        .filter((F.col("lo") <= F.col("bhi")) & (F.col("blo") <= F.col("hi")))
        .collect()
    }
    assert set(pairs) == exp and exp


def test_runaway_interval_raises_jvm_side(spark):
    p = spark.createDataFrame([("a", 5.0, 1)], "k string, v double, pid int")
    i = spark.createDataFrame([("a", 0.0, 1e9, 1)], "k string, lo double, hi double, iid int")
    with pytest.raises(PySparkException, match="bins"):
        point_in_interval_join(
            p, i, ["k"], "v", "lo", "hi", bin_width=1.0, max_bins_per_interval=100
        ).collect()


def test_plan_is_equi_join_not_nested_loop(spark):
    p, i = _data(spark)
    plan = (
        point_in_interval_join(p, i, ["k"], "v", "lo", "hi", bin_width=50.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "__bin" in plan  # pairing runs on the (key, bin) equi-keys


def test_timestamp_columns_bin_losslessly(spark):
    p = spark.createDataFrame(
        [("a", "2024-01-05 12:00:00", 1), ("a", "2024-02-01 00:00:00", 2)],
        "k string, ts string, pid int",
    ).withColumn("ts", F.to_timestamp("ts"))
    i = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", "2024-01-31 00:00:00", 10)],
        "k string, lo string, hi string, iid int",
    ).withColumn("lo", F.to_timestamp("lo")).withColumn("hi", F.to_timestamp("hi"))
    got = point_in_interval_join(
        p, i, ["k"], "ts", "lo", "hi", bin_width=86400.0
    ).collect()
    assert [(r.pid, r.iid) for r in got] == [(1, 10)]
