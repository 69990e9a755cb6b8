"""As-of join operator (operators/asof.py).

Semantics pinned against pandas ``merge_asof`` (backward/forward,
tolerance) on seeded random data, plus hand-built edge cases: equal
timestamps are inclusive, right-ts ties break to the greatest
tiebreak, keys with no qualifying right row get NULL payloads. A plan
test pins the one-shuffle union-sort shape (no join node at all)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dbt_customer360_spark.operators.asof import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_edges(spark):
    left = _df(
        spark,
        [("a", 10, "e1"), ("a", 5, "e2"), ("a", 4, "e3"), ("b", 7, "e4"), ("c", 9, "e5")],
        "k string, ts long, eid string",
    )
    right = _df(
        spark,
        [("a", 5, 100, 1), ("a", 5, 200, 2), ("a", 8, 300, 3), ("b", 99, 400, 4)],
        "k string, rts long, val int, seq int",
    )
    out = asof_join(
        left, right, ["k"], "ts", "rts", ["val"], tiebreak="seq", matched_ts_col="mts"
    )
    got = {r["eid"]: (r["val"], r["mts"]) for r in out.collect()}
    assert got["e1"] == (300, 8)  # latest at-or-before 10
    assert got["e2"] == (200, 5)  # equal ts inclusive; tie -> greatest seq
    assert got["e3"] == (None, None)  # nothing at-or-before 4
    assert got["e4"] == (None, None)  # right row only in the future
    assert got["e5"] == (None, None)  # key absent from right
    assert out.count() == 5  # left-join semantics: every left row kept


def test_asof_forward_and_tolerance(spark):
    left = _df(spark, [("a", 10, "e1"), ("a", 301, "e2")], "k string, ts long, eid string")
    right = _df(
        spark,
        [("a", 10, 1, 1), ("a", 40, 2, 2), ("a", 9000, 3, 3)],
        "k string, rts long, val int, seq int",
    )
    fwd = asof_join(
        left, right, ["k"], "ts", "rts", ["val"], direction="forward", tiebreak="seq"
    )
    got = {r["eid"]: r["val"] for r in fwd.collect()}
    assert got["e1"] == 1  # equal ts inclusive on forward too
    assert got["e2"] == 3  # next at-or-after 301
    tol = asof_join(
        left,
        right,
        ["k"],
        "ts",
        "rts",
        ["val"],
        direction="forward",
        tiebreak="seq",
        tolerance_s=100,
    )
    got = {r["eid"]: r["val"] for r in tol.collect()}
    assert got["e1"] == 1
    assert got["e2"] is None  # 9000 - 301 > tolerance -> nulled


@pytest.mark.parametrize("direction,tolerance", [("backward", None), ("forward", None), ("backward", 50)])
def test_asof_matches_pandas_merge_asof(spark, direction, tolerance):
    rng = np.random.default_rng(42)
    nl, nr, nk = 400, 150, 7
    lpd = pd.DataFrame(
        {
            "k": rng.integers(0, nk, nl).astype(str),
            "ts": rng.integers(0, 1000, nl),
            "eid": np.arange(nl),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": rng.integers(0, nk + 2, nr).astype(str),  # some right-only keys
            "rts": rng.integers(0, 1000, nr),
            "val": rng.integers(0, 10**6, nr),
        }
    )
    # pandas merge_asof scans backward to the positionally-LAST row at
    # equal rts but forward to the positionally-FIRST; ordering val
    # asc/desc respectively makes both equal "greatest val wins",
    # matching the operator's tiebreak="val" pin
    lsort = lpd.sort_values(["ts", "eid"], kind="mergesort").reset_index(drop=True)
    rsort = rpd.sort_values(
        ["rts", "val"],
        ascending=[True, direction == "backward"],
        kind="mergesort",
    ).reset_index(drop=True)
    exp = pd.merge_asof(
        lsort,
        rsort,
        left_on="ts",
        right_on="rts",
        by="k",
        direction=direction,
        tolerance=tolerance,
    ).set_index("eid")["val"]
    out = asof_join(
        spark.createDataFrame(lpd),
        spark.createDataFrame(rpd),
        ["k"],
        "ts",
        "rts",
        ["val"],
        direction=direction,
        tiebreak="val",
        tolerance_s=tolerance,
    )
    got = {r["eid"]: r["val"] for r in out.collect()}
    assert len(got) == nl
    for eid, v in exp.items():
        g = got[eid]
        if pd.isna(v):
            assert g is None, (eid, v, g)
        else:
            assert g == int(v), (eid, v, g)


def test_asof_plan_single_shuffle_no_join(spark):
    left = _df(spark, [("a", 1, "e")], "k string, ts long, eid string")
    right = _df(spark, [("a", 1, 2, 3)], "k string, rts long, val int, seq int")
    plan = asof_join(
        left, right, ["k"], "ts", "rts", ["val"], tiebreak="seq"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan  # union-sort shape, never a join
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_payload_collision_refused(spark):
    left = _df(spark, [("a", 1, 5)], "k string, ts long, val int")
    right = _df(spark, [("a", 1, 7)], "k string, rts long, val int")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "ts", "rts", ["val"])
