"""Pins that the local gate's pandas-dtype canonicalizer reproduces the
driver's verdicts — closing the local-green/driver-red CLASS that bit
rounds 2 (float repr width), 3 (list cells), and 4 (HUGEINT→float64).

The r4 driver-red row was `customer_metrics_rollup`: DuckDB
`sum(BIGINT)` returns HUGEINT, which pandas coerces to float64
("49.0") while Spark's LongType renders "49".  The old gate compared
`fetchall()` Python ints and could not see it.  These tests run the
compare core on synthetic frames AND on the real pre-fix oracle text,
asserting the new gate fails exactly where the driver failed.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from tools.check_oracles import canon_rows, compare_frames


def test_int64_vs_float64_mismatch():
    """The r4 class: same numeric values, different pandas dtype."""
    a = pd.DataFrame({"k": ["x", "y"], "n": np.array([49, 7], dtype="int64")})
    b = pd.DataFrame({"k": ["x", "y"], "n": np.array([49.0, 7.0], dtype="float64")})
    err = compare_frames(a, b)
    assert err is not None and "HASH" in err


def test_matching_dtypes_pass():
    a = pd.DataFrame({"k": ["x"], "n": np.array([49], dtype="int64")})
    b = pd.DataFrame({"n": np.array([49], dtype="int64"), "k": ["x"]})
    assert compare_frames(a, b) is None


def test_nan_none_nat_normalize_to_null():
    a = pd.DataFrame({"s": [None, "a"], "f": [np.nan, 1.5]})
    b = pd.DataFrame({"s": [float("nan"), "a"], "f": [None, 1.5]})
    assert compare_frames(a, b) is None


def test_list_cell_rejected():
    """The r3 class: the driver's pandas sorter crashes on list cells."""
    a = pd.DataFrame({"v": [[1, 2]]})
    err = compare_frames(a, a)
    assert err is not None and "NON-SCALAR" in err


def test_decimal_vs_float_mismatch():
    """DecimalType on one engine vs DOUBLE on the other must fail."""
    import decimal

    a = pd.DataFrame({"v": [decimal.Decimal("1.500000")]})
    b = pd.DataFrame({"v": np.array([1.5], dtype="float64")})
    assert compare_frames(a, b) is not None


def test_float_full_precision():
    """The r2 class: %.9g masked a 1e-6 diff; repr must not."""
    a = pd.DataFrame({"v": [1.0000001]})
    b = pd.DataFrame({"v": [1.00000011]})
    assert compare_frames(a, b) is not None


def test_canon_rows_sorts_columns_and_rows():
    pdf = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    assert canon_rows(pdf) == ["x|1", "y|2"]


# --- the real r4 red row, replayed against the pre-fix oracle text ---

_R4_PREFIX_ORACLE = """
    with order_rows as (
      select l_orderkey,
             cast(floor((cast(sum(cast(l_extendedprice as decimal(22,6))) as double)
                        / count(*)) * 1e6 + 0.5) / 1e6 as decimal(22,6)) as avg_price,
             count(*) as n_lines
      from lineitem group by l_orderkey
    ), cust as (
      select o.o_custkey,
             sum(r.n_lines) as n_lines,
             cast(floor((cast(sum(r.avg_price * r.n_lines) as double)
                        / sum(r.n_lines)) * 1e6 + 0.5) / 1e6 as decimal(22,6)) as w_avg_price
      from order_rows r join orders o on r.l_orderkey = o.o_orderkey
      group by o.o_custkey
    ), detail as (
      select cast(c.c_custkey as varchar) as row_id,
             c.c_nationkey,
             false as is_org_header,
             coalesce(t.n_lines, 0) as n_lines,
             cast(t.w_avg_price as double) as w_avg_price
      from customer c left join cust t on c.c_custkey = t.o_custkey
    ), rollup as (
      select 'hdr_' || cast(c.c_nationkey as varchar) as row_id,
             c.c_nationkey,
             true as is_org_header,
             sum(coalesce(t.n_lines, 0)) as n_lines,
             floor((cast(sum(t.w_avg_price) as double)
                    / count(t.w_avg_price)) * 1e6 + 0.5) / 1e6 as w_avg_price
      from customer c left join cust t on c.c_custkey = t.o_custkey
      group by c.c_nationkey
    )
    select * from detail union all select * from rollup
"""

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem"]:
        con.sql(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_r4_prefix_oracle_fails_new_gate(spark, duck):
    """The exact r4 driver-red configuration: pre-fix oracle (HUGEINT
    sums) vs the Spark query.  The OLD fetchall() gate passed this;
    the pandas gate must fail it on the int64/float64 hash."""
    from dbt_customer360_spark.plans.queries import customer_metrics_rollup

    spdf = customer_metrics_rollup(spark, SF_DIR).toPandas()
    opdf = duck.sql(_R4_PREFIX_ORACLE).df()
    assert opdf["n_lines"].dtype == np.float64  # the HUGEINT artifact
    err = compare_frames(spdf, opdf)
    assert err is not None and "HASH" in err


def test_r5_fixed_oracle_passes_new_gate(spark, duck):
    from dbt_customer360_spark.plans.queries import (
        _CUSTOMER_ROLLUP_ORACLE,
        customer_metrics_rollup,
    )

    spdf = customer_metrics_rollup(spark, SF_DIR).toPandas()
    opdf = duck.sql(_CUSTOMER_ROLLUP_ORACLE).df()
    assert opdf["n_lines"].dtype == np.int64
    assert compare_frames(spdf, opdf) is None
