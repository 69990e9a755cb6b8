"""Profiling / exact-quantile / z-score / inverted-index operators.

Semantics pinned on tiny hand-computed frames; plan shape pinned for
the inverted index's one-shuffle contract (window HashPartitioning
reused by the groupBy) and for the z-score broadcast-back join.
"""

import math

import pytest
from pyspark.sql import functions as F

from dbt_customer360_spark.operators import profile, textstats


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- profile


def test_profile_columns_stats(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (None, "b"), (10, None)],
        "k bigint, s string",
    )
    rows = {r.column: r for r in profile.profile_columns(df, ["k", "s"]).collect()}
    k = rows["k"]
    assert (k.n_notnull, k.n_null, k.n_distinct) == (3, 1, 3)
    # cast AFTER min/max: numeric order, not lexical ("10" < "2" lexically)
    assert (k.min_s, k.max_s) == ("1", "10")
    s = rows["s"]
    assert (s.n_notnull, s.n_null, s.n_distinct) == (3, 1, 2)
    assert (s.min_s, s.max_s) == ("a", "b")


def test_profile_single_pass(spark):
    """One aggregate over the table — the long form comes from
    exploding the single agg row, not from per-column rescans."""
    df = spark.createDataFrame([(1, "a")], "k bigint, s string")
    plan = _plan(profile.profile_columns(df, ["k", "s"]))
    assert plan.count("Generate explode") == 1


# ---------------------------------------------------------------- quantiles


def test_exact_quantiles_percentile_disc(spark):
    # 10 values: rank ceil(q*10) → q=0.5 → rank 5 → 50; 0.9 → 90; 0.99 → 100
    df = spark.createDataFrame(
        [("g", v * 10) for v in range(1, 11)] + [("g", None)],
        "grp string, x bigint",
    )
    got = {
        r.q: r.value
        for r in profile.exact_quantiles(df, "x", ["grp"], [0.5, 0.9, 0.99]).collect()
    }
    assert got == {0.5: 50, 0.9: 90, 0.99: 100}


def test_exact_quantiles_ties_and_small_group(spark):
    df = spark.createDataFrame(
        [("a", 7), ("a", 7), ("a", 7), ("b", 1)], "grp string, x bigint"
    )
    out = profile.exact_quantiles(df, "x", ["grp"], [0.5, 0.99])
    got = sorted((r.grp, r.q, r.value) for r in out.collect())
    assert got == [("a", 0.5, 7), ("a", 0.99, 7), ("b", 0.5, 1), ("b", 0.99, 1)]


def test_exact_quantiles_matches_duckdb_native(spark):
    """Cross-check the ceil(q*n) rank rule against DuckDB's native
    quantile_disc on an awkward group size (n=7)."""
    import duckdb

    vals = [3, 1, 4, 1, 5, 9, 2]
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, x bigint")
    got = {
        r.q: r.value
        for r in profile.exact_quantiles(df, "x", ["grp"], [0.25, 0.5, 0.75]).collect()
    }
    for q in (0.25, 0.5, 0.75):
        native = duckdb.sql(
            f"select quantile_disc(x, {q}) from (select unnest({vals}) x)"
        ).fetchone()[0]
        assert got[q] == native, q


# ---------------------------------------------------------------- z-score


def test_zscore_outliers_known_case(spark):
    # group g: nine 10s and one 100 → mean 19, var = (8100+9*81... )
    df = spark.createDataFrame(
        [("g", 10)] * 9 + [("g", 100)], "grp string, x bigint"
    )
    out = profile.zscore_outliers(df, "x", ["grp"], threshold=2.0).collect()
    assert len(out) == 1 and out[0].x == 100
    n, s, s2 = 10, 190, 9 * 100 + 10000
    mean = s / n
    var = (s2 - s * s / n) / n
    z = (100 - mean) / math.sqrt(var)
    assert out[0].zscore == math.floor(z * 1e6 + 0.5) / 1e6


def test_zscore_zero_variance_group_dropped(spark):
    df = spark.createDataFrame(
        [("c", 5), ("c", 5), ("g", 1), ("g", 100)], "grp string, x bigint"
    )
    out = profile.zscore_outliers(df, "x", ["grp"], threshold=0.5).collect()
    assert {r.grp for r in out} == {"g"}


def test_zscore_stats_join_is_broadcast(spark):
    df = spark.createDataFrame([("g", i) for i in range(50)], "grp string, x bigint")
    plan = _plan(profile.zscore_outliers(df, "x", ["grp"]))
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------- inverted index


def test_inverted_index_df_and_postings(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the dog ran"),
            (3, "the cat ran far"),
            (4, None),
        ],
        "doc_id bigint, text string",
    )
    out = {r.term: r for r in textstats.inverted_index(df, min_df=2).collect()}
    assert out["the"].df == 3 and out["the"].postings == "1,2,3"
    assert out["cat"].df == 2 and out["cat"].postings == "1,3"
    assert out["ran"].df == 2 and out["ran"].postings == "2,3"
    assert "dog" not in out  # min_df prunes hapaxes
    assert "far" not in out


def test_inverted_index_cap_keeps_lowest_ids(spark):
    df = spark.createDataFrame(
        [(i, "term") for i in range(10, 0, -1)], "doc_id bigint, text string"
    )
    out = textstats.inverted_index(df, min_df=2, max_postings=3).collect()
    assert len(out) == 1
    assert out[0].df == 10  # df counts ALL docs, not just the capped list
    assert out[0].postings == "1,2,3"  # lowest ids, sorted


def test_inverted_index_distinct_terms_per_doc(spark):
    """A term repeated within one document counts once toward df."""
    df = spark.createDataFrame(
        [(1, "echo echo echo"), (2, "echo")], "doc_id bigint, text string"
    )
    out = textstats.inverted_index(df, min_df=2).collect()
    assert len(out) == 1 and out[0].df == 2


def test_inverted_index_one_shuffle(spark):
    """The groupBy(term) must reuse the window's HashPartitioning(term)
    — exactly one Exchange in the whole plan."""
    df = spark.createDataFrame([(1, "a b"), (2, "b c")], "doc_id bigint, text string")
    plan = _plan(textstats.inverted_index(df, min_df=1))
    assert plan.count("Exchange hashpartitioning") == 1
