"""Driver-contract smoke: entry() and a sample of queries at sf0.001."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_every_query_has_callable_and_oracle_keys_subset(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # the vast majority must be oracle-checked, not rows-only
    assert len(oracles) >= 0.75 * len(qs)


def test_sample_queries_run_at_sf0001(spark):
    qs = entrymod.queries()
    for name in ["pricing_summary", "match_candidates", "golden_event_type", "ann_bruteforce"]:
        df = qs[name](spark, SF)
        assert df.count() > 0, name
