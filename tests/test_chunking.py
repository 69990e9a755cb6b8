"""Chunking + stratified sampling (operators/chunking.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from dbt_customer360_spark.operators import chunking as C

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_chunk_covers_every_token_with_overlap(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "solo")],
        "doc_id long, text string",
    )
    rows = C.chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 10 tokens, stride 3 -> ceil(9/3)=3 chunks; every token
    # appears; consecutive chunks share exactly `overlap` tokens
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_idx for r in c1] == [0, 1, 2]
    assert c1[0].chunk_text == "t0 t1 t2 t3" and c1[0].chunk_len == 4
    assert c1[1].chunk_text == "t3 t4 t5 t6"
    assert c1[2].chunk_text == "t6 t7 t8 t9"
    toks = [t for r in c1 for t in r.chunk_text.split()]
    assert set(toks) == {f"t{i}" for i in range(10)}
    # short docs -> one short chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_len == 2
    assert len(by_doc[3]) == 1 and by_doc[3][0].chunk_text == "solo"


def test_chunk_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   "), (4, "x")], "doc_id long, text string"
    )
    out = C.chunk_documents(df, chunk_tokens=8, overlap=0)
    assert [r.doc_id for r in out.collect()] == [4]  # empties dropped
    kept = C.chunk_documents(df, chunk_tokens=8, overlap=0, drop_empty=False)
    rows = {r.doc_id: r for r in kept.collect()}
    assert rows[1].chunk_text == "" and rows[1].chunk_len == 0
    assert set(rows) == {1, 2, 3, 4}


def test_chunk_rejects_bad_overlap(spark):
    df = spark.range(1).select(F.lit("a").alias("text"))
    with pytest.raises(ValueError):
        C.chunk_documents(df, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        C.chunk_sql(chunk_tokens=4, overlap=-1)


def test_chunk_matches_duckdb_twin(spark):
    sp = sorted(
        tuple(r)
        for r in C.chunk_documents(
            _docs(spark).select("doc_id", "text"), chunk_tokens=16, overlap=3
        ).collect()
    )
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{SF}/documents.parquet'")
    du = sorted(
        tuple(r)
        for r in con.sql(C.chunk_sql(chunk_tokens=16, overlap=3)).fetchall()
    )
    assert sp == du


def test_chunk_plan_has_no_shuffle(spark):
    plan = (
        C.chunk_documents(_docs(spark).select("doc_id", "text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # embarrassingly parallel: scan -> generate
    assert "Generate" in plan


def test_stratified_sample_deterministic_and_monotone(spark):
    d = _docs(spark)
    a = {r.doc_id for r in C.stratified_sample(d, "lang", {"en": 0.2}, "doc_id").collect()}
    b = {r.doc_id for r in C.stratified_sample(d, "lang", {"en": 0.2}, "doc_id").collect()}
    assert a == b  # re-run identical (no RNG)
    # repartitioning does not change the sample
    c = {
        r.doc_id
        for r in C.stratified_sample(d.repartition(13), "lang", {"en": 0.2}, "doc_id").collect()
    }
    assert a == c
    # raising the fraction supersets the earlier sample (nested thresholds)
    big = {r.doc_id for r in C.stratified_sample(d, "lang", {"en": 0.6}, "doc_id").collect()}
    assert a <= big
    n_en = d.filter(F.col("lang") == "en").count()
    assert abs(len(big) / n_en - 0.6) < 0.15  # 32-bit hash, small-N tolerance


def test_stratified_sample_default_fraction_and_keep_all(spark):
    d = _docs(spark)
    out = C.stratified_sample(d, "lang", {"de": 1.0}, "doc_id", default_fraction=0.0)
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert langs == {"de"}
    assert out.count() == d.filter(F.col("lang") == "de").count()  # 1.0 keeps all


def test_stratified_sample_matches_duckdb_twin(spark):
    fr = {"en": 0.33, "zh": 1.0, "fr": 0.0}
    sp = sorted(
        (r.doc_id, r.lang)
        for r in C.stratified_sample(_docs(spark), "lang", fr, "doc_id").collect()
    )
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{SF}/documents.parquet'")
    du = sorted(
        tuple(r)
        for r in con.sql(
            C.stratified_sample_sql("documents", "lang", fr, "doc_id", select="doc_id, lang")
        ).fetchall()
    )
    assert sp == du
