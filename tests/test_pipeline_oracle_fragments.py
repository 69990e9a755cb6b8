"""Fuzz the pipeline-oracle SQL fragments against their Spark twins.

plans/pipeline_oracle.py transliterates the cleaning expressions into
DuckDB SQL; the end-to-end hash gate only exercises the fixture value
distribution, so these tests pin the transliteration on adversarial
strings (punctuation-only phones, 'extension' markers, comma soups,
unicode, empty/None) — if a fragment drifts from the Spark semantics,
this fails before the driver's gate does.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from dbt_customer360_spark import pipeline as P
from dbt_customer360_spark.plans import pipeline_oracle as PO

PHONES = [
    "(555) 015-0042", "+1-555-015-0042", "5550150042", "555.015.0042 ext 77",
    "5550150042#12", "555-015 extension 9", "NA", "na", "", "ext", "12345",
    "++1 (555)-015-0042 extension", "00 11 22 33 44 55 66", None,
    "extension extension 5", "#", "phone: 555", "555015004212345",
]

EMAILS = [
    "A@B.com", "  x@y.z  ", "no-at-sign", "", "  ", "a@@b", "ü@exämple.com",
    None, "trailing@dot.", "@", "a b@c.d",
]

NAMES = [
    "Smith, Bob", "Smith,Bob", "  Bob   Smith  ", "Bob", "", None,
    "A, B, C", "Last, First Middle", ", ", "Bob Smith",
]

ALTS = [("Robert,Rob", "bob smith"), ("", "bob smith"), (None, "bob smith"),
        ("Robert", None), ("Robert", "bob"), ("A,B,C", "x  y   z")]


def _random_strings(n=200, seed=7):
    """Seeded messy-string generator: digits, phone punctuation, ext
    markers, commas, spaces, unicode — the alphabets the cleaners see."""
    import random

    rng = random.Random(seed)
    alphabet = "0123456789()+-.# ,@abcXYZüé extension na"
    out = []
    for _ in range(n):
        k = rng.randint(0, 24)
        out.append("".join(rng.choice(alphabet) for _ in range(k)))
    return out


PHONES += _random_strings(seed=7)
EMAILS += _random_strings(seed=11)
NAMES += _random_strings(seed=13)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _spark_vals(spark, rows, ddl, exprs):
    df = spark.createDataFrame(rows, ddl)
    return [tuple(r) for r in df.select(*exprs).collect()]


def _duck_vals(duck, rows, ddl, frags):
    cols = [c.split()[0] for c in ddl.split(",")]
    duck.execute("drop table if exists t")
    duck.execute(f"create table t ({ddl})")
    duck.executemany(
        f"insert into t values ({', '.join('?' for _ in cols)})", [tuple(r) for r in rows]
    )
    return [tuple(r) for r in duck.sql(f"select {', '.join(frags)} from t").fetchall()]


def test_phone_fragment_matches_clean_phone(spark, duck):
    rows = [(p,) for p in PHONES]
    num, ext = P.clean_phone("phone_raw")
    got_s = _spark_vals(spark, rows, "phone_raw string", [num, ext])
    n_sql, e_sql = PO._phone_parts("phone_raw")
    got_d = _duck_vals(duck, rows, "phone_raw varchar", [n_sql, e_sql])
    assert got_s == got_d


def test_email_fragment_matches_clean_email(spark, duck):
    rows = [(e,) for e in EMAILS]
    got_s = _spark_vals(spark, rows, "email_raw string", [P.clean_email("email_raw")])
    got_d = _duck_vals(duck, rows, "email_raw varchar", [PO._clean_email("email_raw")])
    assert got_s == got_d


def test_reorder_fragment_matches_spark(spark, duck):
    rows = [(n,) for n in NAMES]
    reorder = F.when(
        F.col("n").like("%, %"),
        F.concat_ws(
            " ",
            F.split_part(F.col("n"), F.lit(", "), F.lit(2)),
            F.split_part(F.col("n"), F.lit(", "), F.lit(1)),
        ),
    ).otherwise(F.col("n"))
    got_s = _spark_vals(spark, rows, "n string", [reorder])
    got_d = _duck_vals(duck, rows, "n varchar", [PO._reorder_last_first("n")])
    assert got_s == got_d


def test_alt_name_fragment_matches_pipeline(spark, duck):
    rows = list(ALTS)
    got_s = _spark_vals(
        spark, rows, "alts string, nm string", [P._alt_full_name("nm", "alts")]
    )
    got_d = _duck_vals(duck, rows, "alts varchar, nm varchar", [PO._alt_name("nm", "alts")])
    assert got_s == got_d
