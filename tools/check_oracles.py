"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark and its
``oracle_sql()`` twin on DuckDB, compares row count, column names,
and an order-insensitive value hash (columns sorted by name, rows
sorted, values stringified with float rounding).
"""

from __future__ import annotations

import hashlib
import math
import sys
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full-precision repr — %.9g masked a 1e-6 diff in round 2 and
        # the driver's canonicalizer caught it; bit-exact or bust
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (list, tuple, set, dict, bytes, bytearray)):
        # the external gate's pandas canonicalizer CRASHES on array/map
        # cells (unhashable type) — str(v) here green-lit a driver-red
        # row twice; refuse so the roster projection serializes instead
        raise TypeError(
            f"non-scalar cell {type(v).__name__}: roster projections must "
            "serialize arrays/maps (e.g. F.array_join / array_to_string)"
        )
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(only: list[str] | None = None):
    from dbt_customer360_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    ok, bad, rows_only = [], [], []
    if len(qs) > 50:
        # the external gate attests only the FIRST 50 registrations;
        # entries 51+ silently get NO verdict (round-3 failure mode)
        extra = list(qs)[50:]
        bad.append(("<roster>", f"{len(qs)} queries registered, cap is 50; dropped: {extra}"))
    from dbt_customer360_spark.plans.queries import EXTRA_ORACLES, EXTRA_QUERIES

    qs = dict(qs)
    qs.update(EXTRA_QUERIES)
    oracles = dict(oracles)
    oracles.update(EXTRA_ORACLES)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            bad.append((name, "SPARK ERROR:\n" + traceback.format_exc(limit=4)))
            continue
        if name not in oracles:
            rows_only.append((name, len(srows)))
            continue
        try:
            res = con.sql(oracles[name])
            orows = res.fetchall()
            ocols = [d[0] for d in res.description]
        except Exception:
            bad.append((name, "ORACLE ERROR:\n" + traceback.format_exc(limit=2)))
            continue
        if sorted(scols) != sorted(ocols):
            bad.append((name, f"SCHEMA: spark={sorted(scols)} oracle={sorted(ocols)}"))
            continue
        if len(srows) != len(orows):
            bad.append((name, f"ROWS: spark={len(srows)} oracle={len(orows)}"))
            continue
        try:
            sh = table_hash([tuple(r) for r in srows], scols)
            oh = table_hash(orows, ocols)
        except TypeError as e:
            bad.append((name, f"NON-SCALAR CELL (driver gate would crash): {e}"))
            continue
        if sh != oh:
            # show a tiny diff sample
            def row_line(cols, r):
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                return "|".join(norm_value(r[i]) for i in order)

            sset = {row_line(scols, tuple(r)) for r in srows}
            oset = {row_line(ocols, tuple(r)) for r in orows}
            sonly = list(sset - oset)[:2]
            oonly = list(oset - sset)[:2]
            bad.append((name, f"HASH mismatch\n  spark-only: {sonly}\n  oracle-only: {oonly}"))
            continue
        ok.append((name, len(srows)))

    print("\n== OK ==")
    for n, c in ok:
        print(f"  {n}: {c} rows")
    print("== ROWS-ONLY ==")
    for n, c in rows_only:
        print(f"  {n}: {c} rows")
    print("== FAIL ==")
    for n, msg in bad:
        print(f"  {n}: {msg}")
    print(f"\n{len(ok)} ok, {len(rows_only)} rows-only, {len(bad)} fail")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
