"""Build a local NxSF scale-up of a testdata directory (measurement aid).

The driver's round-end measurement escalates the scale factor beyond
the largest local directory (BENCH_r05 recorded sf=1.0 while local
data stops at sf0.1), so optimization work needs a local stand-in at
that scale. This stacks K shifted copies of a source directory:
integer id columns are offset per copy so key spaces stay disjoint
and join/group cardinalities scale like the driver's generator's;
document texts get a per-copy suffix (and n_chars recomputed) so
near-dup/LSH structure stays realistic instead of exploding with
K-way exact duplicates.

    python tools/make_scaleup.py /root/testdata/sf0.1 /root/sfbig/sf1.0 10

Output is for LOCAL measurement only — never committed, never read by
bench.py unless pointed at via $SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT_COLS: dict[str, dict[str, int | None]] = {
    "customer": {"c_custkey": 15000},
    "documents": {"doc_id": 5000},
    "events": {"event_id": 100000, "user_id": None},  # None -> max+1
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
    "embeddings": {"vec_id": 2000},
    "part": {"p_partkey": 20000},
    "supplier": {"s_suppkey": 1000},
    "nation": {},
    "region": {},
}


def main() -> None:
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    for t, cols in SHIFT_COLS.items():
        tab = pq.read_table(f"{src}/{t}.parquet")
        if not cols:
            pq.write_table(tab, f"{dst}/{t}.parquet", compression="zstd")
            print(t, tab.num_rows, "copied")
            continue
        offs = {
            c: (o if o is not None else pc.max(tab[c]).as_py() + 1)
            for c, o in cols.items()
        }
        parts = []
        for i in range(k):
            tt = tab
            for c, o in offs.items():
                idx = tt.schema.get_field_index(c)
                tt = tt.set_column(
                    idx, c, pc.add(tt[c], i * o).cast(tt.schema.field(c).type)
                )
            if t == "documents" and i > 0:
                idx = tt.schema.get_field_index("text")
                newtext = pc.binary_join_element_wise(
                    tt["text"].cast(pa.string()),
                    pa.array([f" v{i}"] * tt.num_rows),
                    "",
                )
                tt = tt.set_column(idx, "text", newtext)
                nidx = tt.schema.get_field_index("n_chars")
                tt = tt.set_column(
                    nidx, "n_chars", pc.utf8_length(tt["text"]).cast(pa.int64())
                )
            parts.append(tt)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{t}.parquet", compression="zstd")
        print(t, out.num_rows)


if __name__ == "__main__":
    main()
