"""Dump formatted physical plans of the headline queries to PLANS.md.

The scale review artifact: for each headline query, the executed plan
plus quick red-flag scan (nested-loop joins, cartesian products,
missing pushed filters). Run after changing any operator.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

AUDIT = [
    "pricing_summary",
    "broadcast_dim_join",
    "window_best_order",
    "match_candidates",
    "connected_components_chain",
    "lsn_dedup_events",
    "golden_event_type",
    "minhash_lsh_dedup",
    "simhash_near_dups",
    "ngram_jaccard_dedup",
    "customer_metrics_rollup",
    "ann_bruteforce",
    "ann_lsh",
    "ann_ivf",
    "ann_ivf_int8",
    "emb_cosine_dedup",
    "pii_scrub_docs",
    "repetition_quality_docs",
    "quantize_int8_embeddings",
    "bm25_scores_docs",
    "minhash_canonical_docs",
    "lake_changelog",
    "asof_join_events",
    "range_join_events",
    "ivm_rollup_orders",
    "inverted_index_docs",
    "quantiles_docs",
    "zscore_outliers_docs",
    "profile_orders",
]

RED_FLAGS = ["BroadcastNestedLoopJoin", "CartesianProduct"]
# crossJoin against a broadcast query/centroid side is the intended
# plan for brute-force ANN — whitelisted
WHITELIST = {
    "ann_bruteforce": ["BroadcastNestedLoopJoin"],
    # bm25 broadcasts the ONE-row global stats (N, sumdl, df_t) back
    # onto the corpus — the corpus itself never shuffles (pinned in
    # tests/test_plans.py::test_bm25_never_shuffles_the_corpus)
    "bm25_scores_docs": ["BroadcastNestedLoopJoin"],
    # the IVF BNLJs broadcast the O(n_centroids)-row centroid table
    # (incl. each k-means iteration); the candidate join itself is a
    # centroid_id equi-join (pinned in tests/test_plans.py)
    "ann_ivf": ["BroadcastNestedLoopJoin"],
    "ann_ivf_int8": ["BroadcastNestedLoopJoin"],
}


def main() -> int:
    from dbt_customer360_spark.plans.queries import EXTRA_QUERIES, QUERIES
    from dbt_customer360_spark.session import get_spark

    sf = "/root/testdata/sf0.001"
    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    sections = []
    flagged = []
    for name in AUDIT:
        df = {**QUERIES, **EXTRA_QUERIES}[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        for flag in RED_FLAGS:
            if flag in plan and flag not in WHITELIST.get(name, []):
                flagged.append((name, flag))
        sections.append(f"## {name}\n\n```\n{plan}\n```\n")
    header = "# PLANS — formatted physical plans of the headline queries\n\n"
    if flagged:
        header += "**RED FLAGS:** " + ", ".join(f"{n}:{f}" for n, f in flagged) + "\n\n"
    else:
        header += (
            "No nested-loop/cartesian joins outside the whitelisted "
            "tiny-side broadcasts (brute-force ANN query set, IVF "
            "centroid table, bm25 1-row stats).\n\n"
        )
    with open("/root/repo/PLANS.md", "w") as f:
        f.write(header + "\n".join(sections))
    print(header)
    spark.stop()
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
