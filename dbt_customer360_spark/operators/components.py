"""Connected components over match-pair edges.

The reference merges matched pairs with a chain of full-outer joins
(source_matches.sql:345-351) which is NOT transitive (A-B, B-C gives
two partial entities). The north_star mandates true connected
components (BASELINE.json:6); this is the documented semantic upgrade
(SURVEY.md §7.3).

Algorithm: iterative min-label propagation (a DataFrame form of
large-star/small-star). Each round every node adopts the minimum
label in its neighborhood; converges in O(log n) rounds on typical
match graphs (short chains). Each round is two shuffles on the edge
key; a per-round checkpoint cuts the lineage so plans stay
bounded — at 10^10 edges this runs as a handful of hash-partitioned
jobs, never driver-side. ``checkpoint_dir`` picks the backend: None
uses ``localCheckpoint`` (executor-local blocks — fine single-JVM), a
path uses reliable ``df.checkpoint()`` storage so a lost executor
cannot sink the whole iteration at cluster scale (README's 100TB
notes promise exactly this swap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from dbt_customer360_spark.session import ensure_checkpoint_dir


def _union_find_local(sym: DataFrame) -> DataFrame:
    """Driver-side components over a small symmetrized edge list;
    returns a JVM LocalRelation (session.local_df) of (node, component)
    with component = min node id of the set — byte-identical to the
    distributed fixed point.

    Integer ids (the normal case) go through ONE Arrow pull and a
    vectorized numpy min-label propagation with path halving — the
    same monotone fixed point as the distributed rounds (the min-id
    node keeps its own label; stability across every symmetric edge
    forces the whole component onto it), O(E) numpy work per round,
    O(log diameter) rounds. Other id types fall back to a dict
    union-find over the same pulled columns."""
    import numpy as np

    from dbt_customer360_spark.session import local_df

    t = sym.schema["a"].dataType.simpleString()
    tbl = sym.select("a", "b").toArrow()
    a_arr = tbl.column("a").combine_chunks()
    b_arr = tbl.column("b").combine_chunks()
    import pyarrow as pa

    if (
        pa.types.is_integer(a_arr.type)
        and not a_arr.null_count
        and not b_arr.null_count
        and len(a_arr)
    ):
        A = a_arr.to_numpy()
        B = b_arr.to_numpy()
        # np.unique is ascending, so label minimization over indices
        # IS minimization over node ids
        u, inv = np.unique(np.concatenate([A, B]), return_inverse=True)
        ea = inv[: len(A)]
        eb = inv[len(A) :]
        label = np.arange(len(u), dtype=np.int64)
        while True:
            prev = label
            label = label.copy()
            np.minimum.at(label, ea, prev[eb])  # adopt neighbor minima
            label = np.minimum(label, label[label])  # path halving
            if np.array_equal(label, prev):
                break
        rows = list(zip(u.tolist(), u[label].tolist()))
        return local_df(sym.sparkSession, rows, f"node {t}, component {t}")

    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(a_arr.to_pylist(), b_arr.to_pylist()):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id: the root IS the component label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(n, find(n)) for n in parent]
    return local_df(sym.sparkSession, rows, f"node {t}, component {t}")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    small_graph_edges: int = 1_000_000,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    Node ids must be a totally ordered type (string or numeric).
    ``checkpoint_dir``: when given, per-round lineage cuts go through
    reliable-storage ``checkpoint()`` (the dir is set once on the
    SparkContext) instead of ``localCheckpoint``.

    ``small_graph_edges``: symmetrized-edge threshold below which the
    component labels are computed with a driver-side union-find over
    the (already checkpointed, deduplicated) edge list instead of the
    iterative min-label rounds. Match graphs are usually SPARSE —
    near-dup clusters of a huge corpus produce few edges — and each
    distributed round costs several jobs regardless of size, so tiny
    graphs were paying ~10x pure scheduling overhead. The collect is
    bounded by the threshold (checked first with a count on the
    checkpointed edges — never an unbounded driver pull), the result
    is identical (component = min reachable id, exactly what
    union-by-min computes), and graphs above the threshold take the
    distributed path unchanged — at 10^10 edges nothing is collected.
    """

    def ckpt(df: DataFrame) -> DataFrame:
        if checkpoint_dir is None:
            return df.localCheckpoint()
        ensure_checkpoint_dir(df.sparkSession.sparkContext, checkpoint_dir)
        return df.checkpoint()

    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .dropDuplicates(["a", "b"])
    )
    sym = ckpt(sym)
    if small_graph_edges and sym.count() <= small_graph_edges:
        return _union_find_local(sym)
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("component"))
        .select(F.col("a").alias("node"), "component")
        .withColumn("component", F.least("node", "component"))
    )
    labels = ckpt(labels)
    # stale root table for pointer halving: label-of-label lookups use
    # the last CHECKPOINTED labels (fresh ones would re-execute the
    # uncheckpointed plan); pointer jumping with stale values stays
    # correct — labels are monotone non-increasing, and a node's label
    # is always a node of its own component, hence so is that node's
    # label. Halving makes label distance roughly double per step, so
    # convergence is O(log diameter) rounds instead of O(diameter).
    comp_type = dict(labels.dtypes)["component"]
    for it in range(max_iter):
        obs = Observation(f"cc-prop-{it}")
        roots = labels.select(
            F.col("node").alias("__step"), F.col("component").alias("__root")
        )
        # ONE join + union + ONE aggregation replaces the r5 shape's
        # three joins per round: every node's self-row (which also
        # carries the old label for the convergence count) and its
        # neighbors' labels meet in a single groupBy(node) min. The
        # self-row is always present, so the left-join-for-isolated-
        # nodes of the old shape is subsumed by the union.
        nbr_cand = sym.join(
            labels.select(F.col("node").alias("b"), F.col("component").alias("cand")),
            on="b",
        ).select(F.col("a").alias("node"), "cand", F.lit(None).cast(comp_type).alias("old"))
        self_rows = labels.select(
            "node", F.col("component").alias("cand"), F.col("component").alias("old")
        )
        stepped = (
            self_rows.unionByName(nbr_cand)
            .groupBy("node")
            .agg(F.min("cand").alias("__step"), F.max("old").alias("__old"))
        )
        new_labels = (
            stepped.join(roots, on="__step", how="left")
            .select(
                "node",
                F.least(F.col("__step"), F.coalesce("__root", "__step")).alias(
                    "component"
                ),
                "__old",
            )
            .observe(
                obs,
                F.sum((F.col("component") != F.col("__old")).cast("long")).alias(
                    "changed"
                ),
            )
            .drop("__old")
        )
        labels = ckpt(new_labels)
        if (obs.get["changed"] or 0) == 0:
            converged = True
            break
    else:
        converged = False
    if converged:
        # The prop fixed point IS full convergence — no compress pass
        # needed. Proof: labels are always node ids of their own
        # component and component-min m keeps label m; stability at a
        # neighbor y of m forces label(y) <= label(m) = m, and >= m
        # (no smaller id exists in the component), so label(y) = m;
        # induction along any path spreads m to every node. The
        # compress loop below therefore only runs as a fallback when
        # max_iter exhausted before changed hit 0.
        return labels
    # fallback pass: path-compress labels through the label table itself
    # (label of my label), so chains settle to the true minimum
    for it in range(max_iter):
        obs = Observation(f"cc-compress-{it}")
        compressed = (
            labels.alias("l")
            .join(
                labels.select(
                    F.col("node").alias("component"), F.col("component").alias("root")
                ).alias("r"),
                on="component",
                how="left",
            )
            .select(
                "node",
                F.col("component").alias("__old"),
                F.least(F.coalesce("root", "component"), F.col("component")).alias("component"),
            )
            .observe(obs, F.sum((F.col("component") != F.col("__old")).cast("long")).alias("changed"))
            .drop("__old")
        )
        labels = ckpt(compressed)
        if (obs.get["changed"] or 0) == 0:
            break
    return labels
