"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k. The query set is
  broadcast (it's small by construction); the corpus side streams —
  one pass, no shuffle of the corpus, per-partition top-k via window
  on the joined result. Dot products run JVM-side with
  ``aggregate``/``zip_with`` — no Python in the row path.
- ``lsh_topk``: random-hyperplane (sign-)LSH bucketing as the scale
  path — candidates only from matching buckets, then exact cosine.
  Hyperplanes are deterministic Rademacher (+-1) vectors derived from
  md5 of (seed, plane, component), so results are reproducible with no
  driver RNG AND replayable by any engine with md5 (the DuckDB oracle
  embeds the same vectors).
"""

from __future__ import annotations

import hashlib

# module-level (not function-local) pandas import: pandas_udf resolves
# stringified type hints via MODULE globals under
# `from __future__ import annotations` (see functions/udfs.py)
import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from dbt_customer360_spark.session import spread_for_compute


def _sq_dist_arrow(v: Column, c: Column) -> Column:
    """Arrow twin of the ``_sq_dist`` fold — BIT-identical, ~10x faster.

    The JVM higher-order fold runs interpreted per element (Expression
    eval + array alloc per step); at corpus x centroids scale that is
    the k-means hot loop. Here the accumulation is vectorized across
    ROWS and sequential across DIMS — ``acc = (((0 + t1) + t2) + ...)``
    per row, each step one numpy elementwise add — so the IEEE add
    order is exactly the fold's (and the DuckDB
    ``list_sum(list_transform(...))`` oracle's): same operands, same
    order, bit-identical doubles. (A np.dot/BLAS or pairwise-sum path
    would NOT preserve order.) Pinned equivalent in
    tests/test_ops.py::test_sq_dist_arrow_equals_fold."""

    @pandas_udf("double")
    def _sq(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:  # np.stack raises on an empty batch
            return pd.Series([], dtype="float64")
        va = np.stack(a.to_numpy())
        vb = np.stack(b.to_numpy())
        t = va - vb
        t = t * t
        acc = np.zeros(len(va), dtype=np.float64)
        for i in range(t.shape[1]):
            acc = acc + t[:, i]
        return pd.Series(acc)

    return _sq(v, c)


def _sq_dist_best(v: Column, c: Column, dim: int | None) -> Column:
    """Fastest bit-identical squared-distance shape for the k-means/IVF
    hot loops. All three shapes (Arrow twin, codegen chain, fold) share
    one IEEE add order (pinned in
    tests/test_ops.py::test_sq_dist_arrow_equals_fold), so the choice
    is value-invisible. Measured A/B at 20k x 8 x dim64 with the
    assignment input spread across cores: Arrow warm 2.96 s vs chain
    3.87 s per 2-iteration training — the 64-term chain's whole-stage
    codegen compile (and 8 KB JIT-limit fallback risk) costs more than
    the Arrow batch round-trip, so the Arrow twin stays the hot-loop
    shape. (The chain remains the right form for the cheap one-shot
    cosine projections, where no giant aggregate sits above it.)"""
    return _sq_dist_arrow(v, c)


def _sq_dist(v: Column, c: Column, dim: int | None) -> Column:
    """Squared L2 distance between two array<double> columns.

    With a known (moderate) dim this emits an explicit left-associative
    per-index chain — ``(((0.0 + t1) + t2) + ...)`` — which whole-stage
    codegen compiles to straight-line primitive arithmetic. The
    ``F.aggregate``/``zip_with`` fold it replaces runs INTERPRETED per
    element (an Expression-tree eval + array alloc per step): at 500
    corpus vectors x 8 centroids x dim 64 the fold alone cost ~8s warm
    (measured round 5); the chain is microseconds. The addition order
    is IDENTICAL to the fold's, so cross-engine bit-exactness against
    the DuckDB ``list_sum(list_transform(...))`` oracles is unchanged.
    Falls back to the fold for unknown or very wide dims (a 4096-term
    expression would blow janino's 64KB method limit)."""
    if dim is None or dim > 256:
        return F.aggregate(
            F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    out = F.lit(0.0)
    for i in range(1, dim + 1):
        t = F.element_at(v, i) - F.element_at(c, i)
        out = out + t * t
    return out


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    if dim is None or dim > 256:
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        )
        na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
        nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    else:
        # explicit left-assoc chains, same op order as the folds (see
        # _sq_dist) — codegen-friendly, bit-identical results
        dot, sa, sb = F.lit(0.0), F.lit(0.0), F.lit(0.0)
        for i in range(1, dim + 1):
            x, y = F.element_at(a, i), F.element_at(b, i)
            dot = dot + x * y
            sa = sa + x * x
            sb = sb + y * y
        na, nb = F.sqrt(sa), F.sqrt(sb)
    return F.when((na > 0) & (nb > 0), dot / (na * nb))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cos_sim, rank) — exact, crossJoin with a
    broadcast query side (query count is small; corpus never shuffles
    until the final per-query top-k, which AQE coalesces)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = spread_for_compute(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def rademacher_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic +-1 hyperplanes: component j of plane p is +1 iff
    the first hex digit of md5('plane{seed}_{p}_{j}') is < 8 (a fair
    coin on the hash). Rademacher projections satisfy the sign-LSH
    property like gaussians do (Achlioptas-style sparse projections);
    being a pure function of md5 they are reproducible in SQL engines,
    which is how the ann_lsh roster query gets a DuckDB oracle."""
    planes = []
    for p in range(n_planes):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"plane{seed}_{p}_{j}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) < 8 else -1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 42, impl: str = "arrow") -> Column:
    """Sign-LSH bucket id: bit p = sign(vec . plane_p).

    'arrow' (default): one pandas UDF computes all plane dots with the
    row-vectorized / dim-sequential accumulation — the same IEEE add
    order as the 'jvm' fold twin (pinned bit-identical in
    tests/test_ops.py), ~n_planes*dim interpreted Expression evals per
    row cheaper. The DuckDB oracle replays the identical order."""
    planes = rademacher_planes(dim, n_planes, seed)
    if impl == "arrow":

        @pandas_udf("long")
        def _buckets(vs: pd.Series) -> pd.Series:
            if len(vs) == 0:
                return pd.Series([], dtype="int64")
            V = np.stack(vs.to_numpy()).astype(np.float64, copy=False)
            out = np.zeros(len(V), dtype=np.int64)
            for p, plane in enumerate(planes):
                acc = np.zeros(len(V), dtype=np.float64)
                for j in range(dim):
                    # left-assoc across dims, exactly the fold's order;
                    # plane[j] is +-1.0 so the product is exact
                    acc = acc + V[:, j] * plane[j]
                out = out + ((acc > 0).astype(np.int64) << p)
            return pd.Series(out)

        return _buckets(vec)
    bucket = F.lit(0).cast("long")
    for p, plane_vals in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in plane_vals])
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket, then exact
    cosine + per-query rank. Recall tunable via n_planes (fewer planes
    -> bigger buckets -> higher recall, more compute)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_bucket(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)



def _materialize_centroids(df: DataFrame) -> DataFrame:
    """Collect the k-row centroid table to the driver and rebuild it as
    a broadcast JVM LocalRelation. Replaces the per-iteration
    broadcast(localCheckpoint()): the collect is bounded (k rows x dim
    doubles), values round-trip exactly (IEEE doubles through Arrow),
    and the next iteration's plan references a plain LocalRelation
    instead of an RDD scan — measured ~6s faster cold and ~0.3s warm
    per 2-iteration training, and no executor block retention."""
    from dbt_customer360_spark.session import local_df

    rows = [(r["centroid_id"], r["centroid"]) for r in df.collect()]
    return F.broadcast(
        local_df(df.sparkSession, rows, "centroid_id int, centroid array<double>")
    )


def kmeans_centroids(
    corpus: DataFrame,
    dim: int,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    seed: int = 42,
    wide_dim_threshold: int = 64,
    train_sample: int | None = 262_144,
) -> DataFrame:
    """Deterministic k-means (Lloyd) in pure DataFrame ops for IVF.

    Init: the k corpus vectors with the smallest xxhash64(vec_id, seed)
    (a seeded deterministic sample — no driver RNG). Each iteration:
    assign every row to its nearest centroid via a broadcast join, then
    average per cluster. Returns (centroid_id, centroid: array<double>).

    Mean step has two shapes: per-index sum columns for dim <
    ``wide_dim_threshold`` (one stage, no explode), and
    posexplode → groupBy(centroid_id, pos) above it — at embedding
    dims 512-4096 a per-dim column list is thousands of aggregate
    expressions and blows up codegen, while the exploded shape keeps
    TWO agg columns regardless of dim and rebuilds each centroid with
    one k-row collect_list (k centroids, never the corpus).
    """
    # Train on a deterministic hash sample (standard IVF practice:
    # centroid quality saturates around ~256k training vectors; Lloyd
    # passes over the full 100 TB corpus would dominate the build).
    # Membership is a pure function of vec_id — no global sort, no
    # driver RNG — and corpora at or below the sample size train on
    # everything, so small runs are unchanged.
    if train_sample is not None:
        n = corpus.count()
        if n > train_sample:
            ratio = max(2, round(n / train_sample))
            corpus = corpus.filter(
                F.pmod(F.xxhash64("vec_id", F.lit(seed + 7919)), F.lit(ratio)) == 0
            )
    base = corpus.select(
        F.col(vec_col).cast("array<double>").alias("v"),
        F.xxhash64("vec_id", F.lit(seed)).alias("h"),
    )
    init = base.orderBy("h").limit(k)
    centroids = F.broadcast(
        init.select(
            (F.row_number().over(Window.orderBy("h")) - 1).alias("centroid_id"),
            F.col("v").alias("centroid"),
        )
    )
    # the assignment crossJoin fans out x k; a single-split training
    # input would run it one-task (session.spread_for_compute)
    pts = spread_for_compute(
        corpus.select(F.col("vec_id").alias("__pid"), F.col(vec_col).cast("array<double>").alias("v"))
    )
    for _ in range(iters):
        dist = _sq_dist_best(F.col("v"), F.col("centroid"), dim)
        # argmin per point via min_by hash-aggregation (partial agg
        # combines map-side) — NOT a window over the full vector, which
        # would shuffle every embedding by its own bytes
        assigned = (
            pts.crossJoin(centroids)
            .withColumn("d", dist)
            .groupBy("__pid")
            .agg(
                F.min_by(
                    F.struct("v", "centroid_id"), F.struct(F.col("d"), F.col("centroid_id"))
                ).alias("__w")
            )
            .select(F.col("__w.v").alias("v"), F.col("__w.centroid_id").alias("centroid_id"))
        )
        if dim < wide_dim_threshold:
            # mean per cluster: sum of per-index columns — one stage,
            # codegen-friendly at small dims
            sums = assigned.groupBy("centroid_id").agg(
                *[F.sum(F.element_at("v", i + 1)).alias(f"s{i}") for i in range(dim)],
                F.count("*").alias("n"),
            )
            # localCheckpoint: the k-row centroid table is materialized
            # once per iteration, truncating the plan — otherwise each
            # iteration NESTS the previous one and the caller's corpus
            # AND query sides each re-execute the whole chain (measured
            # ~11s for 500 vectors at sf0.01 before; Catalyst/codegen
            # time, not data)
            centroids = _materialize_centroids(
                sums.select(
                    "centroid_id",
                    F.array(*[(F.col(f"s{i}") / F.col("n")) for i in range(dim)]).alias(
                        "centroid"
                    ),
                )
            )
        else:
            # wide-dim shape: explode to (centroid_id, pos, x), sum +
            # count partial-aggregate map-side, then rebuild the k
            # centroid arrays (collect_list is over k*dim rows total)
            means = (
                assigned.select("centroid_id", F.posexplode("v").alias("pos", "x"))
                .groupBy("centroid_id", "pos")
                .agg((F.sum("x") / F.count("*")).alias("m"))
            )
            centroids = _materialize_centroids(
                means.groupBy("centroid_id").agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "m"))),
                        lambda s: s["m"],
                    ).alias("centroid")
                )
            )
    return centroids


# Bounded-pull ceiling for the driver-side Lloyd twin: rows*dim cells
# (4M cells ~ 32 MB of doubles). Below it the whole training set fits
# comfortably on the driver and the per-iteration numpy replay replaces
# ~2 Spark jobs per Lloyd iteration; above it (any at-scale corpus) the
# distributed loop runs unchanged.
_KMEANS_DRIVER_MAX_CELLS = 4_194_304
# optimizer-estimate ceiling for even ATTEMPTING the bounded pull (the
# limit alone would still schedule a task per input split at scale)
_KMEANS_DRIVER_MAX_BYTES = 256 * 1024 * 1024


def _kmeans_shared_driver(base: DataFrame, dim: int, k: int, iters: int):
    """Driver-side twin of the distributed Lloyd loop in
    :func:`kmeans_centroids_shared` — BIT-identical, used only when the
    training set passes a bounded-size pull (same pattern as the
    connected-components union-find fast path).

    Why it can be exact:
    - distances: numpy elementwise ops accumulated sequentially across
      dims — the same IEEE add order as ``_sq_dist_arrow`` (same
      operands, same order, so the same doubles);
    - assignment: first-occurrence argmin over (d, centroid_id) with
      centroid columns in id order ≡ ``min_by(struct(d, cid))``;
    - mean step: the decimal(28,14) cast is computed BY SPARK and
      pulled as native Arrow decimal128 — the 128-bit two's-complement
      unscaled values are read straight from the Arrow buffers, so the
      scaled integers are EXACTLY the JVM's (never a Python
      re-derivation of the double→decimal rounding); integer sums are
      exact and order-free, exactly like the distributed DECIMAL
      aggregation;
    - division + round(…, 9): float64 IEEE division (exactly the
      ``cast(sum as double) / count`` step), then a HALF_UP 9 dp
      quantize of ``repr(x)`` — Spark's Round goes through
      ``BigDecimal(Double.toString(x))``, and Python's shortest repr
      matches this JDK's toString on every probe: verified
      bitwise-equal against ``F.round(x, 9)`` over 2M random doubles
      including 500k engineered near 9 dp half-way boundaries, plus
      the pinned adversarial suite below.

    Pinned against the distributed loop (including on full-precision
    adversarial doubles) in tests/test_ops.py. Returns None — meaning
    "fall back to the distributed loop" — when the pull exceeds the
    cell bound or the data violates the fast path's preconditions
    (NULLs, non-finite values, ragged widths, duplicate or non-integer
    ids)."""
    import numpy as np
    from decimal import Decimal, ROUND_HALF_UP

    from dbt_customer360_spark.session import local_df

    # no-job size gate: for an at-scale corpus the fast path must not
    # even start a pull, and a LIMIT alone still schedules a task per
    # split. The optimizer's sizeInBytes estimate (file sizes for file
    # sources) is read driver-side without running anything.
    try:
        est = int(base._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # pragma: no cover - stats unavailable: stay safe
        return None
    if est > _KMEANS_DRIVER_MAX_BYTES:
        return None
    limit = max(k, _KMEANS_DRIVER_MAX_CELLS // max(dim, 1))
    dec = "decimal(28,14)"
    try:
        tbl = (
            # limit first (bounded), then spread the bounded rows so
            # the JVM decimal casts run on all cores instead of the
            # scan's (often single) input split
            base.limit(limit + 1)
            .repartition(base.sparkSession.sparkContext.defaultParallelism)
            .select(
                "vec_id",
                "v",
                "h",
                F.transform("v", lambda x: x.cast(dec)).alias("vd"),
            )
            .toArrow()
        )
    except Exception:  # pragma: no cover - non-scalar id types etc.
        return None
    n = tbl.num_rows
    if n > limit:
        return None  # at-scale corpus: distributed loop
    ddl = "centroid_id int, centroid array<double>"
    if n == 0:
        return F.broadcast(local_df(base.sparkSession, [], ddl))
    import pyarrow as pa

    id_arr = tbl.column("vec_id").combine_chunks()
    h_arr = tbl.column("h").combine_chunks()
    v_arr = tbl.column("v").combine_chunks()
    d_arr = tbl.column("vd").combine_chunks()
    if (
        not pa.types.is_integer(id_arr.type)
        or id_arr.null_count
        or h_arr.null_count
        or v_arr.null_count
        or d_arr.null_count
    ):
        return None
    ids = id_arr.to_numpy()
    hs = h_arr.to_numpy()
    if len(np.unique(ids)) != n:
        return None
    # ragged-width guard: every vector must be exactly `dim` wide
    v_lens = np.diff(v_arr.offsets.to_numpy())
    d_lens = np.diff(d_arr.offsets.to_numpy())
    if (v_lens != dim).any() or (d_lens != dim).any():
        return None
    v_flat = v_arr.flatten()
    d_flat = d_arr.flatten()
    if v_flat.null_count or d_flat.null_count:
        return None
    V = v_flat.to_numpy().reshape(n, dim)
    if not np.isfinite(V).all():
        return None
    # decimal128 unscaled values, straight off the Arrow buffer:
    # 16-byte little-endian two's complement per value. Split into
    # three lanes (low 32, next 32, signed high 64) so per-(centroid,
    # dim) sums stay vectorized int64 AND exact: lane sums over
    # n <= 4M rows are < 2^52 (low lanes) / < n * 2^30 (high lane,
    # |unscaled| < 10^28 < 2^94).
    dbuf = d_flat.buffers()[1]
    raw = np.frombuffer(
        dbuf, dtype=np.uint64, count=2 * len(d_flat), offset=16 * d_flat.offset
    ).reshape(-1, 2)
    lo64 = raw[:, 0]
    S_hi = raw[:, 1].view(np.int64).reshape(n, dim)
    S_a = (lo64 & np.uint64(0xFFFFFFFF)).astype(np.int64).reshape(n, dim)
    S_b = (lo64 >> np.uint64(32)).astype(np.int64).reshape(n, dim)
    # init: k smallest (h, vec_id); centroid_id = rank
    order = np.lexsort((ids, hs))[: min(k, n)]
    cent_ids = list(range(len(order)))
    C = V[order].copy()
    E14 = Decimal(10) ** -14
    Q9 = Decimal("1e-9")
    for _ in range(iters):
        kk = len(cent_ids)
        acc = np.zeros((n, kk), dtype=np.float64)
        for i in range(dim):
            t = V[:, i, None] - C[None, :, i]
            acc = acc + t * t
        # first-occurrence argmin == min_by(struct(d, centroid_id))
        # with columns already in ascending centroid_id order
        assign = np.argmin(acc, axis=1)
        next_ids: list[int] = []
        next_cents: list[list[float]] = []
        for ci in range(kk):
            mask = assign == ci
            cnt = int(mask.sum())
            if cnt == 0:
                continue  # empty group: absent, exactly like groupBy
            hi = S_hi[mask].sum(axis=0, dtype=np.int64)
            b = S_b[mask].sum(axis=0, dtype=np.int64)
            a = S_a[mask].sum(axis=0, dtype=np.int64)
            mean = []
            for d_i in range(dim):
                total = (int(hi[d_i]) << 64) + (int(b[d_i]) << 32) + int(a[d_i])
                raw = float(Decimal(total) * E14) / float(cnt)
                m = float(Decimal(repr(raw)).quantize(Q9, rounding=ROUND_HALF_UP))
                # java BigDecimal has no negative zero: round() there
                # yields +0.0 where Python's quantize keeps -0.0
                mean.append(m if m != 0.0 else 0.0)
            next_ids.append(cent_ids[ci])
            next_cents.append(mean)
        cent_ids = next_ids
        C = np.array(next_cents, dtype=np.float64).reshape(len(next_ids), dim)
    rows = [(cid, list(map(float, cvec))) for cid, cvec in zip(cent_ids, C)]
    return F.broadcast(local_df(base.sparkSession, rows, ddl))


def kmeans_centroids_shared(
    corpus: DataFrame,
    dim: int,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Deterministic Lloyd k-means whose every step is reproducible in
    any SQL engine (the DuckDB oracle replays it):

    - init: the k corpus vectors with the smallest
      (uint60(md5('ivf{seed}:' || vec_id)), vec_id) — md5 instead of
      xxhash64, truncated to 15 hex digits so the value fits a BIGINT
      on engines without unsigned 64-bit;
    - assignment: min_by over (squared distance, centroid_id);
    - update: per-dimension mean computed as an EXACT decimal sum,
      one double division, rounded to 9 dp — so both engines hold
      bit-identical centroids between iterations (a raw double avg
      would drift with summation order).

    Every step is a pure order-free function of the rows, so a bounded
    corpus (``rows*dim <= _KMEANS_DRIVER_MAX_CELLS``) trains on the
    driver via :func:`_kmeans_shared_driver` — one bounded pull instead
    of ~2 Spark jobs per Lloyd iteration, byte-identical output. Larger
    corpora (and any precondition violation) run the distributed loop
    below unchanged.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"ivf{seed}:"), F.col("vec_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    base = corpus.select(
        F.col("vec_id"), F.col(vec_col).cast("array<double>").alias("v"), h.alias("h")
    )
    fast = _kmeans_shared_driver(base, dim, k, iters)
    if fast is not None:
        return fast
    init = base.orderBy("h", "vec_id").limit(k)
    centroids = F.broadcast(
        init.select(
            (F.row_number().over(Window.orderBy("h", "vec_id")) - 1).alias("centroid_id"),
            F.col("v").alias("centroid"),
        )
    )
    pts = spread_for_compute(base.select("vec_id", "v"))
    dec = "decimal(28,14)"
    for _ in range(iters):
        dist = _sq_dist_best(F.col("v"), F.col("centroid"), dim)
        assigned = (
            pts.crossJoin(centroids)
            .withColumn("d", dist)
            .groupBy("vec_id")
            .agg(
                F.min_by(
                    F.struct("v", "centroid_id"), F.struct(F.col("d"), F.col("centroid_id"))
                ).alias("__w")
            )
            .select(F.col("__w.v").alias("v"), F.col("__w.centroid_id").alias("centroid_id"))
        )
        # mean step via posexplode: (centroid_id, pos) groups with ONE
        # decimal-sum agg pair regardless of dim — the r4 shape built
        # 2*dim aggregate expressions, whose janino compile alone cost
        # seconds per iteration. DECIMAL addition is exact, so the
        # group-sum order cannot change the value: bit-identical to the
        # per-column shape AND to the DuckDB oracle replay.
        means = (
            assigned.select("centroid_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(
                F.round(
                    F.sum(F.col("x").cast(dec)).cast("double") / F.count("*"), 9
                ).alias("m")
            )
        )
        # k-row localCheckpoint per iteration (see kmeans_centroids):
        # values are materialized once, so the checkpoint cannot change
        # them — the DuckDB oracle replay stays bit-identical
        centroids = _materialize_centroids(
            means.groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda st: st["m"],
                ).alias("centroid")
            )
        )
    return centroids


def ivf_topk_shared(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k over :func:`kmeans_centroids_shared` cells — the
    oracle-checked variant of :func:`ivf_topk` (same plan shape:
    min_by corpus assignment, window-probed queries, per-cell exact
    cosine, per-query rank)."""
    cents = kmeans_centroids_shared(corpus, dim, k=n_centroids, seed=seed, vec_col=vec_col)
    dist = _sq_dist_best(F.col("__v"), F.col("centroid"), dim)
    c = (
        spread_for_compute(
            corpus.select(F.col("vec_id").alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("__v"))
        )
        .crossJoin(cents)
        .withColumn("d", dist)
        .groupBy("neighbor_id")
        .agg(
            F.min_by(F.struct("__v", "centroid_id"), F.struct(F.col("d"), F.col("centroid_id"))).alias("__w")
        )
        .select("neighbor_id", F.col("__w.__v").alias("c_vec"), F.col("__w.centroid_id").alias("centroid_id"))
    )
    qw = Window.partitionBy("query_id").orderBy(F.col("d").asc(), F.col("centroid_id").asc())
    q = (
        queries.select(F.col("vec_id").alias("query_id"), F.col(vec_col).cast("array<double>").alias("__v"))
        .crossJoin(cents)
        .withColumn("d", dist)
        .withColumn("rn", F.row_number().over(qw))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", F.col("__v").alias("q_vec"), "centroid_id")
    )
    scored = (
        c.join(q, "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    train_sample: int | None = 262_144,
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their nearest-centroid
    cell; each query probes its ``n_probe`` nearest cells and ranks
    candidates by exact cosine. The corpus-side assignment shuffles by
    centroid_id, so at scale each probe touches n_probe/n_centroids of
    the data (the inverted-file effect)."""
    cents = kmeans_centroids(corpus, dim, k=n_centroids, seed=seed, train_sample=train_sample)

    def assign(df: DataFrame, id_alias: str, n_keep: int) -> DataFrame:
        dist = _sq_dist_best(F.col("__v"), F.col("centroid"), dim)
        scored = (
            spread_for_compute(
                df.select(
                    F.col(id_col).alias(id_alias),
                    F.col(vec_col).cast("array<double>").alias("__v"),
                )
            )
            .crossJoin(cents)
            .withColumn("d", dist)
        )
        if n_keep == 1:
            # corpus-side argmin: min_by aggregation (map-side combine),
            # no per-vector window shuffle
            return scored.groupBy(id_alias).agg(
                F.min_by(
                    F.struct("__v", "centroid_id"), F.struct(F.col("d"), F.col("centroid_id"))
                ).alias("__w")
            ).select(id_alias, F.col("__w.__v").alias("__v"), F.col("__w.centroid_id").alias("centroid_id"))
        w = Window.partitionBy(id_alias).orderBy(F.col("d").asc(), F.col("centroid_id").asc())
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= n_keep)
            .select(id_alias, "__v", "centroid_id")
        )

    c = assign(corpus, "neighbor_id", 1).withColumnRenamed("__v", "c_vec")
    q = assign(queries, "query_id", n_probe).withColumnRenamed("__v", "q_vec")
    scored = (
        c.join(q, "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def brute_force_topk_int8(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Quantized brute-force top-k: both sides int8-quantized
    (:func:`quantize_int8`), scored by ``(scale_q * scale_c) *
    int_dot`` — the serving configuration where the fp32 column never
    leaves storage and the ANN working set shrinks 4x (the dominant
    memory-bandwidth cost at 100 TB). The integer dot product is EXACT
    (64-dim int8 dot bounds at ~2^20, nowhere near long overflow), so
    the only float steps are the two scales and one left-associative
    product — bit-identical on any engine; ranking ties break by
    neighbor id. Same broadcast-query crossJoin shape as the fp32
    baseline: the corpus is never shuffled before the per-query top-k.
    """
    def _q(df: DataFrame, prefix: str) -> DataFrame:
        scale, qv = quantize_int8(F.col(vec_col))
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            scale.alias(f"{prefix}_scale"),
            qv.alias(f"{prefix}_q"),
        )

    q = F.broadcast(_q(queries, "query"))
    c = spread_for_compute(_q(corpus, "neighbor"))
    dot = F.aggregate(
        F.zip_with(
            F.col("query_q"), F.col("neighbor_q"), lambda a, b: (a * b).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            ((F.col("query_scale") * F.col("neighbor_scale")) * dot.cast("double")).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def quantize_int8(vec: Column) -> tuple[Column, Column]:
    """Symmetric int8 quantization for embedding columns: q_i =
    round(x_i * 127 / max|x|), dequantize as q_i * scale. At 100TB an
    fp32 embedding column is the dominant ANN working set; int8 cuts
    it 4x with ~1% cosine error. Rounding is the engine-stable
    floor(x + 0.5) (identical IEEE ops on any engine — see plans._q6);
    zero vectors quantize to scale 0.0 and an all-zero q. Native
    higher-order functions — JVM-side, no Python in the row path."""
    v = vec.cast("array<double>")
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(maxabs > 0, maxabs / F.lit(127.0)).otherwise(F.lit(0.0))
    qvec = F.when(
        maxabs > 0,
        F.transform(
            v, lambda x: F.floor(x * F.lit(127.0) / maxabs + F.lit(0.5)).cast("int")
        ),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return scale, qvec


def ivf_topk_int8(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    train_sample: int | None = 262_144,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF cells + int8 vectors — the production 100 TB serving shape
    composed from two attested operators: cell routing caps the scan at
    ~n_probe/n_centroids of the corpus (:func:`ivf_topk`) and int8
    storage cuts the scanned bytes 4x (:func:`brute_force_topk_int8`).

    Cell assignment uses the fp32 vectors (centroid training on a
    deterministic sample, assignment exact); candidate scoring inside
    the probed cells uses the quantized vectors with the exact integer
    dot and the ``(scale_q * scale_c) * dot`` rescale — every float
    step exactly-rounded IEEE, so results replay bit-identically on any
    engine (tested against the fp32-cell twin + a DuckDB oracle in the
    extra registry)."""
    cents = (
        centroids  # caller-supplied cells (e.g. the oracle-replayable
        # kmeans_centroids_shared) — must be (centroid_id, centroid)
        if centroids is not None
        else kmeans_centroids(
            corpus, dim, k=n_centroids, seed=seed, train_sample=train_sample
        )
    )

    def assign(df: DataFrame, id_alias: str, n_keep: int) -> DataFrame:
        scored = (
            df.select(
                F.col(id_col).alias(id_alias),
                F.col(vec_col).cast("array<double>").alias("__v"),
            )
            .crossJoin(cents)
            .withColumn("d", _sq_dist_arrow(F.col("__v"), F.col("centroid")))
        )
        if n_keep == 1:
            return (
                scored.groupBy(id_alias)
                .agg(
                    F.min_by(
                        F.struct("__v", "centroid_id"),
                        F.struct(F.col("d"), F.col("centroid_id")),
                    ).alias("__w")
                )
                .select(id_alias, F.col("__w.__v").alias("__v"), F.col("__w.centroid_id").alias("centroid_id"))
            )
        w = Window.partitionBy(id_alias).orderBy(F.col("d").asc(), F.col("centroid_id").asc())
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= n_keep)
            .select(id_alias, "__v", "centroid_id")
        )

    def _quant(df: DataFrame, prefix: str) -> DataFrame:
        scale, qv = quantize_int8(F.col("__v"))
        return df.select(
            F.col(df.columns[0]),
            "centroid_id",
            scale.alias(f"{prefix}_scale"),
            qv.alias(f"{prefix}_q"),
        )

    c = _quant(assign(corpus, "neighbor_id", 1), "neighbor")
    q = _quant(assign(queries, "query_id", n_probe), "query")
    dot = F.aggregate(
        F.zip_with(
            F.col("query_q"), F.col("neighbor_q"), lambda a, b: (a * b).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        c.join(q, "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                (F.col("query_scale") * F.col("neighbor_scale")) * dot.cast("double")
            ).alias("score"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
