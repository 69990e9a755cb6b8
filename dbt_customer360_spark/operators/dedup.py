"""Deduplication operators.

- ``lsn_dedup``: last-writer-wins by max LSN per key — the per-micro-
  batch dedup mandated by the north_star ("row_number window over
  max-LSN", BASELINE.json:6).
- ``exact_dedup``: exact duplicate removal by content hash.
- ``minhash_lsh_pairs`` / ``simhash_near_dups`` / ``ngram_jaccard_pairs``:
  near-duplicate detection for training-data pipelines. Candidate
  generation is always a bucketed equi-join (shingle -> signature ->
  band -> bucket), never a cartesian. Signatures come in two hash
  families: 'xxhash64' (pure JVM) and 'md5' (Arrow pandas UDF with a
  pinned-equivalent JVM twin) — the md5 family is bit-reproducible in
  DuckDB, which is how the roster queries get independent oracles.

Scale notes: LSH candidate generation self-joins on (band, signature)
buckets — an equi-join, shuffle-partitioned by bucket key, never a
cartesian. Hot buckets (boilerplate docs) are capped via
``max_bucket_size`` before the join to bound the pair explosion
(SURVEY.md §7.3 "candidate-pair explosion").
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from dbt_customer360_spark.session import spread_for_compute


def lsn_dedup(df: DataFrame, keys: list[str], lsn_col: str = "lsn") -> DataFrame:
    """Keep only the highest-LSN row per key (ties impossible: LSN unique)."""
    w = Window.partitionBy(*keys).orderBy(F.col(lsn_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(df: DataFrame, content_col: str, tie_break: list[str]) -> DataFrame:
    """One row per distinct content hash; deterministic winner via tie_break asc."""
    w = Window.partitionBy(F.sha2(F.col(content_col), 256)).orderBy(
        *[F.col(c).asc() for c in tie_break]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# --- shingling ------------------------------------------------------------------


def _shingles(text: Column, n: int = 5) -> Column:
    """Word n-gram shingles as an array<string> (built-ins only)."""
    words = F.split(F.lower(F.regexp_replace(text, r"[^a-z0-9A-Z ]", " ")), r"\s+")
    words = F.filter(words, lambda w: w != "")
    cnt = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    return F.when(cnt < n, F.array(F.concat_ws(" ", words))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    )


_MAX_LONG = (1 << 63) - 1


def minhash_signature(
    text: Column,
    num_hashes: int = 32,
    shingle_n: int = 5,
    hash_family: str = "xxhash64",
) -> Column:
    """Length-``num_hashes`` minhash signature, computed in ONE fold over
    the shingle array (``aggregate`` + ``zip_with(least)``): each shingle
    is hashed ``num_hashes`` times and all mins update together — the
    round-1 variant re-evaluated the shingle array once per hash.

    ``hash_family``:
    - 'xxhash64' (fastest): hash_i(s) = xxhash64(s, i), array<bigint>.
    - 'md5': ONE md5 per shingle, split into two 32-bit halves (c0,
      c1); hash_i(s) = (c0 + (2*c1+1) * i) mod 2^32 — the classic
      one-hash + linear-probe minhash family (odd multiplier keeps the
      probe a permutation of Z_2^32). All arithmetic stays below 2^63,
      so DuckDB's overflow-checked UBIGINT computes bit-identical
      values — the md5 family is what the oracle-checked roster query
      uses, at ~1/30th of the hashing cost of 32 independent md5s."""
    if hash_family == "md5":
        return _minhash_md5_arrow(text, num_hashes, shingle_n)
    sh = _shingles(text, shingle_n)
    idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    init = F.array_repeat(F.lit(_MAX_LONG).cast("long"), num_hashes)
    per_shingle = lambda s: F.transform(idx, lambda i: F.xxhash64(s, i))  # noqa: E731
    return F.aggregate(
        sh, init, lambda acc, s: F.zip_with(acc, per_shingle(s), lambda a, b: F.least(a, b))
    )


def _minhash_md5_arrow(text: Column, num_hashes: int, shingle_n: int) -> Column:
    """Arrow pandas UDF md5-family minhash: one hashlib.md5 per shingle,
    32 linear probes vectorized in numpy. Bit-identical to the JVM twin
    :func:`minhash_md5_expr` (tests pin the equivalence) and to the
    DuckDB oracle; ~6x the JVM fold's throughput — Spark's higher-order
    aggregate/zip_with allocates a fresh array per shingle step."""
    n = shingle_n

    @pandas_udf("array<long>")
    def _sig(texts: pd.Series) -> pd.Series:
        # strip BEFORE lowering, matching the JVM/_DUCK_TOKS order:
        # some non-ascii chars (Kelvin sign) lowercase INTO ascii, so
        # lower-then-strip would keep tokens the JVM path discards
        strip = re.compile(r"[^a-zA-Z0-9 ]")
        probes = np.arange(num_hashes, dtype=np.uint64)
        mask = np.uint64(4294967295)
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            words = strip.sub(" ", t).lower().split()
            if len(words) < n:
                grams = [" ".join(words)]
            else:
                grams = [" ".join(words[j : j + n]) for j in range(len(words) - n + 1)]
            digest = b"".join(hashlib.md5(g.encode()).digest()[:8] for g in grams)
            cs = np.frombuffer(digest, dtype=">u4").reshape(len(grams), 2).astype(np.uint64)
            c0, c1 = cs[:, 0:1], cs[:, 1:2]
            vals = (c0 + (2 * c1 + 1) * probes[None, :]) & mask
            out.append(vals.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    # see simhash: prevent optimizer duplication of the heavy UDF
    return _sig.asNondeterministic()(text)


def minhash_md5_expr(text: Column, num_hashes: int = 32, shingle_n: int = 5) -> Column:
    """Pure-JVM twin of the md5-family signature (no Python workers):
    one md5 per shingle, halves via conv(hex), probes in a single
    aggregate fold. Same values as :func:`_minhash_md5_arrow`."""
    sh = _shingles(text, shingle_n)
    idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    init = F.array_repeat(F.lit(_MAX_LONG).cast("long"), num_hashes)

    def per_shingle(s):
        h = F.md5(s)
        c0 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
        c1 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
        return F.transform(
            idx, lambda i: F.pmod(c0 + (c1 * 2 + 1) * i, F.lit(4294967296))
        )

    return F.aggregate(
        sh, init, lambda acc, s: F.zip_with(acc, per_shingle(s), lambda a, b: F.least(a, b))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    max_bucket_size: int = 200,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via MinHash-LSH.

    Rows sharing any band signature become candidates; the pair list
    is deduplicated. Estimated jaccard (signature agreement rate) is
    attached for downstream thresholding. With ``hash_family='md5'``
    every hash (signature + band bucket) is plain md5, so the whole
    candidate generation is reproducible in any engine with md5 — the
    driver's DuckDB oracle replays it exactly.
    """
    rows_per_band = num_hashes // bands
    # signature hashing is the heavy per-row step; spread a small scan
    # across cores before it (no-op on at-scale inputs)
    sig = spread_for_compute(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))).select(
        "id",
        minhash_signature(F.col("__t"), num_hashes, shingle_n, hash_family).alias("sig"),
    )
    # no persist: the self-join's two branches share the banding
    # window's Exchange via ReuseExchange (identical subtrees), so the
    # signature UDF runs ONCE; a persist here turned both branches into
    # independent cache-builds that raced and computed the UDF twice.

    def band_bucket(b: int) -> F.Column:
        joined = F.concat_ws(
            ",",
            *[
                F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                for r in range(rows_per_band)
            ],
        )
        return F.md5(joined) if hash_family == "md5" else F.xxhash64(joined).cast("string")

    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_bucket(b).alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # frequent-bucket cap: drop pathological buckets before the self-join
    w = Window.partitionBy("band", "bucket").orderBy("id")
    banded = banded.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= max_bucket_size
    )
    a = banded.select(
        F.col("band"), F.col("bucket"), F.col("id").alias("id_a"), F.col("sig").alias("sig_a")
    )
    b = banded.select(
        F.col("band"), F.col("bucket"), F.col("id").alias("id_b"), F.col("sig").alias("sig_b")
    )
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda t: t)
    )
    # score BEFORE the pair dedup: est_jaccard is a pure function of
    # the two signatures, so every duplicate candidate row (one per
    # shared band) carries the identical value and dropDuplicates then
    # shuffles 3 narrow columns instead of two 32-long signature
    # arrays per row (guide §2.3: shuffle fewer bytes)
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (agree / F.lit(float(len(range(num_hashes))))).alias("est_jaccard"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def simhash(text: Column, shingle_n: int = 3, hash_family: str = "blake2b") -> Column:
    """64-bit SimHash of word shingles, as bigint (majority vote per bit
    over an 8-byte hash of each shingle).

    Implemented as a vectorized Arrow pandas UDF with numpy bit ops --
    measured ~5x faster than the best pure-JVM formulation
    (:func:`simhash_expr`), because the JVM side has no per-bit SIMD
    primitive and falls back to 64-wide array lambdas.

    ``hash_family``: 'blake2b' (8-byte digest, fastest) or 'md5'
    (first 8 digest bytes, big-endian) — the md5 family is bit-exactly
    reproducible in DuckDB (``('0x' || substr(md5(g),1,16))::ubigint``),
    which is how the roster query gets an independent oracle. Bit b of
    the result (b=0 = LSB) is set iff the majority of shingle hashes
    have bit b set.
    """
    n = shingle_n
    use_md5 = hash_family == "md5"

    @pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        # strip BEFORE lowering, matching the JVM/_DUCK_TOKS order:
        # some non-ascii chars (Kelvin sign) lowercase INTO ascii, so
        # lower-then-strip would keep tokens the JVM path discards
        strip = re.compile(r"[^a-zA-Z0-9 ]")
        weights = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if t is None:
                continue
            words = strip.sub(" ", t).lower().split()
            if len(words) < n:
                grams = [" ".join(words)]
            else:
                grams = [" ".join(words[j : j + n]) for j in range(len(words) - n + 1)]
            if use_md5:
                digest = b"".join(hashlib.md5(g.encode()).digest()[:8] for g in grams)
                hs = np.frombuffer(digest, dtype=">u8").astype(np.uint64)
            else:
                digest = b"".join(
                    hashlib.blake2b(g.encode(), digest_size=8).digest() for g in grams
                )
                hs = np.frombuffer(digest, dtype=np.uint64)
            bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            votes = bits.sum(0).astype(np.int64) * 2 - len(hs)
            out[i] = weights[votes > 0].sum(dtype=np.uint64).astype(np.int64)
        return pd.Series(out)

    # nondeterministic marker (guide-standard for expensive UDFs): stops
    # the optimizer pushing join-key IsNotNull filters below the spread
    # exchange, which DUPLICATED this UDF onto the single-task scan side
    # (observed: ArrowEvalPython twice per join side). Values unchanged.
    return _simhash.asNondeterministic()(text)


def simhash_expr(text: Column, bits: int = 64, shingle_n: int = 3) -> Column:
    """Pure-JVM SimHash (no Python workers): one aggregate pass over the
    shingle hashes, per-bit votes via the bin-string trick. Use when the
    cluster must avoid Python worker processes entirely."""
    sh = _shingles(text, shingle_n)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.split(F.lpad(F.bin(h), bits, "0"), ""),
            lambda a, c: a + F.when(c == "1", 1).otherwise(-1),
        ),
    )
    powers = F.array(
        *[
            (F.lit(-(2**63)) if i == 63 else F.lit(1 << i)).cast("long")
            for i in range(bits)
        ]
    )
    return F.aggregate(
        F.zip_with(
            F.reverse(votes),
            powers,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a.bitwiseOR(x),
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    prefix_bits: int = 16,
    max_bucket_size: int = 200,
    hash_family: str = "blake2b",
) -> DataFrame:
    """Near-dup candidates: identical top ``prefix_bits`` of the simhash
    (a 1-band LSH on the hash prefix), with full-hash hamming distance.

    Hot prefix buckets (boilerplate-heavy corpora) are capped at
    ``max_bucket_size`` rows (deterministic min-id survivors) before the
    self-join, same bound as the minhash path — a popular prefix would
    otherwise square."""
    s = spread_for_compute(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))).select(
        "id", simhash(F.col("__t"), hash_family=hash_family).alias("sh")
    )
    s = s.withColumn("bucket", F.shiftrightunsigned("sh", 64 - prefix_bits))
    w = Window.partitionBy("bucket").orderBy("id")
    s = s.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= max_bucket_size
    )
    a = s.select(F.col("bucket"), F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = s.select(F.col("bucket"), F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    With ``block_col``, pairs are restricted to the given blocking key.
    Without it, the join blocks on a log2 length bucket of the distinct
    gram count: J(x,y) >= t implies |g_x|/|g_y| in [t, 1/t], so a pair
    above threshold can differ by at most k = ceil(log2(1/t)) buckets —
    the left side probes buckets b-k..b+k, making the blocked join
    EXACT (no pair >= threshold is missed) while never going cartesian.
    Jaccard via array_intersect/array_union sizes; result filtered to
    ``jaccard >= threshold`` (so the length blocking is loss-free).
    """
    import math

    grams = F.array_distinct(_shingles(F.col("__t"), n))
    if block_col is not None:
        base = spread_for_compute(
            df.select(
                F.col(id_col).alias("id"), F.col(text_col).alias("__t"),
                F.col(block_col).cast("string").alias("block"),
            )
        ).select("id", grams.alias("grams"), "block")
        a = base.select("block", F.col("id").alias("id_a"), F.col("grams").alias("g_a"))
        b = base.select("block", F.col("id").alias("id_b"), F.col("grams").alias("g_b"))
    else:
        if threshold <= 0:
            raise ValueError("threshold must be > 0 when block_col is None (length blocking)")
        k = math.ceil(math.log2(1.0 / threshold)) if threshold < 1.0 else 0
        bucket = F.floor(F.log2(F.size("grams") + F.lit(1))).cast("int")
        base = spread_for_compute(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
        ).select("id", grams.alias("grams")).withColumn("__bucket", bucket)
        # probe side fans out to the k adjacent buckets on each side;
        # build side keeps its own bucket -> equi-join, never cartesian
        a = base.select(
            F.explode(F.sequence(F.col("__bucket") - k, F.col("__bucket") + k)).alias("__probe"),
            F.col("id").alias("id_a"),
            F.col("grams").alias("g_a"),
        ).select(F.col("__probe").cast("string").alias("block"), "id_a", "g_a")
        b = base.select(
            F.col("__bucket").cast("string").alias("block"),
            F.col("id").alias("id_b"),
            F.col("grams").alias("g_b"),
        )
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.size(F.array_union("g_a", "g_b"))
    # score + threshold BEFORE the pair dedup: jaccard is a pure
    # function of the two gram sets, so duplicate candidate rows (one
    # per shared block) carry identical values — the dedup then
    # shuffles 3 narrow columns instead of two full gram arrays per
    # row, and the threshold prunes rows ahead of that exchange
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
