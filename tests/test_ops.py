"""Dedup / similarity / textstats / golden / multimodal operator tests."""

import math

import pytest

from pyspark.sql import functions as F

from dbt_customer360_spark.operators import dedup, golden, multimodal, similarity, textstats


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "id long, t string"
    )
    out = dedup.exact_dedup(df, "t", ["id"])
    assert sorted(r.id for r in out.collect()) == [1, 3]


def test_minhash_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    near = base.replace("lazy", "sleepy")
    other = "completely different content about spark dataframes and shuffle partitions at scale"
    df = spark.createDataFrame([(1, base), (2, near), (3, other)], "id long, t string")
    pairs = {(r.id_a, r.id_b): r.est_jaccard for r in dedup.minhash_lsh_pairs(df, "id", "t", 32, 8).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_hamming_small_for_near_dups(spark):
    base = " ".join(f"word{i}" for i in range(60))
    near = base.replace("word30", "different")
    other = " ".join(f"token{i}" for i in range(60))
    df = spark.createDataFrame([(1, base), (2, near), (3, other)], "id long, t string")
    s = df.select("id", dedup.simhash(F.col("t")).alias("h")).collect()
    h = {r.id: r.h for r in s}
    d12 = bin(h[1] ^ h[2]).count("1")
    d13 = bin(h[1] ^ h[3]).count("1")
    assert d12 < d13


def test_ngram_jaccard(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "z y x w v")], "id long, t string"
    )
    pairs = {(r.id_a, r.id_b): r.jaccard for r in dedup.ngram_jaccard_pairs(df, "id", "t", n=2, threshold=0.5).collect()}
    assert pairs == {(1, 2): 1.0}


def test_brute_force_topk_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.rand(30, 8).astype(float)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)], "vec_id long, embedding array<double>"
    )
    out = similarity.brute_force_topk(df, df.filter("vec_id = 0"), k=3).collect()
    sims = vecs @ vecs[0] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0]))
    sims[0] = -2
    expect = list(np.argsort(-sims)[:3])
    got = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert got == expect


def test_lsh_topk_buckets_are_deterministic(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    vecs = rng.rand(40, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)], "vec_id long, embedding array<double>"
    )
    a = similarity.lsh_topk(df, df.filter("vec_id < 3"), dim=8, k=3, n_planes=2).collect()
    b = similarity.lsh_topk(df, df.filter("vec_id < 3"), dim=8, k=3, n_planes=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0


def test_rank_values_golden(spark):
    df = spark.createDataFrame(
        [
            ("u1", "a@x.com", 1), ("u1", "a@x.com", 2), ("u1", "b@x.com", 9),
            ("u2", "c@x.com", 1),
        ],
        "uid string, email string, t long",
    )
    df = df.withColumn("ts", F.timestamp_seconds("t"))
    ranked = golden.rank_values(df, "uid", "email", recency_col=F.col("ts"))
    best = {r.uid: r.email for r in golden.best_values(ranked, "uid", "email").collect()}
    # frequency beats recency: a@x.com seen twice
    assert best == {"u1": "a@x.com", "u2": "c@x.com"}


def test_garbage_names_rank_last(spark):
    df = spark.createDataFrame(
        [("u1", "Permanently Deleted"), ("u1", "Permanently Deleted"), ("u1", "Real Name")],
        "uid string, name string",
    )
    ranked = golden.rank_values(df, "uid", "name", garbage_values=golden.GARBAGE_NAMES)
    best = golden.best_values(ranked, "uid", "name").first()
    assert best.name == "Real Name"


def test_lang_id_and_tokens(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog went to the house in the garden"),
            (2, "el perro y el gato en la casa de los abuelos se fue"),
            (3, "zzz qqq www"),
        ],
        "id long, t string",
    )
    out = {r.id: r.lang for r in df.select("id", textstats.lang_id(F.col("t")).alias("lang")).collect()}
    assert out == {1: "en", 2: "es", 3: "und"}
    toks = df.select(textstats.token_count_ws(F.col("t")).alias("n")).collect()
    assert toks[0].n == 12


def test_multimodal_plumbing(spark):
    media = multimodal.synth_media(spark, n=20)
    feats = multimodal.extract_features(media, dim=4)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r.feature) == 4 and r.n_bytes > 0 for r in rows)
    plan = multimodal.frame_sample_plan(media, every_ms=500)
    assert plan.count() > 0


def test_lsn_dedup(spark):
    df = spark.createDataFrame(
        [(1, "r", "p", "v1"), (5, "r", "p", "v5"), (3, "r", "p", "v3"), (2, "r", "q", "w2")],
        "lsn long, repo string, path string, v string",
    )
    out = {(r.repo, r.path): r.v for r in dedup.lsn_dedup(df, ["repo", "path"]).collect()}
    assert out == {("r", "p"): "v5", ("r", "q"): "w2"}


def test_ivf_topk_reasonable_recall(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    # clustered data so IVF cells are meaningful
    centers = rng.rand(4, 8) * 10
    vecs = np.vstack([c + rng.rand(25, 8) for c in centers])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<double>",
    )
    q = df.filter("vec_id in (0, 30, 60)")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(df, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(df, q, dim=8, k=5, n_centroids=4, n_probe=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall
    # determinism
    again = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(df, q, dim=8, k=5, n_centroids=4, n_probe=2).collect()
    }
    assert approx == again


def test_minhash_md5_arrow_equals_jvm_twin(spark):
    """The Arrow md5-family signature and the pure-JVM fold must agree
    bit-for-bit (same contract as the simhash twin test)."""
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "short",
        "",
        "a b c d e f g h i j k l m n o p",
        # Kelvin sign (U+212A) lowercases INTO ascii 'k': strip-then-
        # lower (JVM order) discards it; a lower-first Arrow tokenizer
        # would keep it and diverge
        "temp 300K outside",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    a = df.select("id", dedup.minhash_signature(F.col("t"), 16, 3, "md5").alias("s"))
    b = df.select("id", dedup.minhash_md5_expr(F.col("t"), 16, 3).alias("s"))
    got_a = {r.id: r.s for r in a.collect()}
    got_b = {r.id: r.s for r in b.collect()}
    assert got_a == got_b


def test_multimodal_resize_plumbing(spark):
    media = multimodal.synth_media(spark, n=24)
    out = multimodal.resize_images(media, target_w=8, target_h=4).collect()
    assert out and all(r.modality == "image" for r in out)
    assert all(len(r.media) == 32 and r.width == 8 and r.height == 4 for r in out)
    # deterministic: same input -> same resized bytes
    again = {r.asset_id: bytes(r.media) for r in multimodal.resize_images(media, 8, 4).collect()}
    assert {r.asset_id: bytes(r.media) for r in out} == again


def test_kmeans_wide_dim_path(spark):
    """Round-2 verdict Wrong #3: the per-dim sum-column mean blows up
    codegen at embedding dims 512-4096. Above wide_dim_threshold the
    mean step must switch to posexplode + groupBy(centroid_id, pos) —
    same centroids (modulo double summation order), and a plan free of
    per-dim aggregate lists."""
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.rand(40, 8) * 10
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<double>",
    )
    narrow = similarity.kmeans_centroids(df, dim=8, k=3, iters=2)
    wide = similarity.kmeans_centroids(df, dim=8, k=3, iters=2, wide_dim_threshold=1)
    a = {r.centroid_id: r.centroid for r in narrow.collect()}
    b = {r.centroid_id: r.centroid for r in wide.collect()}
    assert a.keys() == b.keys()
    for cid in a:
        assert np.allclose(a[cid], b[cid], atol=1e-9), cid

    # dim=512 completes, and the plan carries no 512-wide agg list
    dim = 512
    big = rng.rand(30, dim)
    bdf = spark.createDataFrame(
        [(i, [float(x) for x in big[i]]) for i in range(len(big))],
        "vec_id long, embedding array<double>",
    )
    cents = similarity.kmeans_centroids(bdf, dim=dim, k=2, iters=1)
    plan = cents._jdf.queryExecution().optimizedPlan().toString()
    assert "s511" not in plan and "s64" not in plan
    got = cents.collect()
    assert len(got) == 2 and all(len(r.centroid) == dim for r in got)


def test_pii_scrub(spark):
    """Sequential typed redaction: emails before phones (an email's
    digits must not be half-eaten by the phone pattern), counts match
    what was actually redacted."""
    rows = [
        (1, "mail bob.smith+x@corp.example.com and +1 (555) 123-4567 ok"),
        (2, "server 10.0.255.7 ssn 123-45-6789"),
        (3, "clean text, no pii at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scrubbed, counts = textstats.pii_scrub(F.col("text"))
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            scrubbed.alias("s"),
            *[c.alias(f"n_{k}") for k, c in counts.items()],
        ).collect()
    }
    assert out[1].s == "mail [EMAIL] and [PHONE] ok"
    assert out[1].n_email == 1 and out[1].n_phone == 1 and out[1].n_ipv4 == 0
    assert out[2].s == "server [IP] ssn [SSN]"
    assert out[2].n_ipv4 == 1 and out[2].n_ssn == 1
    assert out[3].s == rows[2][1]
    assert out[3].n_email == out[3].n_phone == out[3].n_ssn == out[3].n_ipv4 == 0


def test_minhash_canonicalization_is_transitive(spark):
    """A~B and B~C near-dups (no direct A~C bucket needed): connected
    components folds the chain into ONE cluster canonicalized to the
    min doc_id; the unrelated doc stays its own canonical."""
    from dbt_customer360_spark.operators.components import connected_components

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark woods tonight while the moon rises slowly "
        "over the quiet hills and every small creature settles down to "
        "sleep beneath the old pine trees near the cold silver river"
    )
    b = base.replace("lazy", "sleepy")
    c = b.replace("moon", "sun")
    other = "completely different content about spark dataframes and shuffle"
    df = spark.createDataFrame(
        [(10, base), (11, b), (12, c), (13, other)], "doc_id long, text string"
    )
    pairs = dedup.minhash_lsh_pairs(df, "doc_id", "text", 32, 8, hash_family="md5")
    pairs = pairs.filter(F.col("est_jaccard") >= 0.5)
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    canon = {
        r.doc_id: r.canonical_id
        for r in df.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), on="doc_id", how="left")
        .select("doc_id", F.coalesce("component", "doc_id").alias("canonical_id"))
        .collect()
    }
    assert canon[10] == canon[11] == canon[12] == 10
    assert canon[13] == 13


def test_quantize_int8_roundtrip_and_zero_vector(spark):
    """Dequantized int8 vectors stay within scale/2 per element; zero
    vectors get scale 0.0 and an all-zero q; q stays in [-127, 127]."""
    import numpy as np

    rng = np.random.RandomState(3)
    vecs = [(1, [float(x) for x in rng.randn(8)]), (2, [0.0] * 8)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    scale, qvec = similarity.quantize_int8(F.col("embedding"))
    out = {r.vec_id: r for r in df.select("vec_id", scale.alias("s"), qvec.alias("q")).collect()}
    v = np.array(vecs[0][1])
    q = np.array(out[1].q)
    assert np.abs(q).max() <= 127
    assert np.abs(q * out[1].s - v).max() <= out[1].s / 2 + 1e-12
    assert out[2].s == 0.0 and all(x == 0 for x in out[2].q)


def test_repetition_features(spark):
    """Hand-checked Gopher-style signals: 'a a a b' -> top word 3/4,
    2-grams [aa,aa,ab] -> 1 dup of 3; clean text scores low."""
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "the quick brown fox jumps high")],
        "doc_id long, text string",
    )
    feats = textstats.repetition_features(F.col("text"))
    out = {r.doc_id: r for r in df.select("doc_id", *[c.alias(n) for n, c in feats.items()]).collect()}
    assert out[1].top_word_frac == 0.75
    assert abs(out[1].dup_2gram_frac - 1 / 3) < 1e-12
    assert out[1].mean_word_len == 1.0
    assert abs(out[2].top_word_frac - 1 / 6) < 1e-12
    assert out[2].dup_2gram_frac == 0.0


def test_int8_ann_recall_vs_fp32(spark):
    """Quantized brute-force top-5 must substantially agree with the
    fp32 exact top-5 (int8 cosine error ~1%): >= 80% overlap across
    queries on real embeddings, exact agreement on rank 1."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 8)
    fp = similarity.brute_force_topk(e, q, k=5).collect()
    i8 = similarity.brute_force_topk_int8(e, q, k=5).collect()
    fp_sets = {}
    fp_top1 = {}
    for r in fp:
        fp_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
        if r.rank == 1:
            fp_top1[r.query_id] = r.neighbor_id
    hits = total = 0
    for r in i8:
        total += 1
        hits += r.neighbor_id in fp_sets[r.query_id]
        if r.rank == 1:
            assert r.neighbor_id == fp_top1[r.query_id], r.query_id
    assert hits / total >= 0.8, f"recall {hits}/{total}"


def test_bm25_hand_checked(spark):
    """BM25 with the rational odds-idf, k1=1.2 b=0.75, hand-computed:
    N=3, avgdl=3; idf(a)=idf(b)=1.5/2.5=0.6;
    doc1 'a b a': 0.6*(2*2.2/3.2) + 0.6*(2.2/2.2) = 1.425
    doc2 'a c'  : 0.6*(2.2/1.9) ~= 0.694737 (term b absent -> 0)
    doc3 'b b b c': 0.6*(3*2.2/4.5) = 0.88 (term a absent -> 0)"""
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "b b b c")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.bm25
        for r in textstats.bm25_scores(df, "doc_id", "text", ["a", "b"]).collect()
    }
    assert abs(out[1] - 1.425) < 1e-12
    assert abs(out[2] - 0.6 * 2.2 / 1.9) < 1e-12
    assert abs(out[3] - 0.88) < 1e-12


def test_bm25_arrow_equals_jvm_twin(spark):
    """The Arrow tf-counting path and the JVM filter/size twin must
    produce identical scores on real documents (counts are exact ints;
    the float pipeline after them is shared)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    terms = ["hash", "join", "merge"]
    a = {r.doc_id: (r.dl, r.bm25) for r in textstats.bm25_scores(docs, "doc_id", "text", terms, impl="arrow").collect()}
    j = {r.doc_id: (r.dl, r.bm25) for r in textstats.bm25_scores(docs, "doc_id", "text", terms, impl="jvm").collect()}
    assert a == j


def test_bm25_zero_term_and_empty_doc(spark):
    """Absent terms contribute exactly 0.0; a tokenless doc scores 0
    (every tf is 0) and still appears in the output."""
    df = spark.createDataFrame(
        [(1, "only these words"), (2, "")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.bm25
        for r in textstats.bm25_scores(df, "doc_id", "text", ["absent"]).collect()
    }
    assert out == {1: 0.0, 2: 0.0}


def test_ivf_train_sample_caps_kmeans_input(spark):
    """IVF centroids train on a deterministic hash sample when the
    corpus exceeds train_sample (the 100 TB path: Lloyd passes over a
    ~256k sample, assignment over everything); results stay valid
    top-k output for every query."""
    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 3)
    out = similarity.ivf_topk(
        e, q, dim=64, k=3, n_centroids=4, n_probe=2, train_sample=100
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert set(by_q) == {0, 1, 2}
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
    # determinism: membership is a pure function of vec_id
    out2 = similarity.ivf_topk(
        e, q, dim=64, k=3, n_centroids=4, n_probe=2, train_sample=100
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_sq_dist_arrow_equals_fold(spark):
    """The Arrow distance twin must be BIT-identical to the JVM fold
    (same IEEE add order: row-vectorized, dim-sequential) on real
    embeddings — the k-means/IVF assignment correctness hinges on it."""
    from pyspark.sql import functions as F

    from dbt_customer360_spark.operators.similarity import _sq_dist, _sq_dist_arrow

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pairs = (
        e.select(F.col("vec_id").alias("ia"), F.col("embedding").cast("array<double>").alias("a"))
        .crossJoin(
            e.select(F.col("vec_id").alias("ib"), F.col("embedding").cast("array<double>").alias("b"))
            .limit(7)
        )
    )
    out = pairs.select(
        "ia", "ib",
        _sq_dist(F.col("a"), F.col("b"), None).alias("jvm"),
        _sq_dist_arrow(F.col("a"), F.col("b")).alias("arrow"),
    ).collect()
    assert out and all(r.jvm == r.arrow for r in out)  # bitwise ==


def test_lsh_bucket_arrow_equals_jvm(spark):
    """Arrow sign-LSH bucketing must be bit-identical to the JVM fold
    twin (same add order) on real embeddings."""
    from pyspark.sql import functions as F

    from dbt_customer360_spark.operators.similarity import lsh_bucket

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v = F.col("embedding").cast("array<double>")
    out = e.select(
        lsh_bucket(v, 64, 8, impl="arrow").alias("a"),
        lsh_bucket(v, 64, 8, impl="jvm").alias("j"),
    ).collect()
    assert out and all(r.a == r.j for r in out)


def test_bm25_null_text_matches_oracle_twin(spark):
    """NULL text: Arrow scores it as an empty doc (dl=0, bm25=0.0); the
    generated DuckDB twin must coalesce its NULL-propagating tokenizer
    to the same (r4 ADVICE: dl=NULL would hash-mismatch)."""
    import duckdb

    df = spark.createDataFrame(
        [(1, "a b a"), (2, None), (3, "b")], "doc_id long, text string"
    )
    srows = sorted(
        (r.doc_id, r.dl, r.bm25)
        for r in textstats.bm25_scores(df, "doc_id", "text", ["a", "b"]).collect()
    )
    toks = (
        "select doc_id, list_filter(str_split_regex(lower(regexp_replace(text,"
        " '[^a-z0-9A-Z ]', ' ', 'g')), '\\s+'), x -> x <> '') as ws"
        " from (values (1, 'a b a'), (2, NULL), (3, 'b')) t(doc_id, text)"
    )
    orows = sorted(
        tuple(r) for r in duckdb.sql(textstats.bm25_sql(toks, "doc_id", ["a", "b"])).fetchall()
    )
    assert [tuple(r) for r in srows] == orows
    assert srows[1][1] == 0 and srows[1][2] == 0.0  # the NULL-text doc


def test_bm25_rejects_non_token_terms(spark):
    """Terms with uppercase/punctuation can never match the stripped+
    lowered tokens and would break the spliced oracle SQL — refused."""
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    for bad in (["O'Brien"], ["Hash"], ["a b"], ["x;drop"]):
        with pytest.raises(ValueError):
            textstats.bm25_scores(df, "doc_id", "text", bad)
        with pytest.raises(ValueError):
            textstats.bm25_sql("select 1", "doc_id", bad)


def test_repetition_arrow_equals_jvm_twin(spark):
    """The Arrow repetition path must be BIT-identical to the JVM fold
    on real sf0.001 documents plus adversarial edges (empty, tokenless,
    repeated words, single word) — same guarantee the minhash md5
    family carries."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    edge = spark.createDataFrame(
        [(9001, ""), (9002, "!!! .."), (9003, "x"), (9004, "a a a a b"), (9005, "Tab\there\nnewline")],
        "doc_id long, text string",
    ).select("doc_id", "text")
    df = docs.select("doc_id", "text").unionByName(edge)
    feats = textstats.repetition_features(F.col("text"))
    jvm = {
        r.doc_id: (r.top_word_frac, r.dup_2gram_frac, r.mean_word_len)
        for r in df.select("doc_id", *[c.alias(n) for n, c in feats.items()]).collect()
    }
    arrow = {
        r.doc_id: (r.top_word_frac, r.dup_2gram_frac, r.mean_word_len)
        for r in df.select(
            "doc_id", textstats.repetition_features_arrow(F.col("text")).alias("f")
        ).select("doc_id", "f.*").collect()
    }
    assert jvm == arrow  # exact equality, not approx


def test_repetition_features_tokenless_doc_matches_oracle(spark):
    """A doc that tokenizes to ZERO words (empty / punctuation-only)
    must yield (0,0,0) on BOTH engines — the oracle's words-derived CTE
    used to inner-join such docs away (round-3 advice)."""
    import duckdb

    from dbt_customer360_spark.plans.queries import _REPETITION_ORACLE

    rows = [(1, ""), (2, "!!! ... ---"), (3, "ok ok")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = textstats.repetition_features(F.col("text"))
    got = {
        r.doc_id: (r.top_word_frac, r.dup_2gram_frac, r.mean_word_len)
        for r in df.select("doc_id", *[c.alias(n) for n, c in feats.items()]).collect()
    }
    assert got[1] == (0.0, 0.0, 0.0) and got[2] == (0.0, 0.0, 0.0)

    con = duckdb.connect()
    con.sql("create table documents as select * from (values (1, ''), (2, '!!! ... ---'), (3, 'ok ok')) t(doc_id, text)")
    oracle = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(_REPETITION_ORACLE).fetchall()
    }
    assert oracle == got


def test_ivf_int8_recall_vs_fp32_cells(spark):
    """IVF+int8 serving path: same cells as the fp32 IVF (shared
    deterministic centroids), int8 scoring inside the probed cells.
    Top-5 must substantially overlap the fp32-IVF top-5 (>= 80%), the
    production sample-trained path must run, and results must be
    deterministic across invocations."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 8)
    cents = similarity.kmeans_centroids_shared(e, 64, k=8, iters=2)
    fp = similarity.ivf_topk_shared(e, q, dim=64, k=5, n_centroids=8, n_probe=2).collect()
    i8 = similarity.ivf_topk_int8(
        e, q, dim=64, k=5, n_centroids=8, n_probe=2, centroids=cents
    ).collect()
    fp_sets = {}
    for r in fp:
        fp_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for r in i8:
        total += 1
        hits += r.neighbor_id in fp_sets[r.query_id]
    assert hits / total >= 0.8, f"recall {hits}/{total}"
    # determinism
    again = similarity.ivf_topk_int8(
        e, q, dim=64, k=5, n_centroids=8, n_probe=2, centroids=cents
    ).collect()
    assert {(r.query_id, r.neighbor_id, r.rank) for r in again} == {
        (r.query_id, r.neighbor_id, r.rank) for r in i8
    }
    # production path: sample-trained centroids, no oracle constraint
    prod = similarity.ivf_topk_int8(e, q, dim=64, k=5, n_centroids=8, n_probe=2)
    assert prod.count() == 40


def test_kmeans_shared_driver_path_equals_distributed(spark):
    """The driver-side Lloyd fast path (bounded pull + Arrow decimal128
    buffers) must be BIT-identical to the distributed loop — on real
    embeddings AND on adversarial full-precision doubles (mixed
    magnitudes, negative zeros, repeating-fraction ties) where any
    re-derivation of the JVM's double->decimal rounding would diverge."""
    import random
    import struct

    from dbt_customer360_spark.session import local_df

    def canon(df):
        return sorted(
            (r["centroid_id"], tuple(struct.pack("<d", x) for x in r["centroid"]))
            for r in df.collect()
        )

    def both(df, dim, k, iters):
        fast = canon(similarity.kmeans_centroids_shared(df, dim, k=k, iters=iters))
        old = similarity._KMEANS_DRIVER_MAX_CELLS
        similarity._KMEANS_DRIVER_MAX_CELLS = 0  # force the distributed loop
        try:
            dist = canon(similarity.kmeans_centroids_shared(df, dim, k=k, iters=iters))
        finally:
            similarity._KMEANS_DRIVER_MAX_CELLS = old
        return fast, dist

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    fast, dist = both(e, 64, 8, 2)
    assert fast == dist and len(fast) == 8

    random.seed(7)
    rows = [
        (
            i,
            [
                random.uniform(-50, 50) * (10 ** random.choice([-8, -3, 0, 0, 2]))
                for _ in range(16)
            ],
        )
        for i in range(500)
    ]
    rows += [
        (
            1000 + i,
            [
                random.choice([0.0, -0.0, 1e-15, -1e-15, 1.0 / 3.0, 123456.789])
                for _ in range(16)
            ],
        )
        for i in range(100)
    ]
    adv = local_df(spark, rows, "vec_id long, embedding array<double>")
    fast, dist = both(adv, 16, 5, 3)
    assert fast == dist and fast

    # precondition violations fall back (still correct, just distributed):
    # a NULL vector must not break the fast path's result
    with_null = local_df(
        spark,
        rows[:50] + [(9999, None)],
        "vec_id long, embedding array<double>",
    )
    assert similarity._kmeans_shared_driver(
        with_null.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("v"),
            F.xxhash64("vec_id").alias("h"),
        ),
        16,
        4,
        1,
    ) is None


def test_connected_components_small_path_equals_distributed(spark):
    """The driver union-find fast path (small graphs) must be
    byte-identical to the distributed min-label rounds on an irregular
    graph with chains, stars, singleton-adjacent pairs and self-loops."""
    from dbt_customer360_spark.operators.components import connected_components

    edges = [(i, i + 1) for i in range(0, 40, 2)]          # 20 two-node comps
    edges += [(100, 100 + k) for k in range(1, 6)]          # star at 100
    edges += [(200 + k, 201 + k) for k in range(10)]        # chain 200..210
    edges += [(300, 300)]                                   # self loop
    edges += [(401, 400), (402, 401)]                       # reversed chain
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    fast = connected_components(df)                         # under threshold
    slow = connected_components(df, small_graph_edges=0)    # force distributed
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))
