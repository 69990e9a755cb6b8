"""Deterministic synthetic CDC stream + repos-table generator.

Implements FIXTURES.md §1: a change-event stream
``(lsn, op, repo, path, commit, lang, content, source_connector, ts)``
over a repos table keyed by (repo, path). Fully deterministic from a
seed — every value is a pure function of (seed, repo_id, path_id,
version), computed JVM-side with Spark column expressions so the
generator itself scales (no driver-side row materialization).

Skew: repo ids follow a zipf-ish distribution (repo 0 is hottest) to
exercise salting / AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANG_VARIANTS = [
    "Python", "py", "PY", "python",
    "Java", "java", "JAVA",
    "Go", "go", "golang",
    "Rust", "rs", "rust",
    "C++", "cpp", "CPP",
]


def _content_expr(seed: int) -> "F.Column":
    """Deterministic pseudo-source-code text from (repo, path, version)."""
    h = F.sha2(
        F.concat_ws("|", F.lit(str(seed)), "repo", "path", F.col("version").cast("string")),
        256,
    )
    return F.concat(
        F.lit("def f_"),
        F.substring(h, 1, 8),
        F.lit("():\n    return '"),
        F.repeat(F.substring(h, 9, 16), 4),
        F.lit("'  # v"),
        F.col("version").cast("string"),
    )


def generate_repos(
    spark: SparkSession,
    n_repos: int = 50,
    paths_per_repo: int = 40,
    seed: int = 42,
) -> DataFrame:
    """Initial repos table: (repo, path, commit, lang, content)."""
    n = n_repos * paths_per_repo
    df = (
        spark.range(n)
        .withColumn("repo_id", (F.col("id") % n_repos).cast("int"))
        .withColumn("path_id", (F.col("id") / n_repos).cast("int"))
        .withColumn("version", F.lit(0))
    )
    return _event_columns(df, seed).select("repo", "path", "commit", "lang", "content")


def _event_columns(df: DataFrame, seed: int) -> DataFrame:
    lang_arr = F.array(*[F.lit(v) for v in LANG_VARIANTS])
    df = (
        df.withColumn("repo", F.format_string("org%d/repo%d", F.col("repo_id") % 7, "repo_id"))
        .withColumn(
            "path",
            F.format_string(
                "src/pkg%d/mod_%d.%s",
                F.col("path_id") % 13,
                "path_id",
                F.element_at(
                    F.array(F.lit("py"), F.lit("java"), F.lit("go"), F.lit("rs"), F.lit("cpp")),
                    (F.col("path_id") % 5 + 1).cast("int"),
                ),
            ),
        )
        .withColumn(
            "lang",
            F.element_at(
                lang_arr,
                (
                    F.pmod(F.xxhash64("repo_id", "path_id", F.lit(seed)), F.lit(len(LANG_VARIANTS)))
                    + 1
                ).cast("int"),
            ),
        )
    )
    df = df.withColumn(
        "commit",
        F.sha2(
            F.concat_ws("@", "repo", "path", F.col("version").cast("string")), 256
        ).substr(1, 40),
    )
    return df.withColumn("content", _content_expr(seed))


def generate_change_events(
    spark: SparkSession,
    n_events: int = 100_000,
    n_repos: int = 50,
    paths_per_repo: int = 40,
    delete_fraction: float = 0.05,
    seed: int = 42,
    n_connectors: int = 3,
) -> DataFrame:
    """LSN-ordered change stream.

    Each event picks a (repo, path) key — repo via a skewed (zipf-ish)
    transform of a hash so a few repos are hot — and a monotonically
    increasing version per key; ``op`` is insert for version 0, else
    update, with a deterministic ``delete_fraction`` of deletes
    (content NULL on delete, FIXTURES.md §1.2).
    """
    df = spark.range(n_events).withColumnRenamed("id", "lsn")
    u = F.pmod(F.xxhash64("lsn", F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0
    # zipf-ish skew: repo_id = floor(n_repos * u^3) — cubes mass toward repo 0
    df = df.withColumn("repo_id", (F.lit(n_repos) * F.pow(u, 3)).cast("int"))
    df = df.withColumn(
        "path_id",
        F.pmod(F.xxhash64("lsn", F.lit(seed + 1)), F.lit(paths_per_repo)).cast("int"),
    )
    # version = number of prior events on the same key (deterministic, distributed)
    from pyspark.sql.window import Window

    w = Window.partitionBy("repo_id", "path_id").orderBy("lsn")
    df = df.withColumn("version", F.row_number().over(w) - 1)
    df = _event_columns(df, seed)
    del_u = F.pmod(F.xxhash64("lsn", F.lit(seed + 2)), F.lit(10_000)) / 10_000.0
    df = df.withColumn(
        "op",
        F.when(F.col("version") == 0, F.lit("insert"))
        .when(del_u < delete_fraction, F.lit("delete"))
        .otherwise(F.lit("update")),
    )
    df = (
        df.withColumn(
            "content", F.when(F.col("op") == "delete", F.lit(None)).otherwise(F.col("content"))
        )
        .withColumn(
            "source_connector",
            F.format_string(
                "conn_%s",
                F.element_at(
                    F.array(*[F.lit(chr(ord("a") + i)) for i in range(n_connectors)]),
                    (F.pmod(F.xxhash64("lsn", F.lit(seed + 3)), F.lit(n_connectors)) + 1).cast(
                        "int"
                    ),
                ),
            ),
        )
        .withColumn("ts", F.timestamp_seconds(F.lit(1700000000) + F.col("lsn")))
    )
    out = df.select(
        "lsn", "op", "repo", "path", "commit", "lang", "content", "source_connector", "ts"
    )
    # The version window above inherits spark.sql.shuffle.partitions
    # (2-3x cores) output partitions; consumers persist this stream and
    # re-scan it per micro-batch, so every epoch's map wave paid that
    # many near-empty tasks. Coalesce (no shuffle; only merges, never
    # splits) down to the core count — a no-op whenever the window
    # already has fewer partitions.
    par = spark.sparkContext.defaultParallelism
    return out.coalesce(par)
