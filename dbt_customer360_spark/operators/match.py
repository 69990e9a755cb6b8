"""Identity resolution — candidate generation + fuzzy verify.

The reference's core operator is a pairwise theta-join with a giant OR
of equality disjuncts (rule 1 exact email; rule 2 any of 9 phone
pairings; rule 3 address-line AND (city+state OR zip+country) —
identity_resolution/int_customer360__source_matches.sql:56-117),
followed by a fuzzy post-filter: exact email OR levenshtein name
similarity >= .95 (source_matches.sql:133-153).

A literal Spark translation (`a.join(b, orExpr)`) degenerates to
BroadcastNestedLoopJoin — O(n^2) and unusable at 10^10 rows. This
module decomposes the OR into K independent hash **equi-joins** (one
per match-key pairing), unions the candidate pairs, and deduplicates
— the "salted hash-join ... over match keys" the north_star mandates
(BASELINE.json:6). Each equi-join shuffles only on its own key, AQE
handles residual skew, and ``max_key_frequency`` caps pathological hot
keys (shared office phone etc.) before the join to bound the pair
explosion (SURVEY.md §7.3).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_customer360_spark.functions.normalize import levenshtein_similarity


@dataclass(frozen=True)
class MatchRule:
    """One equality disjunct: left.key_expr == right.key_expr.

    ``group``: rules sharing a group tag cross-match (any phone column
    against any phone column).  Defaults to the text before the rule
    name's second ``_`` — pass it explicitly whenever two rule names
    share that prefix but must NOT cross-match (e.g. two internal-id
    columns ``crm_account_id`` / ``crm_contact_id``)."""

    name: str
    left_key: str   # column on the left DataFrame
    right_key: str  # column on the right DataFrame
    group: str | None = None

    @property
    def group_tag(self) -> str:
        return self.group if self.group is not None else _rule_group(self.name)


def _cap_hot_keys(df: DataFrame, key: str, id_col: str, max_freq: int) -> DataFrame:
    """Drop rows whose join-key value occurs more than max_freq times —
    a frequent-key cutoff computed with a broadcastable count, keeping
    the candidate join linear in practice."""
    counts = df.groupBy(key).count().filter(F.col("count") > max_freq).select(key)
    return df.join(F.broadcast(counts), on=key, how="left_anti")


def candidate_pairs(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    rules: list[MatchRule],
    max_key_frequency: int = 1000,
) -> DataFrame:
    """ONE equi-join covering every rule; output (left_id, right_id, rule).

    Instead of K separate joins (K-fold plan growth and K shuffles),
    each side explodes its match keys into (id, tagged_key) rows —
    the tag is the rule's *group* (two rules with the same group can
    pair with each other, which is exactly the reference's "any phone
    column against any phone column" semantics) — and a single hash
    join on tagged_key produces all candidate pairs. NULL and
    'null_*' sentinel keys are dropped before the join (the sentinel
    convention of the prep models, :79-98), so they can never match.

    Hot keys (> max_key_frequency occurrences on a side) are removed
    before the join via one aggregation — the frequent-key cutoff that
    bounds the candidate-pair explosion (SURVEY.md §7.3).

    Aggregations run on an integer rule *index* (rule names sorted, so
    min(index) picks the same rule as min(name)) and the name is
    re-attached after the final dedup: min over a StringType forces
    Spark into Sort+SortAggregate at every level, while the int keeps
    every aggregate a HashAggregate and narrows the pair shuffle.
    """
    # sorted so min(idx) over the lattice == min(name); the name is
    # restored from this array after the last aggregation
    rule_names = sorted({r.name for r in rules})
    rule_idx = {n: i for i, n in enumerate(rule_names)}

    def keyed(df: DataFrame, id_col: str, side_keys) -> DataFrame:
        entries = [
            F.struct(
                F.lit(rule_idx[r.name]).alias("rule"),
                F.concat_ws("\x01", F.lit(r.group_tag), F.col(k)).alias("k"),
                F.col(k).alias("raw"),
            )
            for r, k in side_keys
        ]
        out = df.select(F.col(id_col).alias("__id"), F.explode(F.array(*entries)).alias("e"))
        out = out.select("__id", F.col("e.rule").alias("rule"), F.col("e.k").alias("__k"), F.col("e.raw").alias("__raw"))
        return out.filter(
            F.col("__raw").isNotNull() & ~F.col("__raw").startswith("null_")
        ).drop("__raw")

    # min(rule) (not dropDuplicates) so the surviving rule name is
    # deterministic when two rules in one group emit the same key —
    # the final per-pair min("rule") then operates on a stable input
    lk = keyed(left, left_id, [(r, r.left_key) for r in rules]).groupBy("__id", "__k").agg(
        F.min("rule").alias("rule")
    )
    rk = keyed(right, right_id, [(r, r.right_key) for r in rules]).groupBy("__id", "__k").agg(
        F.min("rule").alias("rule")
    )
    lk = _cap_hot_keys(lk, "__k", "__id", max_key_frequency)
    rk = _cap_hot_keys(rk, "__k", "__id", max_key_frequency)
    # The join fans out quadratically per key bucket while its INPUTS are
    # tiny, so AQE coalesces the probe side to a handful of partitions and
    # the whole expansion runs nearly single-task. Round-robin the probe
    # side to the cluster's parallelism first: output per probe row is
    # uniform (= build-side bucket size), so this is also skew-proof.
    par = left.sparkSession.sparkContext.defaultParallelism
    lk = lk.repartition(par)
    pairs = lk.join(
        rk.select(F.col("__id").alias("__rid"), F.col("__k")), on="__k"
    ).select(
        F.col("__id").alias(left_id), F.col("__rid").alias(right_id), F.col("rule")
    )
    # a pair may match several rules; keep the first rule name for lineage
    return pairs.groupBy(left_id, right_id).agg(
        F.min("rule").alias("__rule_idx")
    ).select(
        left_id,
        right_id,
        F.element_at(
            F.array(*[F.lit(n) for n in rule_names]), F.col("__rule_idx") + 1
        ).alias("rule"),
    )


def _rule_group(name: str) -> str:
    """Rules sharing a group tag cross-match (e.g. r2_phone_01 and
    r2_phone_10 both tag 'r2'): group = text before the second '_'."""
    parts = name.split("_")
    return parts[0] if parts else name


def fuzzy_name_verify(
    pairs: DataFrame,
    left_email: str,
    right_email: str,
    left_names: list[str],
    right_names: list[str],
    threshold: float = 0.95,
) -> DataFrame:
    """Reference's post-join filter (source_matches.sql:133-153): keep a
    pair if emails are exactly equal OR any (left name, right name)
    combination has levenshtein similarity >= threshold. NULL names
    coalesce to distinct literals 'aaa'/'bbb' so they can never pass.
    """
    cond = F.col(left_email) == F.col(right_email)
    for ln in left_names:
        for rn in right_names:
            a = F.coalesce(F.lower(F.col(ln)), F.lit("aaa"))
            b = F.coalesce(F.lower(F.col(rn)), F.lit("bbb"))
            cond = cond | (levenshtein_similarity(a, b) >= threshold)
    return pairs.filter(cond)
