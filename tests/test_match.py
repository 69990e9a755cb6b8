"""Identity-resolution fixtures (FIXTURES.md §1.3; reference rules 1-3,
source_matches.sql:56-117, fuzzy threshold :151)."""

from pyspark.sql import functions as F

from dbt_customer360_spark.operators.components import connected_components
from dbt_customer360_spark.operators.match import (
    MatchRule,
    candidate_pairs,
    fuzzy_name_verify,
)


def test_rules_and_null_sentinels(spark):
    left = spark.createDataFrame(
        [
            (1, "x@y.com", "555", "n1"),
            (2, None, None, "n2"),
            (3, "null_marketo", "777", "n3"),
        ],
        "lid long, email string, phone string, name string",
    )
    right = spark.createDataFrame(
        [
            (10, "x@y.com", "000", "m1"),
            (11, "null_stripe", "777", "m2"),
            (12, None, None, "m3"),
        ],
        "rid long, email string, phone string, name string",
    )
    rules = [MatchRule("r1_email", "email", "email"), MatchRule("r2_phone", "phone", "phone")]
    pairs = {(r.lid, r.rid): r.rule for r in candidate_pairs(left, right, "lid", "rid", rules).collect()}
    # NULLs and 'null_*' sentinels never join; only real equalities do
    assert pairs == {(1, 10): "r1_email", (3, 11): "r2_phone"}


def test_fuzzy_threshold_boundaries(spark):
    # 19-char names, 1 edit -> sim = 1 - 1/19 ≈ 0.947 (< .95 -> dropped)
    # identical -> 1.0 (kept); 20-char 1 edit -> 0.95 exactly (kept)
    pairs = spark.createDataFrame(
        [
            ("a@x.com", "b@x.com", "abcdefghijklmnopqrs", "Xbcdefghijklmnopqrs"),   # .947
            ("a@x.com", "b@x.com", "abcdefghijklmnopqrst", "Xbcdefghijklmnopqrst"), # .95
            ("same@x.com", "same@x.com", None, None),                                # email exact
            ("a@x.com", "b@x.com", None, None),                                      # nothing
        ],
        "l_email string, r_email string, l_name string, r_name string",
    )
    kept = fuzzy_name_verify(pairs, "l_email", "r_email", ["l_name"], ["r_name"], 0.95)
    got = [(r.l_email, r.l_name) for r in kept.collect()]
    assert ("a@x.com", "abcdefghijklmnopqrst") in got
    assert ("same@x.com", None) in got
    assert ("a@x.com", "abcdefghijklmnopqrs") not in got
    assert len(got) == 2


def test_hot_key_cap(spark):
    left = spark.createDataFrame([(i, "hot") for i in range(50)], "lid long, k string")
    right = spark.createDataFrame([(i, "hot") for i in range(50)], "rid long, k string")
    pairs = candidate_pairs(left, right, "lid", "rid", [MatchRule("r", "k", "k")], max_key_frequency=10)
    assert pairs.count() == 0  # hot key dropped entirely, no pair explosion


def test_transitivity_via_components(spark):
    """A-B (email), B-C (phone), no direct A-C edge: the reference's
    full-outer merge would keep A and C apart; connected components
    unifies all three (intentional upgrade, SURVEY.md §7.3)."""
    edges = spark.createDataFrame([("A", "B"), ("B", "C"), ("X", "Y")], "src string, dst string")
    comp = {r.node: r.component for r in connected_components(edges).collect()}
    assert comp["A"] == comp["B"] == comp["C"]
    assert comp["X"] == comp["Y"] != comp["A"]


def test_components_long_chain_and_star(spark):
    chain = spark.createDataFrame([(i, i + 1) for i in range(30)], "src long, dst long")
    comp = {r.node: r.component for r in connected_components(chain).collect()}
    assert set(comp.values()) == {0}
    star = spark.createDataFrame([(0, i) for i in range(1, 20)], "src long, dst long")
    comp = {r.node: r.component for r in connected_components(star).collect()}
    assert set(comp.values()) == {0}


def test_components_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir knob (round-2 verdict Next #5): the per-round
    lineage cut goes through reliable-storage df.checkpoint() — same
    labels as the localCheckpoint path, and checkpoint RDD files
    actually land under the given dir."""
    ckdir = str(tmp_path / "cc_ck")
    chain = spark.createDataFrame([(i, i + 1) for i in range(12)], "src long, dst long")
    comp = {
        r.node: r.component
        for r in connected_components(chain, checkpoint_dir=ckdir).collect()
    }
    assert set(comp.values()) == {0} and len(comp) == 13
    import os

    found = any(files for _, _, files in os.walk(ckdir))
    assert found, "no checkpoint files written under checkpoint_dir"
    # the dir must be set ONCE: setCheckpointDir stores <dir>/<uuid>, so
    # a broken equality guard re-sets it per lineage cut and mints a
    # fresh uuid subdir per round (unbounded checkpoint growth at scale)
    uuid_dirs = [d for d in os.listdir(ckdir) if os.path.isdir(os.path.join(ckdir, d))]
    assert len(uuid_dirs) == 1, uuid_dirs


def test_prefix_group_tags_do_not_collide(spark):
    """Tagged-key join hardening: group tags where one is a prefix of
    the other ('g' / 'g2') plus compensating value bytes ('2x' / 'x')
    concatenate identically WITHOUT a delimiter — the \\x01 separator
    keeps them distinct, so no cross-group pair forms."""
    left = spark.createDataFrame([(1, "2x", None)], "lid long, a string, b string")
    right = spark.createDataFrame([(10, None, "x")], "rid long, a string, b string")
    rules = [
        MatchRule("ra", "a", "a", group="g"),
        MatchRule("rb", "b", "b", group="g2"),
    ]
    assert candidate_pairs(left, right, "lid", "rid", rules).count() == 0
    # sanity: same-group equal values DO pair
    right2 = spark.createDataFrame([(10, "2x", None)], "rid long, a string, b string")
    assert candidate_pairs(left, right2, "lid", "rid", rules).count() == 1


def test_components_log_rounds_on_long_chain(spark, monkeypatch):
    """Pointer halving makes convergence O(log diameter): a 200-edge
    chain must settle in well under the ~200 neighbor-min-only rounds
    (round-3 change; each round = neighbor-min + label-of-label jump)."""
    import dbt_customer360_spark.operators.components as C

    names = []
    orig = C.Observation

    class Counting(orig):
        def __init__(self, name):
            names.append(name)
            super().__init__(name)

    monkeypatch.setattr(C, "Observation", Counting)
    chain = spark.createDataFrame([(i, i + 1) for i in range(200)], "src long, dst long")
    comp = {r.node: r.component for r in C.connected_components(chain, max_iter=50).collect()}
    assert set(comp.values()) == {0} and len(comp) == 201
    assert len(names) <= 12, names
