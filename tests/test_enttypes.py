"""Entity type inference: majority vote, deterministic tie-break,
rule-less predicates cast no votes, broadcast plan."""

from __future__ import annotations

from graphlab_spark.operators.enttypes import infer_entity_types

RULES = {
    "founded_by": ("ORG", "PERSON"),
    "works_at": ("PERSON", "ORG"),
    "acquired": ("ORG", "ORG"),
}


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, pred string, dst string")


def test_majority_vote_and_totals(spark):
    edges = _edges(
        spark,
        [
            ("acme", "founded_by", "ada"),   # acme: ORG, ada: PERSON
            ("acme", "acquired", "globex"),  # acme: ORG, globex: ORG
            ("ada", "works_at", "acme"),     # ada: PERSON, acme: ORG
        ],
    )
    got = {r.entity_id: r for r in infer_entity_types(spark, edges, RULES).collect()}
    assert got["acme"].entity_type == "ORG" and got["acme"].votes == 3
    assert got["acme"].total_votes == 3
    assert got["ada"].entity_type == "PERSON" and got["ada"].votes == 2
    assert got["globex"].entity_type == "ORG" and got["globex"].votes == 1


def test_tie_breaks_lexicographically(spark):
    # 'x' gets one ORG vote (subj of acquired) and one PERSON vote
    # (obj of founded_by): tie → lexicographically smallest type (ORG)
    edges = _edges(
        spark, [("x", "acquired", "y"), ("z", "founded_by", "x")]
    )
    got = {r.entity_id: r for r in infer_entity_types(spark, edges, RULES).collect()}
    assert got["x"].entity_type == "ORG"
    assert got["x"].votes == 1 and got["x"].total_votes == 2


def test_unruled_predicates_cast_no_votes(spark):
    edges = _edges(
        spark, [("a", "mystery_rel", "b"), ("a", "founded_by", "p")]
    )
    got = {r.entity_id: r for r in infer_entity_types(spark, edges, RULES).collect()}
    assert set(got) == {"a", "p"}  # 'b' only appears via the unruled edge
    assert got["a"].total_votes == 1


def test_rules_broadcast_no_cartesian(spark):
    edges = _edges(spark, [("a", "founded_by", "b")])
    plan = (
        infer_entity_types(spark, edges, RULES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # argmax is an aggregate, never a window


def test_matches_corpus_ground_truth(spark):
    """On the live pipeline's edges, inferred types must agree with the
    corpus's own entity_type assignments wherever the corpus knows the
    entity (the signatures ARE the generation rules, so voting can only
    disagree if the plumbing is wrong)."""
    from graphlab_spark.plans.training_queries import _kg_pipeline, _type_rules
    from graphlab_spark.sources.corpus import alias_df

    edges = _kg_pipeline(spark)["edges"].select("src", "pred", "dst")
    inferred = {
        r.entity_id: r.entity_type
        for r in infer_entity_types(spark, edges, _type_rules()).collect()
    }
    assert inferred
    truth = {
        r.canonical_id: r.entity_type
        for r in alias_df(spark).select("canonical_id", "entity_type").distinct().collect()
    }
    for ent, t in inferred.items():
        if ent in truth:
            assert t == truth[ent], ent
