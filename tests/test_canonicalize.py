"""C8+C9 canonicalization: LSH recall on planted dups, CC convergence,
known-entity protection."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphlab_spark.operators.canonicalize import (
    canonicalize_stage,
    connected_components,
    similarity_pairs,
)


def test_connected_components_chain(spark):
    # chain 1-2-3-4 plus isolated pair 9-10 → two components
    edges = spark.createDataFrame(
        [("n1", "n2"), ("n2", "n3"), ("n3", "n4"), ("n9", "n10")], "a string, b string"
    )
    comps = {r.item_id: r.component_id for r in connected_components(edges).collect()}
    assert comps["n1"] == comps["n2"] == comps["n3"] == comps["n4"] == "n1"
    assert comps["n9"] == comps["n10"] == "n10"  # lexical min of {n9, n10} is n10


def test_lsh_finds_planted_near_dups(spark):
    items = spark.createDataFrame(
        [
            ("e1", "acme systems"),
            ("e2", "acmme systems"),      # planted near-dup of e1
            ("e3", "borealis networks"),
            ("e4", "quantum mesh"),
        ],
        "item_id string, surface string",
    )
    pairs = {(r.a, r.b) for r in similarity_pairs(spark, items).collect()}
    assert ("e1", "e2") in pairs
    assert all({a, b} == {"e1", "e2"} for a, b in pairs), pairs


def test_canonicalize_never_merges_known_entities(spark):
    ents = spark.createDataFrame(
        [
            ("org:acme-systems", "acme systems", True),
            ("org:acme-s", "acme system", True),     # extremely similar but KNOWN
            ("unk:acmme-systems", "acmme systems", False),
        ],
        "entity_id string, surface string, is_known boolean",
    )
    m = {r.entity_id: r.canonical_id for r in canonicalize_stage(spark, ents).collect()}
    assert m["org:acme-systems"] == "org:acme-systems"
    assert m["org:acme-s"] == "org:acme-s"  # known-known never merged
    # the unk merges into the known entity it is near-duplicate of
    assert m["unk:acmme-systems"] == "org:acme-systems"


def test_canonicalize_unknown_only_component(spark):
    ents = spark.createDataFrame(
        [
            ("unk:zorblat-dynamics", "zorblat dynamics", False),
            ("unk:zorblat-dynamicss", "zorblat dynamicss", False),
            ("unk:solo-entity", "completely different", False),
        ],
        "entity_id string, surface string, is_known boolean",
    )
    m = {r.entity_id: r.canonical_id for r in canonicalize_stage(spark, ents).collect()}
    assert m["unk:zorblat-dynamics"] == "unk:zorblat-dynamics"
    assert m["unk:zorblat-dynamicss"] == "unk:zorblat-dynamics"
    assert m["unk:solo-entity"] == "unk:solo-entity"
