"""A20-A23 KG-schema registry: validate / diff / clone / activate."""

from __future__ import annotations

import pytest

from graphlab_spark.plans.kg_schema import (
    SchemaRegistry,
    compare_schemas,
    validate_schema_definition,
)

V1 = {
    "nodes": {
        "ORG": {"properties": {"name": "string"}},
        "PERSON": {"properties": {"name": "string"}},
    },
    "relationships": {"founded_by": {"properties": {}}},
}
V2 = {
    "nodes": {"ORG": {"properties": {}}, "PLACE": {"properties": {}}},
    "relationships": {"founded_by": {"properties": {}}, "located_in": {"properties": {}}},
}


def test_validate_ok():
    rep = validate_schema_definition(V1)
    assert rep["valid"]
    assert rep["summary"] == {"node_types": 2, "relationship_types": 1}


def test_validate_missing_section_and_shape():
    rep = validate_schema_definition({"nodes": {}})
    assert not rep["valid"]
    assert any("relationships" in e for e in rep["errors"])
    rep2 = validate_schema_definition({"nodes": {"ORG": "not-a-dict"}, "relationships": {}})
    assert not rep2["valid"]


def test_validate_warns_on_missing_properties():
    rep = validate_schema_definition(
        {"nodes": {"ORG": {}}, "relationships": {}}
    )
    assert rep["valid"]
    assert any("properties" in w for w in rep["warnings"])


def test_diff_set_difference():
    d = compare_schemas(V2, V1)
    assert d["nodes"]["added"] == ["PLACE"]
    assert d["nodes"]["removed"] == ["PERSON"]
    assert d["relationships"]["added"] == ["located_in"]


def test_clone_next_version_never_active():
    reg = SchemaRegistry()
    s1 = reg.create(V1)
    reg.activate(s1.version)
    c = reg.clone(s1.version)
    assert c.version == s1.version + 1
    assert not c.is_active
    assert reg.active().version == s1.version


def test_activate_exactly_one_and_migration_guard():
    reg = SchemaRegistry()
    s1, s2 = reg.create(V1), reg.create(V2)
    reg.activate(s1.version)
    reg.activate(s2.version)
    assert [v.version for v in reg.versions.values() if v.is_active] == [s2.version]
    reg.running_migrations = 1
    with pytest.raises(RuntimeError):
        reg.activate(s1.version)


def test_create_rejects_invalid():
    with pytest.raises(ValueError):
        SchemaRegistry().create({"nodes": {}})
