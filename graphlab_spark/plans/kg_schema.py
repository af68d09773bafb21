"""KG-schema registry: validate / diff / clone / activate (A20-A23).

Reference parity (behavior matched, code fresh):
- validation — required top-level ``nodes`` and ``relationships`` sections,
  each a map name→definition dict; warn when a definition lacks
  ``properties``; summary counts (``backend/app/services/kg_schema.py:558-608``).
- diff — set-difference of node/relationship names between two versions
  (``kg_schema.py:610-630``).
- clone — copy to next version, never active (``kg_schema.py:392-427``);
  next version = max+1 (``kg_schema.py:37-40,408-411``).
- activate — exactly-one-active swap, refused while migrate jobs run
  (``kg_schema.py:259-279``).

Schemas are small metadata (dicts), so this is driver-side Python; the
*enforcement* of a schema against the big nodes/edges tables is
``enforce_schema`` — a DataFrame filter that drops rows whose types are
not declared, which IS distributed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REQUIRED_SECTIONS = ("nodes", "relationships")


def validate_schema_definition(defn: Any) -> dict:
    """→ {valid, errors, warnings, summary} (shape rules per kg_schema.py:558-608)."""
    errors: list[str] = []
    warnings: list[str] = []
    if not isinstance(defn, dict):
        return {
            "valid": False,
            "errors": ["schema definition must be a dict"],
            "warnings": [],
            "summary": {},
        }
    for section in REQUIRED_SECTIONS:
        if section not in defn:
            errors.append(f"missing required section: {section}")
        elif not isinstance(defn[section], dict):
            errors.append(f"section '{section}' must be a mapping of name -> definition")
        else:
            for name, spec in defn[section].items():
                if not isinstance(spec, dict):
                    errors.append(f"{section}.{name} must be a dict")
                elif "properties" not in spec:
                    warnings.append(f"{section}.{name} has no 'properties'")
    summary = {
        "node_types": len(defn.get("nodes") or {}) if isinstance(defn.get("nodes"), dict) else 0,
        "relationship_types": len(defn.get("relationships") or {})
        if isinstance(defn.get("relationships"), dict)
        else 0,
    }
    return {"valid": not errors, "errors": errors, "warnings": warnings, "summary": summary}


def compare_schemas(s1: dict, s2: dict) -> dict:
    """Set-difference diff over node/relationship names (kg_schema.py:610-630)."""
    out: dict[str, dict[str, list[str]]] = {}
    for section in REQUIRED_SECTIONS:
        k1 = set((s1.get(section) or {}).keys())
        k2 = set((s2.get(section) or {}).keys())
        out[section] = {
            "added": sorted(k1 - k2),
            "removed": sorted(k2 - k1),
            "common": sorted(k1 & k2),
        }
    return out


@dataclass
class SchemaVersion:
    version: int
    definition: dict
    is_active: bool = False


@dataclass
class SchemaRegistry:
    """Versioned schema store with exactly-one-active semantics."""

    versions: dict[int, SchemaVersion] = field(default_factory=dict)
    running_migrations: int = 0

    def next_version(self) -> int:
        return (max(self.versions) if self.versions else 0) + 1

    def create(self, definition: dict) -> SchemaVersion:
        report = validate_schema_definition(definition)
        if not report["valid"]:
            raise ValueError(f"invalid schema: {report['errors']}")
        sv = SchemaVersion(self.next_version(), definition, is_active=False)
        self.versions[sv.version] = sv
        return sv

    def clone(self, version: int) -> SchemaVersion:
        """Copy to next version; clone is never active (kg_schema.py:392-427)."""
        src = self.versions[version]
        sv = SchemaVersion(self.next_version(), dict(src.definition), is_active=False)
        self.versions[sv.version] = sv
        return sv

    def activate(self, version: int) -> None:
        """Deactivate-all → activate-one; guarded by no running migrations
        (kg_schema.py:259-279)."""
        if self.running_migrations > 0:
            raise RuntimeError("cannot activate schema while migration jobs are running")
        if version not in self.versions:
            raise KeyError(version)
        for sv in self.versions.values():
            sv.is_active = False
        self.versions[version].is_active = True

    def active(self) -> SchemaVersion | None:
        for sv in self.versions.values():
            if sv.is_active:
                return sv
        return None


def enforce_schema(nodes: DataFrame, edges: DataFrame, defn: dict) -> tuple[DataFrame, DataFrame]:
    """Distributed enforcement: keep only declared node/relationship types.

    Type lists are tiny literals → Catalyst compiles to an In-filter that
    pushes down to the scan.
    """
    node_types = sorted((defn.get("nodes") or {}).keys())
    rel_types = sorted((defn.get("relationships") or {}).keys())
    n = nodes.filter(F.col("entity_type").isin(node_types))
    e = edges.filter(F.col("pred").isin(rel_types))
    return n, e
