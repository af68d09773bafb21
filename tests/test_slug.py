"""A24 slug normalization (reference: backend/app/utils/slug.py:8-26)."""

from graphlab_spark.functions.slug import slugify


def test_basic():
    assert slugify("Acme Systems") == "acme-systems"


def test_accent_folding():
    assert slugify("Café Münster") == "cafe-munster"


def test_collapse_and_strip():
    assert slugify("  --Weird?? Name!!  ") == "weird-name"
    assert slugify("a///b") == "a-b"


def test_keeps_underscore_digits():
    assert slugify("v2_schema-final") == "v2_schema-final"


def test_none_and_empty():
    assert slugify(None) is None
    assert slugify("") == ""
    assert slugify("???") == ""
