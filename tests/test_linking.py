"""C6+C7 blocking + cosine linking (distributed path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphlab_spark.operators.linking import link_surfaces
from graphlab_spark.sources import corpus


def test_exact_and_fuzzy_linking(spark):
    aliases = corpus.alias_df(spark)
    surfaces = spark.createDataFrame(
        [
            ("Acme Systems",),       # exact (canonical)
            ("acme s.",),            # exact (abbrev alias)
            ("Acmme Systems",),      # typo → fuzzy
            ("Amssterdam",),         # single-word typo → fuzzy via char-grams
            ("Completely Unrelated Gibberish Zzz",),  # must stay unlinked
        ],
        "surface string",
    )
    links = {r.surface: r for r in link_surfaces(spark, surfaces, aliases).collect()}
    assert links["Acme Systems"].canonical_id == "org:acme-systems"
    assert links["Acme Systems"].method == "exact"
    assert links["acme s."].canonical_id == "org:acme-systems"
    assert links["Acmme Systems"].canonical_id == "org:acme-systems"
    assert links["Acmme Systems"].method == "fuzzy"
    assert links["Amssterdam"].canonical_id == "place:amsterdam"
    assert "Completely Unrelated Gibberish Zzz" not in links


def test_all_typo_variants_link_correctly(spark):
    """Every planted typo variant must fuzzy-link to its true entity."""
    gaz = corpus.gazetteer()
    rows = [(v[2][2],) for v in gaz.values() if len(v[2]) >= 3]
    surfaces = spark.createDataFrame(rows, "surface string")
    aliases = corpus.alias_df(spark)
    links = link_surfaces(spark, surfaces, aliases)
    truth = {v[2][2]: eid for eid, v in gaz.items() if len(v[2]) >= 3}
    got = {r.surface: r.canonical_id for r in links.collect()}
    wrong = {s: (got.get(s), truth[s]) for s in truth if got.get(s) != truth[s]}
    assert len(wrong) <= 0.02 * len(truth), f"mislinked: {dict(list(wrong.items())[:5])}"
