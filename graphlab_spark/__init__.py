"""graphlab_spark — a PySpark-native knowledge-graph construction engine.

A brand-new implementation (NOT a port) with the query and data-processing
capabilities of the reference system khanhphamj/GraphLab, re-expressed
Spark-first: declarative DataFrame plans optimized by Catalyst, vectorized
pandas/Arrow UDFs for the extraction hot path, and explicit partitioning /
broadcast / salting for 100 TB-scale execution.

Layout
------
- ``session``      SparkSession builder tuned for the pipeline.
- ``sources``      corpus synthesis + table loaders.
- ``operators``    pipeline stages (extract, mentions, triples, blocking,
                   linking, canonicalize, materialize, manifest, dedup, ann).
- ``functions``    column-level helpers (slug, text stats, embeddings).
- ``plans``        end-to-end pipeline drivers + relational query surface.
"""

__version__ = "0.1.0"
