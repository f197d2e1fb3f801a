"""mimirsbrunn_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the *semantics* of Qwant/mimirsbrunn
(geocoding: admin attachment via point-in-polygon, reverse geocoding as
kNN, enrichment, indexing lifecycle) as idiomatic PySpark: DataFrame/SQL
plans optimized by Catalyst, with vectorized pandas/Arrow UDFs only where
built-in operators cannot express the semantics (exact polygon refinement,
zone-type dedup with hierarchy memoization).

Reference citations in docstrings point into the read-only snapshot at
/root/reference (Qwant/mimirsbrunn @ 2025-02-24). No code is copied from
the reference; it is a Rust/Elasticsearch system, this is Spark.
"""

__version__ = "0.1.0"
