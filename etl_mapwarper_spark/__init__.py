"""etl_mapwarper_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
nypl-spacetime/etl-mapwarper (reference: /root/reference/mapwarper.js),
extended with the general relational surface and LLM-training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
columns) required for large-scale (100 TB design point) analytics.

Layout
------
- ``session``    : SparkSession factory (AQE, Arrow, UTC, tuned shuffle).
- ``sources``    : parquet/NDJSON readers with explicit schemas; paginated
                   REST source mirroring the reference's scan contract.
- ``functions``  : scalar/column function library (year coalesce, bbox
                   parsing, geodesic area, text stats, vector math).
- ``operators``  : relational queries, mapwarper transforms + validation,
                   dedup, similarity, multimodal enrichment.
- ``plans``      : pipeline-step DAG with parquet checkpointing (the
                   reference's ``module.exports.steps`` contract,
                   mapwarper.js:441-444).
- ``streaming``  : Structured Streaming operators over the events table.
"""

__version__ = "0.1.0"
