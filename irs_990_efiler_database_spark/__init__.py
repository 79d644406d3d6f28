"""PySpark-native analytics engine with the query and data-processing
capabilities of Nonprofit-Open-Data-Collective/irs-990-efiler-database.

Architecture (Spark-first, NOT a port of the reference's R engine):

- ``session``     — tuned SparkSession factory (AQE, Arrow, UTC).
- ``catalog``     — parquet table catalog over the test/star schema.
- ``sources``     — index (JSON), return XML (native Spark 4 XML source),
                    dead-letter capture.
- ``plans``       — the concordance planner: metadata rows -> Catalyst
                    Column expressions (replaces the reference's R
                    metaprogramming, build_efile_database_functions.R:5186-5291).
- ``extract``     — CORE / Part VII / Schedule J / Schedule N builders
                    (reference: scrapeXML :307-4149, buildPartVII :4161-4414,
                    buildSchedJ :4424-4915).
- ``operators``   — relational surface + training-data-pipeline operators
                    (dedup, similarity search, text analysis, multimodal).
- ``streaming``   — Structured Streaming over event feeds.
- ``jobs``        — orchestration (reference: buildDatabase :4938-5177).
"""

__version__ = "0.1.0"
