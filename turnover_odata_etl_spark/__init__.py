"""turnover_odata_etl_spark — a PySpark-native analytics engine.

A from-scratch PySpark re-expression of the query/data-processing
capabilities of the reference ETL pipeline (mkov516/turnover-odata-etl,
studied at /root/reference — behavior only, no code reuse), extended
with large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB scale.

Layout
------
- ``session``    : SparkSession factory tuned for the harness.
- ``tables``     : fixture-table loaders (parquet star schema).
- ``functions/`` : column-level functions (OData date codec, text stats,
                   vector math) — all built on ``pyspark.sql.functions``
                   so they stay JVM-side / whole-stage-codegen'd.
- ``operators/`` : composite relational operators (rename+coalesce,
                   as-of join, top-k per group, dedup family, ANN).
- ``sources/``   : the OData source connector (Spark 4 Python Data
                   Source API) + a mock OData server for tests.
- ``plans/``     : the declared query inventory — every operator gets a
                   (spark_fn, oracle_sql) pair in ``plans.registry``.
- ``streaming/`` : Structured Streaming window/dedup pipelines.
- ``etl``        : the reference-shaped pipeline as a library entry.
"""

__version__ = "0.1.0"
