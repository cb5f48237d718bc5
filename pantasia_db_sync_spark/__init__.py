"""pantasia_db_sync_spark — a PySpark-native incremental ETL & analytics engine.

A brand-new engine with the query and data-processing capabilities of
``pantasia-io/pantasia-db-sync`` (reference at /root/reference, a Cardano
NFT-activity Postgres→Postgres micro-batch sync daemon), re-expressed as
idiomatic Spark DataFrame/SQL plans and extended with LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis),
all designed for 100 TB scale.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, UTC, Arrow).
- ``sources``    : table catalog over parquet fixtures; JDBC factory; snapshots.
- ``functions``  : scalar-function library (hex/JSON/text/vector/cardano-address).
- ``operators``  : engine operators Spark lacks as single calls (as-of join,
                   surrogate keys, argmax latest-state, dedup family, ANN).
- ``plans``      : the query library — every SURVEY.md §2 operator as a
                   registered (queries(), oracle_sql()) pair.
- ``pipeline``   : the incremental sync pipeline (the reference's product).
- ``streaming``  : Structured Streaming variant of the sync transform.
"""

__version__ = "0.1.0"
