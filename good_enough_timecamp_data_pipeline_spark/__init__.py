"""good_enough_timecamp_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``timecamp-org/good-enough-timecamp-data-pipeline`` (an ELT pipeline that
extracts TimeCamp REST data, enriches it with hierarchy breadcrumbs and
lookup joins, lands csv/jsonl/parquet, and reports via recursive-CTE SQL),
re-expressed Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
broadcast joins for dimension lookups, an iterative/native recursive closure
for the hierarchy rollups, and Pandas-UDF escape hatches only where built-in
operators cannot express the semantics.

Layout
------
- ``session``    : SparkSession builder tuned for local[N] and cluster use
- ``cli``        : ``python -m ….cli`` — the reference CLI surface on Spark
- ``functions/`` : scalar Column builders (formatting, dates, ids, json)
- ``operators/`` : hierarchy closure, canonicalize, as-of join, dedup,
                   similarity, text analysis, multimodal plumbing
- ``sources/``   : REST client, ingest builders, schemas, writers
                   (csv/jsonl/parquet/JDBC/BigQuery), incremental patterns
- ``plans/``     : report queries + the driver-facing query catalog
- ``streaming/`` : watermarked windows + stateful ops over events
"""

__version__ = "0.1.0"
