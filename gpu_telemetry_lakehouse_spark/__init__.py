"""PySpark-native analytics engine with the capabilities of the
``gpu-telemetry-lakehouse`` reference (medallion GPU-telemetry pipeline),
re-expressed Spark-first and extended with the operators a large-scale
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal plumbing, streaming).

Layout
------
- ``session``     : tuned SparkSession factory
- ``schemas``     : explicit StructTypes for reference sources + testdata
- ``catalog``     : testdata/table loading + view registration
- ``ingest``      : CSV -> parquet bronze ingestion (reference parity)
- ``models``      : medallion model registry (bronze/silver/gold)
- ``checks``      : dbt-style constraint assertions
- ``flow``        : full_refresh pipeline driver
- ``operators/``  : joins, windows, dedup, similarity, text, multimodal
- ``queries/``    : the (spark, sf_dir) -> DataFrame registry + DuckDB oracles
- ``streaming/``  : Structured Streaming pipelines sharing batch transforms
- ``ml/``         : numpy IsolationForest + anomaly scoring (driver + UDF path)
- ``plans/``      : physical-plan inspection helpers (pushdown/broadcast asserts)
"""

__version__ = "0.1.0"
