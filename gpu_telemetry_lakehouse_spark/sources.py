"""Multi-format source/sink layer: parquet, ORC, JSON-lines, CSV, XML.

The lake's at-rest format is parquet (columnar, splittable, predicate/row-group
pushdown — see `ingest.py` for the CSV->parquet bronze path, reference
pipelines/ingest_bronze.py:16). This module adds the interchange formats a
deployment meets at its edges:

- **ORC**: the other columnar lake format; same pushdown properties as
  parquet, relevant when an upstream Hive/Trino estate already writes it.
- **JSON lines**: the API/log-delivery format. Row-oriented and ~5-10x the
  scan cost of parquet, so it belongs at ingest boundaries only — land it,
  convert to parquet, query the parquet. Splittable per line, so a 100 TB
  JSON drop still parallelizes.
- **CSV**: the reference's own source format (handled by `ingest.py`).
- **XML**: the B2B/enterprise interchange format (Spark 4 ships the reader
  natively — no external package). Same edge-only role as JSON lines: land,
  convert to parquet, query the parquet. Values are entity-escaped by the
  writer, so markup-hostile payloads (quotes, angle brackets, ampersands in
  the ``props`` JSON strings) survive the trip.

Round-trip fidelity notes baked into the options below:
- JSON has no timestamp type; we pin an explicit microsecond ISO format on
  write AND read (the default millisecond format silently truncates, which
  would break event-time joins downstream).
- JSON has no binary type; base64 happens at a higher layer
  (`operators/multimodal.py` keeps payloads in parquet/binary for this
  reason).
- Doubles survive: Spark writes shortest-round-trip decimal strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TS_US_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write ``df`` to ``path`` in ``fmt`` (overwrite). One writer per task:
    output file count == partition count, so callers control file sizing via
    partitioning (see operators/scale.py for the layout helpers)."""
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "json":
        w = w.option("timestampFormat", TS_US_FORMAT)
    if fmt == "csv":
        w = w.option("header", True).option("timestampFormat", TS_US_FORMAT)
    if fmt == "xml":
        w = (
            w.option("rootTag", "rows")
            .option("rowTag", "row")
            .option("timestampFormat", TS_US_FORMAT)
        )
    w.save(path)


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: merge the footers of every file so a table
    whose newer files carry added columns reads as one widened schema, with
    NULLs where old files predate a column. Footer-merge is a per-file
    metadata scan, so it costs a listing, not a data read — but it IS O(files);
    a production table pins the contract schema in a catalog and uses this
    only when the contract changes."""
    return spark.read.option("mergeSchema", True).parquet(path)


def read_table(
    spark: SparkSession, path: str, schema: T.StructType, fmt: str = "parquet"
) -> DataFrame:
    """Read ``path`` as ``fmt`` with an explicit schema (schema-on-read is a
    correctness hazard for row formats: inference samples the data and can
    flip types between drops; the declared StructType is the contract)."""
    r = spark.read.format(fmt).schema(schema)
    if fmt == "json":
        r = r.option("timestampFormat", TS_US_FORMAT)
    if fmt == "csv":
        r = r.option("header", True).option("timestampFormat", TS_US_FORMAT)
    if fmt == "xml":
        r = r.option("rowTag", "row").option("timestampFormat", TS_US_FORMAT)
    return r.load(path)
