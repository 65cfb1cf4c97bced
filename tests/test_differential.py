"""Every oracle-backed registry query must hash-match DuckDB (driver gate)."""

from __future__ import annotations

import pytest

from gpu_telemetry_lakehouse_spark.queries import ORACLE, QUERIES

from .oracle import compare


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_dir, name):
    compare(spark, name, sf_dir)


def test_all_queries_run(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert {f.name for f in df.schema.fields} >= {"dt", "avg_value", "p95_value"}
