"""Differential-test helper replicating the driver's correctness gate:
run a registry query on Spark and its oracle SQL on DuckDB over the same
parquet, then compare row count + column names + order-insensitive values."""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import numpy as np
import pandas as pd

from gpu_telemetry_lakehouse_spark.catalog import TABLES
from gpu_telemetry_lakehouse_spark.queries import ORACLE, QUERIES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().isoformat()
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return tuple(_norm(x) for x in v)
    return v


def rows_of(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    out = [tuple(_norm(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    return sorted(out, key=repr)


def compare(spark, name: str, sf_dir: str) -> None:
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    con = duck_con(sf_dir)
    ddf = con.sql(ORACLE[name]).df()
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
    )
    assert len(sdf) == len(ddf), f"{name}: rowcount spark={len(sdf)} duck={len(ddf)}"
    srows, drows = rows_of(sdf), rows_of(ddf)
    mismatches = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches, first: {mismatches[:3]}"
