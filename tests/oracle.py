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
    """Canonicalize a cell the way the driver does — STRICTLY.

    The driver hashes typed value reprs (int 364 != float 364.0 — DuckDB
    HUGEINT sums come back as pandas float64 unless the oracle CASTs to
    BIGINT), and its pandas canonicalizer cannot sort/hash list cells at
    all. Mirror both behaviors so local green implies driver green:
    preserve the int/float distinction via repr, and raise on any nested
    (list/array/map/struct) cell so the query gets fixed to emit scalars.
    """
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.bool_,)):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().isoformat()
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, set, dict, np.ndarray)):
        raise TypeError(
            f"nested cell {type(v).__name__} would crash the driver's "
            "canonicalizer — emit a scalar (e.g. array_join(array_sort(..)))"
        )
    return v


def rows_of(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    out = [
        tuple(repr(_norm(v)) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(out)


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
