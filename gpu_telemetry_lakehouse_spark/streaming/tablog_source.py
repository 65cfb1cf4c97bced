"""Streaming FROM a versioned table: the tablog change feed as a Spark 4
Python DataSource (the ``spark.readStream.format("delta")`` analog).

Offsets ARE log versions — the natural exactly-once cursor a transaction
log gives for free: a micro-batch covers the files added in
``(start_version, end_version]``, checkpoint recovery replays exactly the
missed versions, and no state beyond the two version numbers exists
anywhere. This closes the streaming loop: ``tablog.stream_writer`` streams
INTO a table (idempotent batch-id appends), this source streams OUT of it,
so tables compose into multi-hop streaming pipelines (bronze→silver→gold,
each hop independently restartable).

Semantics: APPEND-ONLY feed (like ``tablog.read_incremental``): each new
version contributes the files it ADDED. Rewriting operations
(compact/overwrite/merge) re-add their rows under new files — downstream
consumers that must not double-count should key on business ids (the same
caveat Delta documents for its CDF under full rewrites).

Scale: ``partitions()`` hands ONE InputPartition per new data file, so the
actual reads run on executors (pyarrow, one file each) — the driver only
folds log metadata. Column-mapping replay is applied per batch from the
mapping at the batch's end version.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from .. import tablog as T


class _FileSlice(InputPartition):
    def __init__(self, full_path: str | None, renames: list[list[str]], fields: list[str]):
        self.full_path = full_path
        self.renames = renames
        self.fields = fields


class _TablogStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        sv = options.get("start_version")
        # exclusive floor: None -> replay the whole table from version 0
        self._floor = int(sv) if sv is not None else -1
        self.fields = [f.name for f in schema.fields]

    def initialOffset(self):
        return {"version": self._floor}

    def latestOffset(self):
        tip = T.current_version(self.path)
        return {"version": tip if tip is not None else self._floor}

    def partitions(self, start: dict, end: dict):
        prev = (
            {a["file"] for a in T.snapshot_files(self.path, start["version"])}
            if start["version"] >= 0
            else set()
        )
        now = T.snapshot_files(self.path, end["version"])
        renames = T.snapshot_renames(self.path, end["version"])
        new = [a for a in now if a["file"] not in prev]
        if not new:  # a metadata-only version (rename, constraints): no rows
            return [_FileSlice(None, renames, self.fields)]
        return [
            _FileSlice(T._data_path(self.path, a), renames, self.fields)
            for a in new
        ]

    def read(self, part: _FileSlice):
        if part.full_path is None:
            return iter(())
        import pyarrow.parquet as pq

        tbl = pq.read_table(part.full_path)
        # column-mapping replay (pre-rename files carry old physical names)
        cols = {name: tbl.column(i) for i, name in enumerate(tbl.schema.names)}
        for old, new in part.renames:
            if old in cols and new not in cols:
                cols[new] = cols.pop(old)
        rows = zip(*(cols[f].to_pylist() for f in part.fields))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # versions are durable in the log; nothing to clean up


class TablogChangeFeedSource(DataSource):
    """``spark.readStream.format("tablog").option("path", tbl)``."""

    @classmethod
    def name(cls):
        return "tablog"

    def schema(self):
        path = self.options["path"]
        versions = T._list_versions(path)
        assert versions, f"tablog stream source: no commits at {path}"
        schema = None
        for v in reversed(versions):
            schema = T._read_entry(path, v).get("schema")
            if schema:
                break
        st = StructType.fromJson(json.loads(schema))
        # present LOGICAL names: apply the folded mapping to the schema
        mapping = dict(map(tuple, T.snapshot_renames(path)))
        for f in st.fields:
            f.name = mapping.get(f.name, f.name)
        return st

    def streamReader(self, schema):
        return _TablogStreamReader(schema, self.options)


def register(spark) -> None:
    import sys

    from pyspark import cloudpickle

    from .. import tablog
    from ..session import _ship_package

    # DataSource classes normally unpickle by module REFERENCE, so the
    # worker (including the driver-side planning runner, which ignores
    # runtime-added pyFiles) must import this module by name — which fails
    # under an external driver with a neutral cwd. Ship the package zip for
    # task workers AND register this module (plus tablog, its one package
    # dependency — itself pyspark+stdlib-only) for BY-VALUE cloudpickle so
    # the planning runner needs no import at all.
    _ship_package(spark)
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    cloudpickle.register_pickle_by_value(tablog)
    spark.dataSource.register(TablogChangeFeedSource)
