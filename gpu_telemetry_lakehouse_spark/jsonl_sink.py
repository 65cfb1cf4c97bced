"""Custom Python DataSource SINK with a manifest commit protocol.

The write-side twin of `streaming/replay_source.py`: a JSON-lines sink whose
visibility contract is the one every real lake sink needs — task outputs
become readable ONLY when the driver commits a manifest listing them.

Exactly-once mechanics (same design as Spark's file-sink commit log and
Iceberg/Delta snapshots, scaled down):
- each task writes a uniquely-named part file (uuid — retries/speculative
  duplicates can never collide) and returns the name as its commit message;
- the driver, on `commit`, writes `_manifest-<n>.json` listing exactly the
  files of the SUCCESSFUL task set — a failed/aborted attempt's orphan file
  exists on disk but is invisible because no manifest names it;
- `read_committed` returns only manifest-listed rows, so readers observe an
  atomic all-or-nothing batch. Streaming commits one manifest per epoch; a
  replayed epoch (restart between task success and commit) overwrites the
  same manifest slot idempotently instead of doubling rows.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class _FileMsg(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


def _write_part(path: str, iterator) -> _FileMsg:
    name = f"part-{uuid.uuid4().hex}.jsonl"
    n = 0
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict(), default=str) + "\n")
            n += 1
    return _FileMsg(name, n)


def _commit_manifest(path: str, messages, epoch: int | str = 0) -> None:
    manifest = {
        "files": sorted(m.filename for m in messages),
        "rows": sum(m.n_rows for m in messages),
    }
    tmp = os.path.join(path, f"._manifest-{epoch}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, f"_manifest-{epoch}.json"))  # atomic


class _BatchWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _write_part(self.path, iterator)

    def commit(self, messages):
        _commit_manifest(self.path, messages, 0)

    def abort(self, messages):
        pass  # orphan files are invisible without a manifest entry


class _StreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _write_part(self.path, iterator)

    def commit(self, messages, batchId):
        _commit_manifest(self.path, messages, batchId)

    def abort(self, messages, batchId):
        pass


class JsonlManifestSink(DataSource):
    @classmethod
    def name(cls):
        return "jsonl_manifest"

    def writer(self, schema, overwrite):
        return _BatchWriter(self.options)

    def streamWriter(self, schema, overwrite):
        return _StreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(JsonlManifestSink)


def read_committed(path: str) -> list[dict]:
    """Rows visible under the commit protocol: manifest-listed files only."""
    rows: list[dict] = []
    for entry in sorted(os.listdir(path)):
        if entry.startswith("_manifest-") and entry.endswith(".json"):
            with open(os.path.join(path, entry)) as f:
                for name in json.load(f)["files"]:
                    with open(os.path.join(path, name)) as pf:
                        rows += [json.loads(line) for line in pf]
    return rows
