"""Read-only Delta Lake table reader: snapshot reconstruction from the
public ``_delta_log`` protocol, no Delta runtime required.

The complement to ``tablog.export_manifest`` (which lets foreign engines
consume OUR snapshots): this consumes the industry format, so a migration
can point the engine at an existing Delta estate and query it in place.
Implements the documented transaction-log protocol (delta.io PROTOCOL.md):

- version files ``_delta_log/<20-digit>.json`` — newline-delimited JSON
  actions; ``add`` and ``remove`` replay into the live file set, last
  ``metaData`` wins the schema, ``protocol`` gates reader compatibility;
- parquet checkpoints ``<v>.checkpoint.parquet`` + ``_last_checkpoint`` —
  a snapshot of the action state at version v, so reconstruction reads
  one parquet + the JSON tail, not the whole history;
- partition columns are NOT stored in the data files — they come back from
  each add's ``partitionValues``, deserialized per the protocol's string
  serialization against the table schema.

Reader gating is strict by design: ``minReaderVersion`` <= 2 only, and any
``readerFeatures`` beyond what replay implements (deletion vectors, column
mapping, v2 checkpoints) raises ``UnsupportedDeltaFeature`` rather than
returning silently wrong rows — the same fail-loud contract tablog uses
for pending DVs.

Scale shape: log replay is metadata work (KBs per version, one checkpoint
parquet); the data read is an ordinary multi-path parquet scan, so column
pruning and predicate pushdown apply exactly as on a native table.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_VERSION_RE = re.compile(r"^(\d{20})\.json$")
_CHECKPOINT_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")

# Replay implements: plain add/remove actions, JSON schemaString metadata,
# partitionValues reconstitution. Everything else must be absent or the
# table is unreadable by this implementation.
_SUPPORTED_READER_FEATURES = {"timestampNtz"}


class UnsupportedDeltaFeature(RuntimeError):
    """The table requires a reader capability replay does not implement."""


def _log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def delta_versions(path: str) -> list[int]:
    """All commit versions present in the log, ascending (empty if no log)."""
    if not os.path.isdir(_log_dir(path)):
        return []
    out = []
    for f in os.listdir(_log_dir(path)):
        m = _VERSION_RE.match(f)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _checkpoint_before(path: str, version: int) -> int | None:
    """Newest simple-parquet checkpoint at or before ``version``.

    ``_last_checkpoint`` is an optimization hint only (it can lag or point
    past a time-travel target); listing is authoritative, exactly as the
    protocol prescribes for readers."""
    best = None
    for f in os.listdir(_log_dir(path)):
        m = _CHECKPOINT_RE.match(f)
        if m and int(m.group(1)) <= version:
            best = int(m.group(1)) if best is None else max(best, int(m.group(1)))
    return best


def _check_protocol(action: dict) -> None:
    p = action["protocol"]
    if p.get("minReaderVersion", 1) > 2 or set(
        p.get("readerFeatures") or []
    ) - _SUPPORTED_READER_FEATURES:
        raise UnsupportedDeltaFeature(
            f"requires reader version {p.get('minReaderVersion')} with "
            f"features {p.get('readerFeatures')}; replay implements plain "
            "add/remove + partitionValues only"
        )


def _fold(state: dict, action: dict) -> None:
    """Apply one log action to the replay state (protocol reconciliation:
    an add of a path supersedes prior adds/removes of that path)."""
    if "protocol" in action:
        _check_protocol(action)
    if "metaData" in action:
        state["meta"] = action["metaData"]
    if "add" in action:
        a = action["add"]
        if a.get("deletionVector"):
            raise UnsupportedDeltaFeature("add carries a deletion vector")
        state["files"][a["path"]] = a
    if "remove" in action:
        state["files"].pop(action["remove"]["path"], None)


def _replay(spark: SparkSession, path: str, version: int) -> dict:
    state: dict = {"files": {}, "meta": None}
    start = 0
    cp = _checkpoint_before(path, version)
    if cp is not None:
        cp_file = os.path.join(_log_dir(path), f"{cp:020d}.checkpoint.parquet")
        # The checkpoint is itself parquet of action structs; NULL columns
        # mark absent action kinds. Read through Spark so a many-part
        # checkpoint of a huge table never lands on the driver raw.
        for row in spark.read.parquet(cp_file).toJSON().collect():
            _fold(state, json.loads(row))
        start = cp + 1
    for v in range(start, version + 1):
        entry = os.path.join(_log_dir(path), f"{v:020d}.json")
        if not os.path.exists(entry):
            continue
        with open(entry) as fh:
            for line in fh:
                if line.strip():
                    _fold(state, json.loads(line))
    if state["meta"] is None:
        raise ValueError(f"no metaData action in log up to version {version}")
    return state


def _partition_expr(value: str | None, field: T.StructField) -> F.Column:
    """Deserialize one partitionValues entry per the protocol's string
    serialization (empty string and null both mean NULL for non-strings)."""
    if value is None:
        return F.lit(None).cast(field.dataType)
    return F.lit(value).cast(field.dataType)


def read_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table snapshot (time travel via ``version``) as a
    DataFrame, reconstructing partition columns from the log."""
    versions = delta_versions(path)
    if not versions:
        raise ValueError(f"no _delta_log versions under {path}")
    target = versions[-1] if version is None else version
    state = _replay(spark, path, target)
    meta = state["meta"]
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = meta.get("partitionColumns") or []
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    data_schema = T.StructType(data_fields)

    if not state["files"]:
        return spark.createDataFrame([], schema)

    # Group adds by their partitionValues so each group is ONE multi-path
    # parquet scan with literal partition columns appended — pushdown and
    # pruning behave exactly as on a directly-read parquet dataset.
    from urllib.parse import unquote

    groups: dict[tuple, list[str]] = {}
    for a in state["files"].values():
        key = tuple((a.get("partitionValues") or {}).get(c) for c in part_cols)
        # PROTOCOL.md: add.path is URL-encoded relative to the table root
        groups.setdefault(key, []).append(os.path.join(path, unquote(a["path"])))
    out = None
    by_name = {f.name: f for f in schema.fields}
    # repr-keyed sort: partition values may be None (not orderable vs str)
    for key, paths in sorted(groups.items(), key=lambda kv: repr(kv[0])):
        df = spark.read.schema(data_schema).parquet(*sorted(paths))
        for c, v in zip(part_cols, key):
            df = df.withColumn(c, _partition_expr(v, by_name[c]))
        df = df.select(*[f.name for f in schema.fields])
        out = df if out is None else out.unionAll(df)
    return out


def delta_history(path: str) -> list[dict]:
    """commitInfo per version (audit trail), oldest first; versions whose
    commit carries no commitInfo still appear with just the version."""
    out = []
    for v in delta_versions(path):
        info = {"version": v}
        with open(os.path.join(_log_dir(path), f"{v:020d}.json")) as fh:
            for line in fh:
                if line.strip():
                    action = json.loads(line)
                    if "commitInfo" in action:
                        info.update(action["commitInfo"])
        out.append(info)
    return out


# --- write side: export snapshots AS a Delta table ----------------------------
# The outbound half of the interop story (export_manifest covers plain-
# parquet readers; this covers Delta-native engines): materialize a
# DataFrame as a minimal, protocol-conformant Delta table — reader
# version 1, plain add actions, partition columns carried in
# partitionValues and NOT written into the data files, exactly as the
# protocol requires. Appends create new versions; read_delta (and any
# Delta runtime) sees every snapshot.


def _spark_schema_string(schema: T.StructType) -> str:
    return json.dumps(json.loads(schema.json()))


def _write_version(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_by: list[str],
    version: int,
    schema: T.StructType,
    operation: str,
) -> int:
    """ONE partitionBy write (single scan, parallel tasks; hive layout is
    exactly Delta's physical layout — partition values in dir names, not in
    the files), then the written tree is walked into add actions.

    Race safety: data stages under a per-ATTEMPT unique directory, so a
    writer that loses the O_EXCL log commit below cannot have clobbered the
    winner's already-referenced files (tablog stages under unique names for
    the same reason). Logged ``add.path`` entries are URL-encoded as
    PROTOCOL.md requires (hive escapes like ``%3D`` would otherwise be
    mis-decoded by conformant readers); read_delta decodes symmetrically."""
    import uuid
    from urllib.parse import quote, unquote

    out_root = os.path.join(path, f"v{version:05d}-{uuid.uuid4().hex[:8]}")
    if partition_by:
        df.write.partitionBy(*partition_by).mode("overwrite").parquet(out_root)
    else:
        df.write.mode("overwrite").parquet(out_root)
    adds = []
    for dirpath, _dirs, files in sorted(os.walk(out_root)):
        rel_dir = os.path.relpath(dirpath, path)
        pvals = {}
        for seg in rel_dir.split(os.sep):
            if "=" in seg:
                c, v = seg.split("=", 1)
                pvals[c] = (
                    None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
                )
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            adds.append(
                {
                    "add": {
                        "path": quote(
                            f"{rel_dir}/{f}".replace(os.sep, "/"), safe="/"
                        ),
                        "partitionValues": {
                            c: pvals.get(c) for c in partition_by
                        },
                        "size": os.path.getsize(os.path.join(dirpath, f)),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
    actions = []
    if version == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": "00000000-0000-4000-8000-%012d" % 0,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": _spark_schema_string(schema),
                    "partitionColumns": partition_by,
                    "configuration": {},
                }
            }
        )
    actions += adds
    actions.append({"commitInfo": {"operation": operation}})
    log = _log_dir(path)
    os.makedirs(log, exist_ok=True)
    entry = os.path.join(log, f"{version:020d}.json")
    # EXCL create: two racing writers of the same version -> one wins,
    # the same commit discipline tablog uses.
    fd = os.open(entry, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return version


def write_delta(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> int:
    """Create a Delta table at ``path`` from ``df`` (version 0). Partition
    columns land in the log's partitionValues, not in the data files."""
    partition_by = partition_by or []
    os.makedirs(path, exist_ok=True)
    if delta_versions(path):
        raise ValueError(f"{path} already has a _delta_log; use append_delta")
    return _write_version(
        df.sparkSession, df, path, partition_by, 0, df.schema, "WRITE"
    )


def append_delta(df: DataFrame, path: str) -> int:
    """Append ``df`` as a new version of an existing Delta table (the table's
    own partition columns and schema govern; column order is aligned)."""
    versions = delta_versions(path)
    if not versions:
        raise ValueError(f"no Delta table at {path}")
    state = _replay(df.sparkSession, path, versions[-1])
    meta = state["meta"]
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = meta.get("partitionColumns") or []
    aligned = df.select(
        *[F.col(f.name).cast(f.dataType) for f in schema.fields]
    )
    return _write_version(
        df.sparkSession,
        aligned,
        path,
        part_cols,
        versions[-1] + 1,
        schema,
        "APPEND",
    )
