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

Reader gating is strict by design: ``minReaderVersion`` <= 2 only, any
``readerFeatures`` beyond what replay implements (deletion vectors, column
mapping, v2 checkpoints) raises ``UnsupportedDeltaFeature``, and — because
column mapping can be switched on at reader version 2 purely through table
configuration — ``delta.columnMapping.mode != none`` in the resolved
metaData raises too, rather than returning silently wrong (all-NULL) rows.
A hole in the version sequence below the replay target (log cleanup
without a covering checkpoint) fails loud instead of reconstructing a
wrong partial snapshot. Same fail-loud contract tablog uses for pending
DVs.

Scale shape: log replay is metadata work (KBs per version, checkpoint
parquet pruned to the action columns before it crosses to the driver —
the replayed state is O(#live files), see ``_replay``); the data read is
an ordinary multi-path parquet scan, so column pruning and predicate
pushdown apply exactly as on a native table. Above ``_MAX_LITERAL_GROUPS``
distinct partition tuples the scan switches to one-scan + broadcast
partition-value join so plan size stays constant in partition count.
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
# classic multi-part checkpoints: <v>.checkpoint.<part>.<n_parts>.parquet
_CHECKPOINT_PART_RE = re.compile(
    r"^(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet$"
)

# Above this many distinct partitionValues tuples, read_delta switches from
# one literal-column scan per partition group (analyzer cost linear in
# partition count) to ONE scan of every live file with partition values
# joined back from the log by file URI (broadcast hash join, constant-size
# plan) — high-cardinality partitioned estates stay readable.
_MAX_LITERAL_GROUPS = 64

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


def _checkpoint_before(path: str, version: int) -> tuple[int, list[str]] | None:
    """Newest COMPLETE parquet checkpoint at or before ``version`` as
    ``(checkpoint_version, part_paths)`` — single-file or classic
    multi-part (``<v>.checkpoint.<part>.<n>.parquet``; complete means all
    ``n`` parts are present, else that checkpoint is skipped).

    ``_last_checkpoint`` is an optimization hint only (it can lag or point
    past a time-travel target); listing is authoritative, exactly as the
    protocol prescribes for readers."""
    log = _log_dir(path)
    candidates: dict[int, list[str]] = {}
    parts: dict[int, dict[int, tuple[int, str]]] = {}
    for f in os.listdir(log):
        m = _CHECKPOINT_RE.match(f)
        if m and int(m.group(1)) <= version:
            candidates[int(m.group(1))] = [os.path.join(log, f)]
            continue
        m = _CHECKPOINT_PART_RE.match(f)
        if m and int(m.group(1)) <= version:
            v, part, n = int(m.group(1)), int(m.group(2)), int(m.group(3))
            parts.setdefault(v, {})[part] = (n, os.path.join(log, f))
    for v, by_part in parts.items():
        n_parts = {n for n, _ in by_part.values()}
        # complete means parts are EXACTLY 1..n (count alone would accept
        # e.g. {2,3} of a torn 2-part set and replay a wrong snapshot)
        if len(n_parts) == 1 and set(by_part) == set(
            range(1, next(iter(n_parts)) + 1)
        ):
            candidates.setdefault(
                v, [p for _, (_, p) in sorted(by_part.items())]
            )
    if not candidates:
        return None
    best = max(candidates)
    return best, candidates[best]


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
    """Reconstruct the action state at ``version``.

    Driver-memory bound: the replayed state is O(#live files) of add-action
    metadata held on the driver — the standard Delta-reader shape, fine up
    to millions of files. The checkpoint read prunes to the four action
    columns (dropping per-file ``stats`` payloads) before collecting; past
    ~10^7-file tables the upgrade path is a distributed fold (last-add-wins
    per path as a window over the checkpoint + tail) feeding the scan paths
    without a driver-side dict — see docs/PLANS.md."""
    state: dict = {"files": {}, "meta": None}
    start = 0
    cp = _checkpoint_before(path, version)
    if cp is not None:
        cp_version, cp_paths = cp
        # mergeSchema: multi-part checkpoints from foreign writers may have
        # per-part schemas (one part all-adds, another protocol/metaData);
        # single-file inference would silently drop the absent action kinds
        cp_df = spark.read.option("mergeSchema", "true").parquet(*cp_paths)
        # The checkpoint is parquet of action structs; NULL columns mark
        # absent action kinds. Prune to the action columns replay folds
        # (and drop add.stats, the bulk of checkpoint bytes) BEFORE the
        # collect — state building is inherently driver-side in this
        # design, so bound what crosses.
        cols = [
            c
            for c in ("protocol", "metaData", "add", "remove")
            if c in cp_df.columns
        ]
        cp_df = cp_df.select(*cols)
        if "add" in cols and "stats" in [
            f.name for f in cp_df.schema["add"].dataType.fields
        ]:
            cp_df = cp_df.withColumn("add", F.col("add").dropFields("stats"))
        for row in cp_df.toJSON().collect():
            _fold(state, json.loads(row))
        start = cp_version + 1
    for v in range(start, version + 1):
        entry = os.path.join(_log_dir(path), f"{v:020d}.json")
        if not os.path.exists(entry):
            # a vacuumed/cleaned log without a covering checkpoint (or a
            # hole in the version sequence) cannot replay correctly —
            # fail loud instead of reconstructing a wrong partial snapshot
            raise ValueError(
                f"_delta_log gap: version {v} missing while replaying to "
                f"{version} (checkpoint covers up to {start - 1})"
            )
        with open(entry) as fh:
            for line in fh:
                if line.strip():
                    _fold(state, json.loads(line))
    if state["meta"] is None:
        raise ValueError(f"no metaData action in log up to version {version}")
    # Column mapping can be enabled at minReaderVersion=2 purely via table
    # configuration (it only surfaces in readerFeatures at version 3): such
    # tables store physical col-<uuid> parquet names, so a name-based read
    # would return all-NULL columns. Gate on the resolved metaData.
    mode = (state["meta"].get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    if mode != "none":
        raise UnsupportedDeltaFeature(
            f"delta.columnMapping.mode={mode}: physical column names differ "
            "from logical; name-based parquet reads would be silently wrong"
        )
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
    by_name = {f.name: f for f in schema.fields}

    if len(groups) > _MAX_LITERAL_GROUPS:
        return _read_joined_partitions(
            spark, groups, part_cols, data_schema, schema, by_name
        )

    out = None
    # repr-keyed sort: partition values may be None (not orderable vs str)
    for key, paths in sorted(groups.items(), key=lambda kv: repr(kv[0])):
        df = spark.read.schema(data_schema).parquet(*sorted(paths))
        for c, v in zip(part_cols, key):
            df = df.withColumn(c, _partition_expr(v, by_name[c]))
        df = df.select(*[f.name for f in schema.fields])
        out = df if out is None else out.unionAll(df)
    return out


def _read_joined_partitions(
    spark: SparkSession,
    groups: dict[tuple, list[str]],
    part_cols: list[str],
    data_schema: T.StructType,
    schema: T.StructType,
    by_name: dict[str, T.StructField],
) -> DataFrame:
    """High-cardinality partition layout: ONE scan of every live file, with
    partition values joined back from the log keyed by the scanned file's
    URI (broadcast hash join — log metadata is tiny next to the data).

    The literal-column path builds a union plan linear in partition count,
    which bogs the analyzer down long before any data is read on estates
    with thousands of partitions; this path keeps the plan constant-size.
    Trade-off: partition-column filters prune after the join instead of
    statically eliminating scan paths — acceptable because file-level
    row-group pruning still applies and the alternative is an unusable
    plan.

    Join key: the DECODED absolute file path. ``input_file_name()`` yields
    a URI whose percent-encoding differs from ``Path.as_uri()`` (Hadoop
    leaves ``=`` bare, pathlib encodes it), so both sides normalize to the
    raw path: scan side strips the scheme and percent-decodes (literal
    ``+`` protected first — ``url_decode`` is form-decoding), map side uses
    ``os.path.abspath`` directly."""
    all_paths: list[str] = []
    mapping: list[tuple] = []
    for key, paths in groups.items():
        for p in paths:
            all_paths.append(p)
            mapping.append((os.path.abspath(p), *key))
    map_schema = T.StructType(
        [T.StructField("__file_path", T.StringType(), False)]
        + [T.StructField(c, T.StringType(), True) for c in part_cols]
    )
    lookup = spark.createDataFrame(mapping, map_schema)
    decoded = F.url_decode(
        F.regexp_replace(
            F.regexp_replace(F.input_file_name(), "^file:(//)?", ""),
            r"\+",
            "%2B",
        )
    )
    df = (
        spark.read.schema(data_schema)
        .parquet(*sorted(all_paths))
        .withColumn("__file_path", decoded)
        .join(F.broadcast(lookup), "__file_path", "left")
    )
    # protocol string deserialization, same semantics as _partition_expr
    for c in part_cols:
        df = df.withColumn(c, F.col(c).cast(by_name[c].dataType))
    return df.select(*[f.name for f in schema.fields])


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
