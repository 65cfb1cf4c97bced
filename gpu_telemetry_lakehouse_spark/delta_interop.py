"""Delta Lake interop: snapshot reconstruction and conformant writes
against the public ``_delta_log`` protocol, no Delta runtime required.

The complement to ``tablog.export_manifest`` (which lets foreign engines
consume OUR snapshots): this consumes the industry format, so a migration
can point the engine at an existing Delta estate, query it in place, and
write back (create/append/DV-delete/checkpoint) commits that conformant
runtimes replay. Write paths are gated the same way read paths are: a
table property that OBLIGES the writer to do something unimplemented
(CHECK constraints, CDF on delete, identity columns, row tracking, ...)
fails loud via ``_writer_gate`` instead of committing a nonconformant
version. Implements the documented transaction-log protocol (delta.io
PROTOCOL.md):

- version files ``_delta_log/<20-digit>.json`` — newline-delimited JSON
  actions; ``add`` and ``remove`` replay into the live file set, last
  ``metaData`` wins the schema, ``protocol`` gates reader compatibility;
- parquet checkpoints ``<v>.checkpoint.parquet`` (single-file), classic
  multi-part ``<v>.checkpoint.<part>.<n>.parquet``, and V2 checkpoints
  ``<v>.checkpoint.<uuid>.{json,parquet}`` whose file actions may live in
  sidecar parquet files under ``_delta_log/_sidecars/`` — a snapshot of
  the action state at version v, so reconstruction reads the checkpoint
  + the JSON tail, not the whole history (``_last_checkpoint`` is a hint
  only; listing is authoritative);
- partition columns are NOT stored in the data files — they come back from
  each add's ``partitionValues``, deserialized per the protocol's string
  serialization against the table schema.

Reader gating is strict by design: any ``readerFeatures`` beyond what
replay implements raises ``UnsupportedDeltaFeature``.
COLUMN MAPPING (name and id modes) is implemented: the physical parquet
schema is derived from the logical schemaString's
``delta.columnMapping.physicalName`` / ``.id`` field metadata, name mode
resolves parquet columns by physical name, id mode by parquet field id
(Spark's native ``parquet.field.id`` matching), partitionValues are looked
up under their physical keys, and the scan renames back to logical names —
so renamed/dropped-column estates read correctly instead of silently
all-NULL. A hole in the version sequence below the replay target (log
cleanup without a covering checkpoint) fails loud instead of
reconstructing a wrong partial snapshot.

DELETION VECTORS are implemented (reader version 3 + the
``deletionVectors`` feature): each add's DV descriptor resolves through
the public binary format (deletion_vectors.py — Z85, RoaringBitmapArray)
to per-file row positions, and the scan anti-joins them away exactly like
tablog's native ``delete_where_dv`` read path — positions ride a broadcast
DataFrame keyed by (file, ``_metadata.row_index``). The resolved positions
are driver-side metadata like the rest of replay, bounded by
``_MAX_DV_ROWS`` (fail-loud above; the upgrade path is distributing the
descriptor decode, not silently sampling).

Scale shape: log replay is metadata work (KBs per version, checkpoint
parquet pruned to the action columns before it crosses to the driver —
the replayed state is O(#live files), see ``_replay``); the data read is
an ordinary multi-path parquet scan, so column pruning and predicate
pushdown apply exactly as on a native table. Above ``_MAX_LITERAL_GROUPS``
distinct partition tuples the scan switches to one-scan + broadcast
partition-value join so plan size stays constant in partition count.

The write side (``write_delta`` / ``append_delta`` / ``delete_where_delta``)
emits protocol-conformant commits; ``checkpoint_delta`` writes a classic
single-file parquet checkpoint + ``_last_checkpoint`` hint so long-lived
append-heavy tables replay one parquet + a JSON tail instead of the whole
commit history, and commit-json retention cleanup becomes protocol-legal.
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
# V2 checkpoints (PROTOCOL.md "V2 Checkpoints"): <v>.checkpoint.<uniqueStr>
# .{json,parquet} — one top-level file carrying checkpointMetadata +
# protocol/metaData, with add/remove actions either inline or offloaded to
# `sidecar` actions pointing into _delta_log/_sidecars/. Exactly ONE middle
# segment, so the two-numeric-segment multi-part pattern cannot collide.
_CHECKPOINT_V2_RE = re.compile(
    r"^(\d{20})\.checkpoint\.([^./\\]+)\.(json|parquet)$"
)

# Above this many distinct partitionValues tuples, read_delta switches from
# one literal-column scan per partition group (analyzer cost linear in
# partition count) to ONE scan of every live file with partition values
# joined back from the log by file URI (broadcast hash join, constant-size
# plan) — high-cardinality partitioned estates stay readable.
_MAX_LITERAL_GROUPS = 64

# Replay implements: plain add/remove actions, JSON schemaString metadata,
# partitionValues reconstitution, deletion vectors, column mapping (name
# and id modes), v2 checkpoints (top-level json/parquet + sidecars).
# vacuumProtocolCheck is accepted because PROTOCOL.md assigns it no reader
# requirement at all — it exists to force WRITERS to protocol-check before
# VACUUM; a reader that refused it would reject perfectly readable tables.
# typeWidening(-preview) is accepted because replay always scans with the
# LOGICAL schemaString types, and Spark 4's parquet reader natively widens
# narrower physical files into that read schema for every protocol-allowed
# change (byte/short/int->long, float->double, int->double, decimal
# precision/scale growth, date->timestampNTZ) — verified by fixture test.
# variantType(-preview) is accepted because schemaString "variant" parses
# straight into Spark's native VariantType and the protocol's physical
# layout (a value/metadata binary pair) IS Spark's parquet variant layout —
# verified by fixture test. SHREDDED variants (variantShredding-preview)
# stay gated: their physical layout diverges per shredding schema.
# Everything else must be absent or the table is unreadable by this
# implementation.
_SUPPORTED_READER_FEATURES = {
    "timestampNtz",
    "deletionVectors",
    "columnMapping",
    "v2Checkpoint",
    "vacuumProtocolCheck",
    "typeWidening",
    "typeWidening-preview",
    "variantType",
    "variantType-preview",
}

# Resolved DV row positions are driver-side replay metadata (like the live-
# file dict): bound what crosses. 10M positions ~ hundreds of MB of tuples —
# far beyond any GDPR-delete-shaped DV; a table carrying more deletions than
# this should be compacted (or the decode distributed), not silently capped.
_MAX_DV_ROWS = 10_000_000


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


def _checkpoint_before(
    path: str, version: int
) -> tuple[int, list[str], str] | None:
    """Newest COMPLETE checkpoint at or before ``version`` as
    ``(checkpoint_version, part_paths, kind)`` — single-file parquet,
    classic multi-part (``<v>.checkpoint.<part>.<n>.parquet``; complete
    means all ``n`` parts are present, else that checkpoint is skipped),
    or a V2 checkpoint (``kind`` is ``"classic"``, ``"v2parquet"`` or
    ``"v2json"``; any complete checkpoint at a version serves the
    snapshot, so at a tie classic wins, then v2 parquet, then v2 json,
    lexicographically-largest uniqueStr for determinism).

    ``_last_checkpoint`` is an optimization hint only (it can lag or point
    past a time-travel target); listing is authoritative, exactly as the
    protocol prescribes for readers."""
    log = _log_dir(path)
    candidates: dict[int, tuple[list[str], str]] = {}
    parts: dict[int, dict[int, tuple[int, str]]] = {}
    v2: dict[int, dict[str, list[str]]] = {}
    for f in os.listdir(log):
        m = _CHECKPOINT_RE.match(f)
        if m and int(m.group(1)) <= version:
            candidates[int(m.group(1))] = ([os.path.join(log, f)], "classic")
            continue
        m = _CHECKPOINT_PART_RE.match(f)
        if m and int(m.group(1)) <= version:
            v, part, n = int(m.group(1)), int(m.group(2)), int(m.group(3))
            parts.setdefault(v, {})[part] = (n, os.path.join(log, f))
            continue
        m = _CHECKPOINT_V2_RE.match(f)
        if m and int(m.group(1)) <= version:
            kind = "v2parquet" if m.group(3) == "parquet" else "v2json"
            v2.setdefault(int(m.group(1)), {}).setdefault(kind, []).append(
                os.path.join(log, f)
            )
    for v, by_part in parts.items():
        n_parts = {n for n, _ in by_part.values()}
        # complete means parts are EXACTLY 1..n (count alone would accept
        # e.g. {2,3} of a torn 2-part set and replay a wrong snapshot)
        if len(n_parts) == 1 and set(by_part) == set(
            range(1, next(iter(n_parts)) + 1)
        ):
            candidates.setdefault(
                v, ([p for _, (_, p) in sorted(by_part.items())], "classic")
            )
    for v, by_kind in v2.items():
        if v not in candidates:
            kind = "v2parquet" if "v2parquet" in by_kind else "v2json"
            candidates[v] = ([max(by_kind[kind])], kind)
    if not candidates:
        return None
    best = max(candidates)
    return best, *candidates[best]


# PROTOCOL.md legacy protocol versions -> the table features they imply.
# When a writer upgrades a legacy protocol to table features (reader 3 /
# writer 7) it MUST list every implied feature, or a conformant runtime —
# which consults ONLY the features list at those versions — silently loses
# the capability (e.g. dropping columnMapping off a reader-2 mapped table
# makes delta-spark read parquet by logical name and return all-NULL
# columns). Review r9 found delete_where_delta's upgrade doing exactly
# that; both maps now feed the upgrade merge.
_LEGACY_READER_FEATURES: dict[int, frozenset] = {
    1: frozenset(),
    2: frozenset({"columnMapping"}),
}
_LEGACY_WRITER_FEATURES: dict[int, frozenset] = {
    1: frozenset(),
    2: frozenset({"appendOnly", "invariants"}),
    3: frozenset({"appendOnly", "invariants", "checkConstraints"}),
    4: frozenset(
        {
            "appendOnly",
            "invariants",
            "checkConstraints",
            "changeDataFeed",
            "generatedColumns",
        }
    ),
    5: frozenset(
        {
            "appendOnly",
            "invariants",
            "checkConstraints",
            "changeDataFeed",
            "generatedColumns",
            "columnMapping",
        }
    ),
    6: frozenset(
        {
            "appendOnly",
            "invariants",
            "checkConstraints",
            "changeDataFeed",
            "generatedColumns",
            "columnMapping",
            "identityColumns",
        }
    ),
}


def _legacy_features(version: int, table: dict[int, frozenset]) -> frozenset:
    return table.get(min(version, max(table)), table[max(table)])


def _check_protocol(action: dict) -> None:
    p = action["protocol"]
    if p.get("minReaderVersion", 1) > 3 or set(
        p.get("readerFeatures") or []
    ) - _SUPPORTED_READER_FEATURES:
        raise UnsupportedDeltaFeature(
            f"requires reader version {p.get('minReaderVersion')} with "
            f"features {p.get('readerFeatures')}; replay implements plain "
            "add/remove + partitionValues + deletion vectors only"
        )


def _latest_version(path: str) -> int | None:
    """Latest resolvable snapshot version: the newest commit json, else —
    the protocol-legal checkpoint-only-log case, where retention expired
    every commit at or before the newest complete checkpoint — that
    checkpoint's version. None when neither exists (no Delta table).
    Shared by read_delta/delete_where_delta/append_delta/checkpoint_delta
    (the fallback used to be copy-pasted at all four sites, review r9)."""
    versions = delta_versions(path)
    if versions:
        return versions[-1]
    cp = _checkpoint_before(path, 1 << 62)
    return None if cp is None else cp[0]


def _dv_uid(dv: dict | None) -> str:
    """PROTOCOL.md logical-file key half: a DV's unique id is
    ``storageType + pathOrInlineDv`` (plus ``@offset`` when present);
    empty string for no DV — so un-DV'd adds/removes key by path alone,
    exactly as legacy path-only writers expect."""
    if not dv or not dv.get("storageType"):
        return ""
    uid = f"{dv['storageType']}{dv.get('pathOrInlineDv', '')}"
    if dv.get("offset") is not None:
        uid += f"@{dv['offset']}"
    return uid


def _fold(state: dict, action: dict) -> None:
    """Apply one log action to the replay state.

    PROTOCOL.md action reconciliation keys logical files by
    ``(path, deletionVector uniqueId)`` — NOT by path alone. Path-only
    keying (the pre-r9 behavior, ADVICE r8 medium) made replay of a
    foreign commit that updates a file's DV — ``remove(path, oldDV)`` +
    ``add(path, newDV)`` in one commit — intra-commit order-dependent:
    serialized add-before-remove (an order the protocol does not
    constrain), the remove popped the fresh add and the file silently
    vanished from the snapshot. Keyed by (path, dvId) the two actions
    commute, and a remove tombstones only its matching logical file."""
    if "protocol" in action:
        _check_protocol(action)
        # last-wins, kept so writers can MERGE new features into the
        # table's existing protocol instead of clobbering it
        state["protocol"] = action["protocol"]
    if "metaData" in action:
        state["meta"] = action["metaData"]
    if "add" in action:
        # an add may carry a deletionVector descriptor; read_delta resolves
        # it through deletion_vectors.read_dv_descriptor at scan time
        a = action["add"]
        state["files"][(a["path"], _dv_uid(a.get("deletionVector")))] = a
    if "remove" in action:
        r = action["remove"]
        state["files"].pop((r["path"], _dv_uid(r.get("deletionVector"))), None)
    if "txn" in action:
        # setTransaction: latest version per appId survives reconciliation.
        # Foreign streaming writers key their idempotence on these; a
        # checkpoint that dropped them (review r9) would make log cleanup
        # silently re-appendable — PROTOCOL.md requires checkpoints to
        # preserve them, so replay must carry them.
        t = action["txn"]
        state["txns"][t["appId"]] = t


def _action_rows(cp_df: DataFrame) -> list[str]:
    """Checkpoint parquet → JSON action rows for the driver-side fold.

    A checkpoint is parquet of action structs; NULL columns mark absent
    action kinds. Prune to the action columns replay folds (and drop
    add.stats, the bulk of checkpoint bytes) BEFORE the collect — state
    building is inherently driver-side in this design, so bound what
    crosses. ``toJSON`` omits null fields, so each row carries exactly its
    one present action, same shape as a commit-json line."""
    cols = [
        c
        for c in ("protocol", "metaData", "add", "remove", "txn")
        if c in cp_df.columns
    ]
    if not cols:
        # a v2 top-level file may offload every file action to sidecars
        return []
    cp_df = cp_df.select(*cols)
    if "add" in cols and "stats" in [
        f.name for f in cp_df.schema["add"].dataType.fields
    ]:
        cp_df = cp_df.withColumn("add", F.col("add").dropFields("stats"))
    return cp_df.toJSON().collect()


def _v2_checkpoint_actions(
    spark: SparkSession, path: str, cp_version: int, cp_file: str, kind: str
):
    """Yield the replay actions of a V2 checkpoint (PROTOCOL.md
    "V2 Checkpoints", the ``v2Checkpoint`` reader feature).

    The top-level file (``<v>.checkpoint.<uuid>.{json,parquet}``) must
    carry exactly one ``checkpointMetadata`` action naming its version —
    a mismatch means a torn or misnamed file, fail loud. protocol/metaData
    (and any inline add/remove) fold directly; ``sidecar`` actions point
    at parquet files under ``_delta_log/_sidecars/`` holding the offloaded
    add/remove actions (the protocol puts ALL file actions in sidecars
    when any sidecar is present). Missing sidecar files fail loud — a
    partial snapshot is silent data loss."""
    if kind == "v2json":
        actions: list[dict] = []
        with open(cp_file) as fh:
            for line in fh:
                if line.strip():
                    actions.append(json.loads(line))
    else:
        df = spark.read.parquet(cp_file)
        actions = []
        if "checkpointMetadata" in df.columns:
            for row in (
                df.select("checkpointMetadata")
                .where(F.col("checkpointMetadata").isNotNull())
                .toJSON()
                .collect()
            ):
                actions.append(json.loads(row))
        if "sidecar" in df.columns:
            for row in (
                df.select("sidecar")
                .where(F.col("sidecar").isNotNull())
                .toJSON()
                .collect()
            ):
                actions.append(json.loads(row))
        actions.extend(json.loads(r) for r in _action_rows(df))
    cms = [a["checkpointMetadata"] for a in actions if a.get("checkpointMetadata")]
    if len(cms) != 1:
        raise ValueError(
            f"v2 checkpoint {cp_file} carries {len(cms)} checkpointMetadata "
            "actions (the protocol requires exactly one)"
        )
    if int(cms[0].get("version", -1)) != cp_version:
        raise ValueError(
            f"v2 checkpoint {cp_file} names version {cms[0].get('version')} "
            f"but its file name says {cp_version} — torn or misnamed "
            "checkpoint, refusing to replay"
        )
    sidecars = [a["sidecar"] for a in actions if a.get("sidecar")]
    for a in actions:
        if any(a.get(k) for k in ("protocol", "metaData", "add", "remove", "txn")):
            yield a
    if sidecars:
        sc_dir = os.path.join(_log_dir(path), "_sidecars")
        sc_paths = []
        for s in sidecars:
            rel = s.get("path")
            if not rel:
                raise ValueError(
                    f"v2 checkpoint {cp_file} carries a sidecar action "
                    "without a path"
                )
            full = rel if os.path.isabs(rel) else os.path.join(sc_dir, rel)
            if not os.path.exists(full):
                raise ValueError(
                    f"v2 checkpoint sidecar missing: {full} — a partial "
                    "snapshot would silently lose files, refusing to replay"
                )
            sc_paths.append(full)
        sc_df = spark.read.option("mergeSchema", "true").parquet(*sc_paths)
        for row in _action_rows(sc_df):
            yield json.loads(row)


def _replay(spark: SparkSession, path: str, version: int) -> dict:
    """Reconstruct the action state at ``version``.

    Driver-memory bound: the replayed state is O(#live files) of add-action
    metadata held on the driver — the standard Delta-reader shape, fine up
    to millions of files. The checkpoint read prunes to the four action
    columns (dropping per-file ``stats`` payloads) before collecting; past
    ~10^7-file tables the upgrade path is a distributed fold (last-add-wins
    per path as a window over the checkpoint + tail) feeding the scan paths
    without a driver-side dict — see docs/PLANS.md."""
    state: dict = {"files": {}, "meta": None, "protocol": None, "txns": {}}
    start = 0
    cp = _checkpoint_before(path, version)
    if cp is not None:
        cp_version, cp_paths, cp_kind = cp
        if cp_kind == "classic":
            # mergeSchema: multi-part checkpoints from foreign writers may
            # have per-part schemas (one part all-adds, another protocol/
            # metaData); single-file inference would silently drop the
            # absent action kinds
            cp_df = spark.read.option("mergeSchema", "true").parquet(*cp_paths)
            for row in _action_rows(cp_df):
                _fold(state, json.loads(row))
        else:
            for action in _v2_checkpoint_actions(
                spark, path, cp_version, cp_paths[0], cp_kind
            ):
                _fold(state, action)
        start = cp_version + 1
    for v in range(start, version + 1):
        entry = os.path.join(_log_dir(path), f"{v:020d}.json")
        if not os.path.exists(entry):
            # a vacuumed/cleaned log without a covering checkpoint (or a
            # hole in the version sequence) cannot replay correctly —
            # fail loud instead of reconstructing a wrong partial snapshot
            covered = (
                "no checkpoint found"
                if cp is None
                else f"checkpoint covers up to {start - 1}"
            )
            raise ValueError(
                f"_delta_log gap: version {v} missing while replaying to "
                f"{version} ({covered})"
            )
        with open(entry) as fh:
            for line in fh:
                if line.strip():
                    _fold(state, json.loads(line))
    if state["meta"] is None:
        raise ValueError(f"no metaData action in log up to version {version}")
    # Column mapping can be enabled at minReaderVersion=2 purely via table
    # configuration (it only surfaces in readerFeatures at version 3): such
    # tables store physical col-<uuid> parquet names, resolved by
    # _column_mapping / _physical_read_schema at scan time. Gate only the
    # modes the protocol does not define.
    mode = (state["meta"].get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    if mode not in ("none", "name", "id"):
        raise UnsupportedDeltaFeature(
            f"delta.columnMapping.mode={mode!r} is not a protocol mode "
            "(none/name/id)"
        )
    # Snapshot validation: with (path, dvId) keying a nonconformant writer
    # (e.g. one that re-logs a DV'd add without removing the superseded
    # (path, oldDV) logical file) can leave the SAME physical path live
    # twice — a conformant scan would read the file twice and silently
    # duplicate rows. Fail loud instead (delta-spark's state-reconstruction
    # check does the same).
    seen: dict[str, str] = {}
    for p, uid in state["files"]:
        if p in seen:
            raise ValueError(
                f"invalid Delta snapshot at version {version}: path {p!r} is "
                f"live under two deletionVector ids ({seen[p]!r}, {uid!r}) — "
                "the writer failed to remove the superseded logical file"
            )
        seen[p] = uid
    return state


# --- column mapping (PROTOCOL.md "Column Mapping") --------------------------
# With delta.columnMapping.mode=name|id the parquet files carry PHYSICAL
# column names (field metadata delta.columnMapping.physicalName, typically
# col-<uuid>); the logical names live only in the schemaString. name mode
# resolves parquet columns by physical name; id mode resolves by parquet
# field id (field metadata delta.columnMapping.id), which Spark's native
# reader matches when the read schema carries parquet.field.id metadata and
# spark.sql.parquet.fieldId.read.enabled is set. Renames/drops are thus
# metadata-only — exactly why the feature exists.


def _cm_mode(meta: dict) -> str:
    return (meta.get("configuration") or {}).get("delta.columnMapping.mode", "none")


def _physical_type(dt: T.DataType, mode: str) -> T.DataType:
    """Recursively rewrite a logical type to its physical parquet shape
    (column mapping applies to nested struct fields too)."""
    if isinstance(dt, T.StructType):
        return T.StructType([_physical_field(f, mode) for f in dt.fields])
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_physical_type(dt.elementType, mode), dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _physical_type(dt.keyType, mode),
            _physical_type(dt.valueType, mode),
            dt.valueContainsNull,
        )
    return dt


def _physical_field(f: T.StructField, mode: str) -> T.StructField:
    md = f.metadata or {}
    phys = md.get("delta.columnMapping.physicalName")
    if phys is None:
        raise UnsupportedDeltaFeature(
            f"delta.columnMapping.mode={mode} but field {f.name!r} carries no "
            "delta.columnMapping.physicalName metadata — the physical parquet "
            "column cannot be resolved"
        )
    out_md = {}
    if mode == "id":
        fid = md.get("delta.columnMapping.id")
        if fid is None:
            raise UnsupportedDeltaFeature(
                f"delta.columnMapping.mode=id but field {f.name!r} carries no "
                "delta.columnMapping.id metadata"
            )
        # Spark's parquet reader matches by field id when the read schema
        # carries this key (and the fieldId.read conf is on) — the protocol-
        # correct resolution for id mode, where file column NAMES are
        # not required to match physicalName.
        out_md["parquet.field.id"] = int(fid)
    return T.StructField(phys, _physical_type(f.dataType, mode), f.nullable, out_md)


def _cm_read_plan(spark: SparkSession, meta: dict, data_fields: list[T.StructField]):
    """Physical read schema + a post-scan rename-to-logical callback for the
    table's column-mapping mode (identity when mode=none). partitionValues
    keys follow the same mode (the protocol tracks them by physical name)."""
    mode = _cm_mode(meta)
    if mode == "none":
        return T.StructType(data_fields), (lambda df: df)
    if mode == "id":
        # Runtime-settable SQL conf required for parquet.field.id matching.
        # Deliberately left set for the session (review r9 flagged the
        # stickiness): the returned DataFrame is LAZY, so a save/restore
        # around this function would race the actual scan. The flag is
        # inert for every other read — field-id resolution only activates
        # when the READ SCHEMA carries parquet.field.id metadata, which
        # only these id-mode plans attach (pinned by
        # test_delta_cm_fieldid_conf_inert).
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    read_schema = T.StructType([_physical_field(f, mode) for f in data_fields])

    def to_logical(df: DataFrame) -> DataFrame:
        # positional struct cast renames nested fields back to logical;
        # __-prefixed scan tags (__dv_file/__dv_pos/__file_path) pass through
        tags = [c for c in df.columns if c.startswith("__")]
        return df.select(
            *[
                F.col(f"`{rf.name}`").cast(f.dataType).alias(f.name)
                for rf, f in zip(read_schema.fields, data_fields)
            ],
            *[F.col(c) for c in tags],
        )

    return read_schema, to_logical


def _pv_key(meta: dict, schema: T.StructType) -> dict[str, str]:
    """Partition column logical name -> the key under which its value is
    tracked in add.partitionValues (the physical name when column mapping is
    enabled — PROTOCOL.md writer requirements)."""
    mode = _cm_mode(meta)
    part_cols = meta.get("partitionColumns") or []
    if mode == "none":
        return {c: c for c in part_cols}
    by_name = {f.name: f for f in schema.fields}
    out = {}
    for c in part_cols:
        # Fail-loud parity with _physical_field (review r9): a mapped
        # table whose partition field lacks physicalName metadata is
        # nonconformant; a silent logical fallback here would resolve
        # every partition value to NULL — indistinguishable from genuine
        # NULL partitions — while data fields refuse the same breakage.
        if c not in by_name:
            raise UnsupportedDeltaFeature(
                f"partition column {c!r} is missing from schemaString on a "
                f"column-mapped table (mode={mode})"
            )
        phys = (by_name[c].metadata or {}).get("delta.columnMapping.physicalName")
        if phys is None:
            raise UnsupportedDeltaFeature(
                f"delta.columnMapping.mode={mode} but partition field {c!r} "
                "carries no delta.columnMapping.physicalName metadata — its "
                "partitionValues key cannot be resolved"
            )
        out[c] = phys
    return out


def _pv_get(a: dict, logical: str, pv_key: dict[str, str]) -> str | None:
    """One add's partition value for a logical column: physical key first
    (what conformant column-mapping writers track), logical as fallback for
    tables upgraded in place whose old adds predate the mapping."""
    pv = a.get("partitionValues") or {}
    k = pv_key.get(logical, logical)
    if k in pv:
        return pv[k]
    return pv.get(logical)


def _partition_expr(value: str | None, field: T.StructField) -> F.Column:
    """Deserialize one partitionValues entry per the protocol's string
    serialization (empty string and null both mean NULL for non-strings)."""
    if value is None:
        return F.lit(None).cast(field.dataType)
    return F.lit(value).cast(field.dataType)


def _decoded_path_expr(col: F.Column) -> F.Column:
    """Scanned-file URI -> raw decoded path. ``input_file_name()`` /
    ``_metadata.file_path`` yield URIs whose percent-encoding differs from
    ``Path.as_uri()`` (Hadoop leaves ``=`` bare, pathlib encodes it), so
    normalize to the raw path: strip the scheme and percent-decode, with
    literal ``+`` protected first (``url_decode`` is form-decoding)."""
    return F.url_decode(
        F.regexp_replace(F.regexp_replace(col, "^file:(//)?", ""), r"\+", "%2B")
    )


def _dv_exclusions(spark: SparkSession, path: str, adds) -> DataFrame | None:
    """Resolve every add's deletionVector descriptor to one exclusion
    DataFrame of (__dv_file abs path, __dv_pos row index), or None when the
    snapshot carries no DVs. Decoding is driver-side replay metadata,
    bounded by _MAX_DV_ROWS (fail loud, never sample)."""
    from urllib.parse import unquote

    from .deletion_vectors import read_dv_descriptor

    flat: list[tuple[str, int]] = []
    for a in adds:
        d = a.get("deletionVector")
        if not d:
            continue
        abs_file = os.path.abspath(os.path.join(path, unquote(a["path"])))
        ixs = read_dv_descriptor(path, d)
        if len(flat) + len(ixs) > _MAX_DV_ROWS:
            raise UnsupportedDeltaFeature(
                f"snapshot carries more than {_MAX_DV_ROWS:,} deletion-vector "
                "positions; compact the table (or distribute the DV decode) "
                "instead of a driver-side exclusion list this large"
            )
        flat.extend((abs_file, ix) for ix in ixs)
    if not flat:
        return None
    return spark.createDataFrame(
        flat,
        T.StructType(
            [
                T.StructField("__dv_file", T.StringType(), False),
                T.StructField("__dv_pos", T.LongType(), False),
            ]
        ),
    )


def read_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table snapshot (time travel via ``version``) as a
    DataFrame, reconstructing partition columns from the log."""
    latest = _latest_version(path)
    if latest is None:
        raise ValueError(f"no _delta_log versions under {path}")
    target = latest if version is None else version
    state = _replay(spark, path, target)
    meta = state["meta"]
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = meta.get("partitionColumns") or []
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    read_schema, to_logical = _cm_read_plan(spark, meta, data_fields)
    pvk = _pv_key(meta, schema)

    if not state["files"]:
        return spark.createDataFrame([], schema)

    # Group adds by their partitionValues so each group is ONE multi-path
    # parquet scan with literal partition columns appended — pushdown and
    # pruning behave exactly as on a directly-read parquet dataset.
    from urllib.parse import unquote

    groups: dict[tuple, list[str]] = {}
    for a in state["files"].values():
        key = tuple(_pv_get(a, c, pvk) for c in part_cols)
        # PROTOCOL.md: add.path is URL-encoded relative to the table root
        groups.setdefault(key, []).append(os.path.join(path, unquote(a["path"])))
    by_name = {f.name: f for f in schema.fields}
    dv_excl = _dv_exclusions(spark, path, state["files"].values())

    if len(groups) > _MAX_LITERAL_GROUPS:
        return _read_joined_partitions(
            spark, groups, part_cols, read_schema, schema, by_name, dv_excl,
            to_logical,
        )

    out = None
    tags = ["__dv_file", "__dv_pos"] if dv_excl is not None else []
    # repr-keyed sort: partition values may be None (not orderable vs str)
    for key, paths in sorted(groups.items(), key=lambda kv: repr(kv[0])):
        df = spark.read.schema(read_schema).parquet(*sorted(paths))
        if dv_excl is not None:
            # tag at scan time — _metadata is only addressable on the scan
            df = df.select(
                "*",
                _decoded_path_expr(F.col("_metadata.file_path")).alias("__dv_file"),
                F.col("_metadata.row_index").alias("__dv_pos"),
            )
        df = to_logical(df)
        for c, v in zip(part_cols, key):
            df = df.withColumn(c, _partition_expr(v, by_name[c]))
        df = df.select(*[f.name for f in schema.fields], *tags)
        out = df if out is None else out.unionAll(df)
    if dv_excl is not None:
        # Decode-integrity guard (review r8): a scan-side path-decode miss
        # would make the anti-join match NOTHING and silently UN-DELETE
        # rows — the joined-partitions path catches decode breakage via
        # its __pv_matched raise, so give this path the same teeth: every
        # scanned row's decoded path must hit the known file list.
        known = spark.createDataFrame(
            [(os.path.abspath(p),) for paths in groups.values() for p in paths],
            T.StructType([T.StructField("__dv_file", T.StringType(), False)]),
        ).withColumn("__scan_ok", F.lit(True))
        out = out.join(F.broadcast(known), "__dv_file", "left").withColumn(
            "__dv_pos",
            F.when(F.col("__scan_ok").isNotNull(), F.col("__dv_pos")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("delta DV path decode missed scanned file: "),
                        F.col("__dv_file"),
                    )
                )
            ),
        )
        out = out.join(
            F.broadcast(dv_excl), ["__dv_file", "__dv_pos"], "left_anti"
        ).drop(*tags, "__scan_ok")
    return out


def _read_joined_partitions(
    spark: SparkSession,
    groups: dict[tuple, list[str]],
    part_cols: list[str],
    read_schema: T.StructType,
    schema: T.StructType,
    by_name: dict[str, T.StructField],
    dv_excl: DataFrame | None = None,
    to_logical=lambda df: df,
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
            mapping.append((os.path.abspath(p), True, *key))
    map_schema = T.StructType(
        [
            T.StructField("__file_path", T.StringType(), False),
            T.StructField("__pv_matched", T.BooleanType(), False),
        ]
        + [T.StructField(c, T.StringType(), True) for c in part_cols]
    )
    lookup = spark.createDataFrame(mapping, map_schema)
    df = (
        spark.read.schema(read_schema)
        .parquet(*sorted(all_paths))
        .withColumn("__file_path", _decoded_path_expr(F.input_file_name()))
    )
    if dv_excl is not None:
        # tag before to_logical — _metadata is only addressable on the scan
        df = df.withColumn("__dv_pos", F.col("_metadata.row_index"))
    df = to_logical(df)
    if dv_excl is not None:
        df = df.join(
            F.broadcast(dv_excl.withColumnRenamed("__dv_file", "__file_path")),
            ["__file_path", "__dv_pos"],
            "left_anti",
        ).drop("__dv_pos")
    df = df.join(F.broadcast(lookup), "__file_path", "left")
    # A normalization miss (non-file:// scheme, unexpected encoding) would
    # otherwise surface as silently-NULL partition columns — the exact
    # silent-wrong-rows failure this module's contract forbids. Fail loud
    # per row through the first partition column's expression (an
    # un-referenced check column would be pruned away by Catalyst).
    guard = F.when(F.col("__pv_matched").isNotNull(), F.col(part_cols[0])).otherwise(
        F.raise_error(
            F.concat(
                F.lit("delta partition lookup missed scanned file: "),
                F.col("__file_path"),
            )
        )
    )
    df = df.withColumn(part_cols[0], guard)
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


def _writer_gate(state: dict, operation: str) -> None:
    """Conformant-writer refusals (PROTOCOL.md writer requirements).

    A table property can OBLIGE the writer to do something — validate a
    constraint, emit cdc files, assign identity values — and a commit that
    skips the obligation is nonconformant even though it parses. Anything
    this implementation does not implement must therefore fail LOUD before
    writing, the same posture the reader takes via
    ``_SUPPORTED_READER_FEATURES``. Feature names appearing in
    ``writerFeatures`` alone are fine (supported-but-not-enabled); only the
    enabling table property / field metadata triggers refusal."""
    meta = state.get("meta") or {}
    conf = meta.get("configuration") or {}

    def enabled(key: str) -> bool:
        return str(conf.get(key, "")).lower() == "true"

    if operation == "delete":
        if enabled("delta.appendOnly"):
            raise UnsupportedDeltaFeature(
                "delta.appendOnly=true forbids deletes on this table"
            )
        if enabled("delta.enableChangeDataFeed"):
            raise UnsupportedDeltaFeature(
                "delta.enableChangeDataFeed=true obliges DELETE commits to "
                "write cdc files, which this writer does not implement"
            )
        if enabled("delta.enableIcebergCompatV1") or enabled(
            "delta.enableIcebergCompatV2"
        ):
            raise UnsupportedDeltaFeature(
                "icebergCompat forbids deletion-vector deletes; compact or "
                "rewrite instead"
            )
    if operation == "append":
        bad_conf = sorted(
            k for k in conf if k.startswith("delta.constraints.")
        )
        if bad_conf:
            raise UnsupportedDeltaFeature(
                f"CHECK constraints {bad_conf} are not validated by this "
                "writer — an append could silently violate them"
            )
        schema = (
            T.StructType.fromJson(json.loads(meta["schemaString"]))
            if meta.get("schemaString")
            else T.StructType([])
        )
        for f in schema.fields:
            md = f.metadata or {}
            if "delta.invariants" in md:
                raise UnsupportedDeltaFeature(
                    f"column invariant on {f.name!r} is not validated by "
                    "this writer"
                )
            if "delta.generationExpression" in md:
                raise UnsupportedDeltaFeature(
                    f"generated column {f.name!r} is not computed or "
                    "validated by this writer"
                )
            if any(k.startswith("delta.identity.") for k in md):
                raise UnsupportedDeltaFeature(
                    f"identity column {f.name!r} is not assigned by this "
                    "writer"
                )
    # obligations that bind EVERY commit kind
    if enabled("delta.enableRowTracking"):
        raise UnsupportedDeltaFeature(
            "rowTracking obliges writers to assign baseRowIds and default "
            "row commit versions, which this writer does not implement"
        )
    if enabled("delta.enableInCommitTimestamps"):
        raise UnsupportedDeltaFeature(
            "inCommitTimestamp obliges writers to stamp monotonic commit "
            "timestamps, which this writer does not implement"
        )


def delete_where_delta(spark: SparkSession, path: str, predicate) -> int:
    """DELETE via deletion vectors: mark matching rows deleted WITHOUT
    rewriting any data file — the Delta-native sibling of tablog's
    ``delete_where_dv``. Matching (file, row position) pairs come from one
    scan with the parquet ``_metadata`` columns; each affected file's add is
    re-logged with a ``deletionVector`` descriptor over the union of its
    previous and new positions (the protocol replaces, never stacks, a
    file's DV), serialized through the public binary format
    (deletion_vectors.write_dv_file). The commit upgrades the protocol to
    reader 3 / writer 7 with the deletionVectors feature, so conformant
    Delta runtimes read the result; read_delta round-trips it.

    Positions are collected to the driver (bounded by _MAX_DV_ROWS, fail
    loud) — the GDPR-delete shape this operation exists for; a delete big
    enough to breach the bound should be a rewrite (``delete_where``-style),
    not a DV."""
    from urllib.parse import unquote

    from .deletion_vectors import read_dv_descriptor, write_dv_file

    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    current = _latest_version(path)
    if current is None:
        raise ValueError(f"no Delta table at {path}")
    state = _replay(spark, path, current)
    _writer_gate(state, "delete")
    meta = state["meta"]
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = meta.get("partitionColumns") or []
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    read_schema, to_logical = _cm_read_plan(spark, meta, data_fields)
    pvk = _pv_key(meta, schema)
    by_name = {f.name: f for f in schema.fields}
    if not state["files"]:
        return current  # nothing live: nothing to delete, no commit

    # abs data path -> the live add action, so scan hits map back to
    # actions (_replay validates path uniqueness across (path, dvId) keys)
    by_abs: dict[str, dict] = {
        os.path.abspath(os.path.join(path, unquote(a["path"]))): a
        for a in state["files"].values()
    }

    # Match with ONE scan of every live file (constant-size plan at any
    # partition cardinality — the per-group literal form would build one
    # union branch per partitionValues tuple, the analyzer blow-up
    # _read_joined_partitions exists to avoid): partition values join back
    # broadcast keyed by the decoded file path, and the __pv_matched guard
    # makes any decode miss LOUD (a miss here would silently match zero
    # rows of that file). Rows already dead under an existing DV are
    # excluded BEFORE the predicate, so re-running a delete no-ops and the
    # _MAX_DV_ROWS bound counts live matches only.
    mapping = []
    for abs_p, a in by_abs.items():
        mapping.append((abs_p, True) + tuple(_pv_get(a, c, pvk) for c in part_cols))
    map_schema = T.StructType(
        [
            T.StructField("__dv_file", T.StringType(), False),
            T.StructField("__pv_matched", T.BooleanType(), False),
        ]
        + [T.StructField(c, T.StringType(), True) for c in part_cols]
    )
    lookup = spark.createDataFrame(mapping, map_schema)
    df = spark.read.schema(read_schema).parquet(
        *sorted(by_abs)
    ).select(
        "*",
        _decoded_path_expr(F.col("_metadata.file_path")).alias("__dv_file"),
        F.col("_metadata.row_index").alias("__dv_pos"),
    )
    df = to_logical(df)  # predicate and partition casts bind logical names
    prev_excl = _dv_exclusions(spark, path, state["files"].values())
    if prev_excl is not None:
        df = df.join(F.broadcast(prev_excl), ["__dv_file", "__dv_pos"], "left_anti")
    df = df.join(F.broadcast(lookup), "__dv_file", "left").withColumn(
        "__dv_pos",
        F.when(F.col("__pv_matched").isNotNull(), F.col("__dv_pos")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("delta delete scan missed file in lookup: "),
                    F.col("__dv_file"),
                )
            )
        ),
    )
    for c in part_cols:
        df = df.withColumn(c, F.col(c).cast(by_name[c].dataType))
    matched = df.filter(pred).select("__dv_file", "__dv_pos")
    hits = matched.limit(_MAX_DV_ROWS + 1).collect()
    if len(hits) > _MAX_DV_ROWS:
        raise ValueError(
            f"predicate deletes more than {_MAX_DV_ROWS:,} rows — use a "
            "rewriting delete instead of a deletion vector"
        )
    new_by_file: dict[str, set[int]] = {}
    for r in hits:  # index access: Row blocks dunder attribute lookups
        new_by_file.setdefault(r["__dv_file"], set()).add(r["__dv_pos"])
    if not new_by_file:
        return current  # nothing matched: no commit

    # MERGE the deletionVectors feature into the table's existing protocol
    # (last-protocol-wins: a hardcoded action would silently DROP features
    # the table already declares, e.g. timestampNtz or appendOnly). When
    # upgrading a LEGACY protocol to table features (reader 3 / writer 7),
    # every feature the legacy versions implied must ride along —
    # PROTOCOL.md's legacy mapping, _LEGACY_READER/_WRITER_FEATURES. The
    # reader side matters concretely: reader 2 implies columnMapping, and
    # an upgrade that dropped it (pre-r9-review behavior) would hand a
    # conformant runtime a mapped table whose features list says "resolve
    # parquet by logical name" — every column silently NULL.
    cur = state.get("protocol") or {"minReaderVersion": 1, "minWriterVersion": 2}
    legacy_reader: frozenset = frozenset()
    if not cur.get("readerFeatures"):
        legacy_reader = _legacy_features(
            cur.get("minReaderVersion", 1), _LEGACY_READER_FEATURES
        )
    legacy_writer: frozenset = frozenset()
    if not cur.get("writerFeatures"):
        legacy_writer = _legacy_features(
            cur.get("minWriterVersion", 2), _LEGACY_WRITER_FEATURES
        )
    actions: list[dict] = [
        {
            "protocol": {
                "minReaderVersion": max(cur.get("minReaderVersion", 1), 3),
                "minWriterVersion": max(cur.get("minWriterVersion", 2), 7),
                "readerFeatures": sorted(
                    set(cur.get("readerFeatures") or [])
                    | legacy_reader
                    | {"deletionVectors"}
                ),
                "writerFeatures": sorted(
                    set(cur.get("writerFeatures") or [])
                    | legacy_writer
                    | {"deletionVectors"}
                ),
            }
        }
    ]
    for abs_file, positions in sorted(new_by_file.items()):
        prev_add = by_abs.get(abs_file)
        if prev_add is None:
            raise ValueError(f"scan produced a file replay never added: {abs_file}")
        add = dict(prev_add)
        prev = add.get("deletionVector")
        remove: dict = {"path": add["path"], "dataChange": True}
        if prev:
            positions |= set(read_dv_descriptor(path, prev))
            # ADVICE r8 (high): reconciliation keys logical files by
            # (path, dvId), so a bare remove(path) would NOT retire the
            # superseded (path, oldDV) logical file — a conformant reader
            # would keep both adds live and scan the file twice (silently
            # duplicated rows). Stamp the old descriptor on the tombstone.
            remove["deletionVector"] = prev
        add["deletionVector"] = write_dv_file(path, sorted(positions))
        # dataChange TRUE: a DV delete CHANGES the logical table contents —
        # dataChange=false marks reorganization-only commits (compaction)
        # that incremental consumers may legally skip (review r8).
        add["dataChange"] = True
        actions.append({"remove": remove})
        actions.append({"add": add})
    actions.append(
        {"commitInfo": {"operation": "DELETE", "mode": "deletionVector"}}
    )
    version = current + 1
    entry = os.path.join(_log_dir(path), f"{version:020d}.json")
    fd = os.open(entry, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return version


def append_delta(df: DataFrame, path: str) -> int:
    """Append ``df`` as a new version of an existing Delta table (the table's
    own partition columns and schema govern; column order is aligned).

    Column-mapped tables (mode name/id) append PHYSICAL files: data columns
    are renamed (recursively, nested structs included) to their
    delta.columnMapping.physicalName and, in id mode, stamped with
    parquet.field.id metadata so the written parquet carries field ids;
    add.partitionValues are keyed by physical name as the protocol's writer
    requirements demand. Review r9 found the pre-fix behavior writing
    LOGICAL names into a physical-name table — rows that read back silently
    all-NULL on any conformant reader, including this repo's own."""
    spark = df.sparkSession
    current = _latest_version(path)
    if current is None:
        raise ValueError(f"no Delta table at {path}")
    state = _replay(spark, path, current)
    _writer_gate(state, "append")
    meta = state["meta"]
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = meta.get("partitionColumns") or []
    aligned = df.select(
        *[F.col(f.name).cast(f.dataType) for f in schema.fields]
    )
    mode = _cm_mode(meta)
    if mode != "none":
        if mode == "id":
            # default-on in Spark 4, pinned for safety: without it the
            # written parquet drops the field ids id-mode readers key on
            spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        cols, phys_name = [], {}
        for f in schema.fields:
            pf = _physical_field(f, mode)  # fail-loud on missing metadata
            phys_name[f.name] = pf.name
            c = F.col(f.name).cast(pf.dataType)  # positional cast renames
            cols.append(                         # nested struct fields
                c.alias(pf.name, metadata=dict(pf.metadata))
                if pf.metadata
                else c.alias(pf.name)
            )
        aligned = aligned.select(*cols)
        part_cols = [phys_name[c] for c in part_cols]
    return _write_version(
        spark,
        aligned,
        path,
        part_cols,
        current + 1,
        schema,
        "APPEND",
    )


# Checkpoint parquet schema (PROTOCOL.md "Checkpoint Schema"): one struct
# column per action kind, nulls marking absence; partitionValues/
# configuration are true MAP columns (json-inference would turn them into
# per-key structs, which foreign readers reject). Optional fields foreign
# metaData/protocol commonly carry (createdTime, name, features) are kept.
_CP_DV_TYPE = T.StructType(
    [
        T.StructField("storageType", T.StringType(), True),
        T.StructField("pathOrInlineDv", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), True),
        T.StructField("sizeInBytes", T.IntegerType(), True),
        T.StructField("cardinality", T.LongType(), True),
    ]
)
_CP_SCHEMA = T.StructType(
    [
        T.StructField(
            "protocol",
            T.StructType(
                [
                    T.StructField("minReaderVersion", T.IntegerType(), True),
                    T.StructField("minWriterVersion", T.IntegerType(), True),
                    T.StructField(
                        "readerFeatures", T.ArrayType(T.StringType()), True
                    ),
                    T.StructField(
                        "writerFeatures", T.ArrayType(T.StringType()), True
                    ),
                ]
            ),
            True,
        ),
        T.StructField(
            "metaData",
            T.StructType(
                [
                    T.StructField("id", T.StringType(), True),
                    T.StructField("name", T.StringType(), True),
                    T.StructField("description", T.StringType(), True),
                    T.StructField(
                        "format",
                        T.StructType(
                            [
                                T.StructField("provider", T.StringType(), True),
                                T.StructField(
                                    "options",
                                    T.MapType(T.StringType(), T.StringType()),
                                    True,
                                ),
                            ]
                        ),
                        True,
                    ),
                    T.StructField("schemaString", T.StringType(), True),
                    T.StructField(
                        "partitionColumns", T.ArrayType(T.StringType()), True
                    ),
                    T.StructField(
                        "configuration",
                        T.MapType(T.StringType(), T.StringType()),
                        True,
                    ),
                    T.StructField("createdTime", T.LongType(), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "add",
            T.StructType(
                [
                    T.StructField("path", T.StringType(), True),
                    T.StructField(
                        "partitionValues",
                        T.MapType(T.StringType(), T.StringType(), True),
                        True,
                    ),
                    T.StructField("size", T.LongType(), True),
                    T.StructField("modificationTime", T.LongType(), True),
                    T.StructField("dataChange", T.BooleanType(), True),
                    T.StructField("stats", T.StringType(), True),
                    T.StructField(
                        "tags", T.MapType(T.StringType(), T.StringType()), True
                    ),
                    T.StructField("deletionVector", _CP_DV_TYPE, True),
                ]
            ),
            True,
        ),
        T.StructField(
            "txn",
            T.StructType(
                [
                    T.StructField("appId", T.StringType(), True),
                    T.StructField("version", T.LongType(), True),
                    T.StructField("lastUpdated", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _cp_row(kind: str, payload: dict):
    """One checkpoint row: ``payload`` pruned to the _CP_SCHEMA fields of
    its action struct (unknown foreign keys cannot be carried in a typed
    parquet column), other action kinds null."""

    def prune(d, st):
        out = {}
        for f in st.fields:
            v = d.get(f.name)
            if v is not None and isinstance(f.dataType, T.StructType):
                v = prune(v, f.dataType)
            out[f.name] = v
        return out

    struct = prune(payload, _CP_SCHEMA[kind].dataType)
    return {k.name: (struct if k.name == kind else None) for k in _CP_SCHEMA}


def checkpoint_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> int:
    """Write a classic single-file parquet checkpoint of the snapshot at
    ``version`` (default: the latest commit) plus the ``_last_checkpoint``
    hint — the protocol's log-compaction device. Replay afterwards reads
    ONE pruned parquet + the JSON tail instead of every commit since table
    creation, and log-retention cleanup of commits at or before the
    checkpoint becomes protocol-legal (read_delta and delete_where_delta
    both already serve checkpoint-only logs).

    The checkpoint carries the replayed protocol, metaData, every
    setTransaction watermark (latest per appId — foreign streaming
    writers' idempotence keys) and every live add (including
    deletionVector descriptors — a DV'd table checkpoints and round-trips
    its deletes). Remove tombstones exist to fence
    concurrent-reader VACUUM races during the retention window; this
    single-writer implementation checkpoints a quiescent snapshot, so none
    are retained — absent removes replay as "nothing to tombstone" in any
    conformant reader. Scale shape: one createDataFrame of O(#live files)
    action rows written as one parquet — the same driver-side metadata
    bound as _replay itself."""
    import uuid

    if version is None:
        version = _latest_version(path)
        if version is None:
            raise ValueError(f"no Delta table at {path}")
    state = _replay(spark, path, version)
    rows = (
        [
            _cp_row(
                "protocol",
                state["protocol"]
                or {"minReaderVersion": 1, "minWriterVersion": 2},
            ),
            _cp_row("metaData", state["meta"]),
        ]
        # setTransaction watermarks MUST survive checkpointing (PROTOCOL.md
        # checkpoint contents; review r9): foreign streaming writers key
        # batch idempotence on them, and a checkpoint that dropped them
        # would make the docstring's "cleanup becomes protocol-legal"
        # silently false — a restarted foreign stream would re-append
        # already-committed batches.
        + [
            _cp_row("txn", t)
            for _, t in sorted(state["txns"].items())
        ]
        + [_cp_row("add", a) for a in state["files"].values()]
    )
    log = _log_dir(path)
    build = os.path.join(log, f".cp_build-{uuid.uuid4().hex[:8]}")
    spark.createDataFrame(rows, _CP_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(build)
    part = [f for f in os.listdir(build) if f.endswith(".parquet")][0]
    os.replace(
        os.path.join(build, part),
        os.path.join(log, f"{version:020d}.checkpoint.parquet"),
    )
    for leftover in os.listdir(build):
        os.remove(os.path.join(build, leftover))
    os.rmdir(build)
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": version, "size": len(rows)}, fh)
    return version
