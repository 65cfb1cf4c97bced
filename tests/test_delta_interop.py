"""Delta-log interop reader vs a hand-built spec-faithful ``_delta_log``.

The container has no Delta runtime, so the fixture writes the protocol
artifacts directly (newline-delimited JSON actions, 20-digit version names,
a parquet checkpoint of the action state) exactly as PROTOCOL.md documents
them — the test then proves snapshot reconstruction, time travel, partition
reconstitution, checkpoint-based replay and reader gating against that log.
"""

from __future__ import annotations

import datetime
import json
import os

import pytest

from gpu_telemetry_lakehouse_spark import delta_interop as DI


def _write_data(spark, table, rel, rows):
    path = os.path.join(table, rel)
    spark.createDataFrame(rows, "id int, v double").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


_SCHEMA_STR = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "integer", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
            {"name": "dt", "type": "date", "nullable": True, "metadata": {}},
        ],
    }
)


def _meta():
    return {
        "metaData": {
            "id": "11111111-2222-3333-4444-555555555555",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _SCHEMA_STR,
            "partitionColumns": ["dt"],
            "configuration": {},
        }
    }


def _add(rel, dt):
    return {
        "add": {
            "path": rel,
            "partitionValues": {"dt": dt},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }
    }


@pytest.fixture()
def delta_table(spark, tmp_path):
    t = str(tmp_path / "dtab")
    _write_data(spark, t, "dt=2024-01-01/f0.parquet", [(1, 1.5), (2, 2.5)])
    _write_data(spark, t, "dt=2024-01-02/f1.parquet", [(3, 3.5)])
    _write_data(spark, t, "dt=2024-01-01/f2.parquet", [(4, 4.5)])
    _write_data(spark, t, "dt=2024-01-02/f3.parquet", [(30, 30.5)])
    _commit(
        t,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(),
            _add("dt=2024-01-01/f0.parquet", "2024-01-01"),
            _add("dt=2024-01-02/f1.parquet", "2024-01-02"),
            {"commitInfo": {"operation": "WRITE"}},
        ],
    )
    _commit(
        t,
        1,
        [
            _add("dt=2024-01-01/f2.parquet", "2024-01-01"),
            {"commitInfo": {"operation": "WRITE"}},
        ],
    )
    _commit(
        t,
        2,
        [
            {
                "remove": {
                    "path": "dt=2024-01-02/f1.parquet",
                    "dataChange": True,
                }
            },
            _add("dt=2024-01-02/f3.parquet", "2024-01-02"),
            {"commitInfo": {"operation": "MERGE"}},
        ],
    )
    return t


def _rows(df):
    return sorted((r.id, r.v, str(r.dt)) for r in df.collect())


def test_delta_snapshot_and_time_travel(spark, delta_table):
    d0 = DI.read_delta(spark, delta_table, version=0)
    assert _rows(d0) == [
        (1, 1.5, "2024-01-01"),
        (2, 2.5, "2024-01-01"),
        (3, 3.5, "2024-01-02"),
    ]
    d1 = DI.read_delta(spark, delta_table, version=1)
    assert (4, 4.5, "2024-01-01") in _rows(d1) and len(_rows(d1)) == 4
    latest = DI.read_delta(spark, delta_table)
    assert _rows(latest) == [
        (1, 1.5, "2024-01-01"),
        (2, 2.5, "2024-01-01"),
        (4, 4.5, "2024-01-01"),
        (30, 30.5, "2024-01-02"),
    ]
    # partition column type reconstructed from the log, not the files
    assert dict(latest.dtypes)["dt"] == "date"
    assert latest.schema["dt"].dataType.typeName() == "date"
    assert isinstance(latest.collect()[0].dt, datetime.date)


def test_delta_checkpoint_replay(spark, delta_table):
    """A parquet checkpoint at v1 must shortcut replay (only v2's JSON is
    folded on top) and yield the identical snapshot."""
    before = _rows(DI.read_delta(spark, delta_table))
    # Build the v1 checkpoint the way a writer would: the action state at v1
    # as one parquet of action structs (absent kinds are null columns).
    state_actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta(),
        _add("dt=2024-01-01/f0.parquet", "2024-01-01"),
        _add("dt=2024-01-02/f1.parquet", "2024-01-02"),
        _add("dt=2024-01-01/f2.parquet", "2024-01-01"),
    ]
    log = os.path.join(delta_table, "_delta_log")
    # stage OUTSIDE _delta_log: underscore-prefixed paths are hidden to scans
    jl = os.path.join(delta_table, "cp_staging.jsonl")
    build = os.path.join(delta_table, "cp_build")
    with open(jl, "w") as fh:
        for a in state_actions:
            fh.write(json.dumps(a) + "\n")
    spark.read.json(jl).coalesce(1).write.mode("overwrite").parquet(build)
    part = [f for f in os.listdir(build) if f.endswith(".parquet")][0]
    os.replace(
        os.path.join(build, part),
        os.path.join(log, f"{1:020d}.checkpoint.parquet"),
    )
    os.remove(jl)
    # remove v0/v1 JSON: a checkpointed reader must not need them
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    after = _rows(DI.read_delta(spark, delta_table, version=2))
    assert after == before


def test_delta_reader_gating(spark, tmp_path):
    """Reader version 3 with ONLY implemented features (deletionVectors,
    columnMapping, v2Checkpoint, vacuumProtocolCheck, typeWidening,
    variantType) now reads; any unimplemented feature (shredded variants)
    and any reader version above 3 still fail loud."""
    t = str(tmp_path / "gated")
    _write_data(spark, t, "dt=2024-01-01/f0.parquet", [(1, 1.5)])
    proto_ok = {
        "protocol": {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
        }
    }
    _commit(t, 0, [proto_ok, _meta(), _add("dt=2024-01-01/f0.parquet", "2024-01-01")])
    assert DI.read_delta(spark, t).count() == 1

    # columnMapping as a declared FEATURE with mode unset reads fine now;
    # vacuumProtocolCheck has NO reader requirement per PROTOCOL.md, so a
    # table declaring it must stay readable
    proto_cm = {
        "protocol": {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": [
                "deletionVectors", "columnMapping", "vacuumProtocolCheck",
            ],
        }
    }
    t_cm = str(tmp_path / "gated_cm")
    _write_data(spark, t_cm, "dt=2024-01-01/f0.parquet", [(1, 1.5)])
    _commit(
        t_cm, 0, [proto_cm, _meta(), _add("dt=2024-01-01/f0.parquet", "2024-01-01")]
    )
    assert DI.read_delta(spark, t_cm).count() == 1

    for bad in (
        {"minReaderVersion": 3,
         "readerFeatures": ["deletionVectors", "variantShredding-preview"]},
        {"minReaderVersion": 3, "readerFeatures": ["variantShredding-preview"]},
        {"minReaderVersion": 4, "readerFeatures": []},
    ):
        t2 = str(tmp_path / f"gated_{bad.get('minReaderVersion')}_{len(bad['readerFeatures'])}")
        _write_data(spark, t2, "dt=2024-01-01/f0.parquet", [(1, 1.5)])
        _commit(t2, 0, [{"protocol": bad}, _meta(), _add("dt=2024-01-01/f0.parquet", "2024-01-01")])
        with pytest.raises(DI.UnsupportedDeltaFeature):
            DI.read_delta(spark, t2)


def test_delta_history(spark, delta_table):
    h = DI.delta_history(delta_table)
    assert [e["version"] for e in h] == [0, 1, 2]
    assert h[2]["operation"] == "MERGE"


def test_delta_empty_snapshot_keeps_schema(spark, tmp_path):
    """A version whose removes empty the table must read as a 0-row frame
    with the FULL logical schema (incl. partition columns) — downstream
    unions and joins must not see a schema change just because a purge
    landed."""
    t = str(tmp_path / "emptied")
    _write_data(spark, t, "dt=2024-01-01/f0.parquet", [(1, 1.5)])
    _commit(
        t,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(),
            _add("dt=2024-01-01/f0.parquet", "2024-01-01"),
        ],
    )
    _commit(
        t,
        1,
        [{"remove": {"path": "dt=2024-01-01/f0.parquet", "dataChange": True}}],
    )
    d = DI.read_delta(spark, t)
    assert d.count() == 0
    assert [f.name for f in d.schema.fields] == ["id", "v", "dt"]
    assert dict(d.dtypes)["dt"] == "date"


def test_delta_write_read_roundtrip(spark, tmp_path):
    """write_delta -> read_delta round-trip: partition columns live only in
    the log (data files must not contain them), appends create new versions
    visible to time travel, and double-create is refused."""
    t = str(tmp_path / "wtab")
    df = spark.createDataFrame(
        [(1, 1.5, "x"), (2, 2.5, "x"), (3, 3.5, "y")], "id int, v double, g string"
    )
    v0 = DI.write_delta(df, t, partition_by=["g"])
    assert v0 == 0
    back = DI.read_delta(spark, t)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # partition column only reconstituted from the log
    import glob

    data_files = [
        f
        for f in glob.glob(os.path.join(t, "**", "*.parquet"), recursive=True)
        if "_delta_log" not in f
    ]
    assert data_files
    raw = spark.read.parquet(*data_files)
    assert "g" not in raw.columns

    more = spark.createDataFrame([(4, 4.5, "y")], "id int, v double, g string")
    v1 = DI.append_delta(more, t)
    assert v1 == 1
    assert DI.read_delta(spark, t).count() == 4
    assert DI.read_delta(spark, t, version=0).count() == 3
    assert [e["version"] for e in DI.delta_history(t)] == [0, 1]

    with pytest.raises(ValueError):
        DI.write_delta(df, t)


def test_delta_tablog_export_roundtrip(spark, tmp_path):
    """The outbound interop chain: a tablog snapshot exported via
    write_delta reads back identically through the Delta protocol —
    any Delta-native engine can consume the warehouse."""
    from gpu_telemetry_lakehouse_spark import tablog as TL

    src = str(tmp_path / "native")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)], "k int, g string, v double"
    )
    TL.create_table(df, src)
    snap = TL.read(spark, src)
    out = str(tmp_path / "delta_export")
    DI.write_delta(snap, out, partition_by=["g"])
    back = DI.read_delta(spark, out).select("k", "g", "v")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, snap.collect()))


def test_delta_partition_value_encoding_roundtrip(spark, tmp_path):
    """Hive-layout partition values survive write_delta -> read_delta for
    the hostile cases: spaces, '=', '/', '%', unicode, and NULL (the
    __HIVE_DEFAULT_PARTITION__ sentinel must come back as NULL, not as the
    sentinel string)."""
    t = str(tmp_path / "enc")
    vals = ["plain", "with space", "a=b", "a/b", "100%", "naïve", None]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id int, g string")
    DI.write_delta(df, t, partition_by=["g"])
    back = sorted(
        ((r.id, r.g) for r in DI.read_delta(spark, t).collect()),
        key=lambda x: x[0],
    )
    assert back == rows


def test_delta_column_mapping_missing_metadata_fails_loud(spark, tmp_path):
    """Column mapping enabled but the schemaString carries no
    delta.columnMapping.physicalName metadata: the physical parquet column
    cannot be resolved — refuse loudly, never read by logical name (which
    would return all-NULL columns)."""
    t = str(tmp_path / "colmap")
    _write_data(spark, t, "dt=2024-01-01/f0.parquet", [(1, 1.5)])
    meta = _meta()
    meta["metaData"]["configuration"] = {"delta.columnMapping.mode": "name"}
    _commit(
        t,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            meta,
            _add("dt=2024-01-01/f0.parquet", "2024-01-01"),
        ],
    )
    with pytest.raises(DI.UnsupportedDeltaFeature, match="physicalName"):
        DI.read_delta(spark, t)
    # a mode the protocol does not define is refused at replay
    meta2 = _meta()
    meta2["metaData"]["configuration"] = {"delta.columnMapping.mode": "bogus"}
    _commit(t, 1, [meta2])
    with pytest.raises(DI.UnsupportedDeltaFeature, match="bogus"):
        DI.read_delta(spark, t)


def test_delta_log_gap_fails_loud(spark, delta_table):
    """A missing version below the replay target without a covering
    checkpoint (vacuumed log, torn copy) must raise — silently skipping it
    would reconstruct a wrong partial snapshot."""
    log = os.path.join(delta_table, "_delta_log")
    os.remove(os.path.join(log, f"{1:020d}.json"))
    with pytest.raises(ValueError, match="gap"):
        DI.read_delta(spark, delta_table)


def test_delta_multipart_checkpoint_replay(spark, delta_table):
    """Classic multi-part checkpoints (<v>.checkpoint.<part>.<n>.parquet)
    must replay like single-file ones; an INCOMPLETE part set must be
    ignored (falling back to JSON replay), never half-applied.

    The parts deliberately have DIVERGENT schemas — part 1 carries only
    protocol/metaData rows, part 2 only add rows — because foreign writers
    emit exactly that, and single-file schema inference would silently
    drop the 'add' column and reconstruct an empty table."""
    before = _rows(DI.read_delta(spark, delta_table))
    log = os.path.join(delta_table, "_delta_log")
    part1 = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta(),
    ]
    part2 = [
        _add("dt=2024-01-01/f0.parquet", "2024-01-01"),
        _add("dt=2024-01-02/f1.parquet", "2024-01-02"),
        _add("dt=2024-01-01/f2.parquet", "2024-01-01"),
    ]
    for i, actions in enumerate((part1, part2), start=1):
        jl = os.path.join(delta_table, f"cp_stage_{i}.jsonl")
        build = os.path.join(delta_table, f"cp_build_{i}")
        with open(jl, "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")
        spark.read.json(jl).coalesce(1).write.mode("overwrite").parquet(build)
        part = [f for f in os.listdir(build) if f.endswith(".parquet")][0]
        os.replace(
            os.path.join(build, part),
            os.path.join(
                log, f"{1:020d}.checkpoint.{i:010d}.{2:010d}.parquet"
            ),
        )
        os.remove(jl)
    # incomplete part set first: only part 1 of 2 present -> must fall back
    # to the JSON tail (which still exists) and read correctly
    one = os.path.join(log, f"{1:020d}.checkpoint.{1:010d}.{2:010d}.parquet")
    two = os.path.join(log, f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet")
    hidden = two + ".hidden"
    os.replace(two, hidden)
    assert _rows(DI.read_delta(spark, delta_table, version=2)) == before
    # torn set {2,3} of n=2 (part 1 lost, a retry left a stray part 3):
    # count matches n but the numbers are not 1..n -> must be ignored too
    stray = os.path.join(log, f"{1:020d}.checkpoint.{3:010d}.{2:010d}.parquet")
    os.replace(one, stray)
    os.replace(hidden, two)
    assert _rows(DI.read_delta(spark, delta_table, version=2)) == before
    # complete part set: v0/v1 JSON removed, replay must come from the parts
    os.replace(stray, one)
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    assert _rows(DI.read_delta(spark, delta_table, version=2)) == before


def test_delta_many_partitions_single_scan(spark, tmp_path):
    """Above _MAX_LITERAL_GROUPS distinct partition tuples the reader must
    keep the plan constant-size (one scan + broadcast partition-value join),
    not one union branch per partition — and still reconstruct every
    partition value exactly."""
    t = str(tmp_path / "manyparts")
    n = DI._MAX_LITERAL_GROUPS + 16
    rows = [(i, float(i), f"g{i:04d}") for i in range(n)]
    # hostile partition value: the URI-vs-path encoding divergence cases
    # (space, %, =, +) must survive the decoded-path join too
    rows.append((n, float(n), "a b%c=+d"))
    df = spark.createDataFrame(rows, "id int, v double, g string")
    DI.write_delta(df, t, partition_by=["g"])
    back = DI.read_delta(spark, t)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    plan = back._jdf.queryExecution().executedPlan().toString()
    # one multi-path scan + broadcast join, never a partition-count union
    assert "Union" not in plan, plan[:2000]
    assert "FileScan parquet" in plan and "BroadcastHashJoin" in plan


def test_deletion_vector_binary_roundtrip():
    """deletion_vectors.py round-trips the public binary format across
    container kinds (array, bitmap, multi-key, multi-bitmap/64-bit) and
    both storage encodings (sidecar file descriptor, inline Z85)."""
    import random

    from gpu_telemetry_lakehouse_spark import deletion_vectors as dv

    rnd = random.Random(42)
    for n in (4, 16, 32):
        b = bytes(rnd.randrange(256) for _ in range(n))
        assert dv.z85_decode(dv.z85_encode(b)) == b
    cases = [
        [0],
        [1, 5, 9],
        list(range(7000)),  # bitmap container (cardinality > 4096)
        sorted(rnd.sample(range(200_000), 5000)),  # multi-key arrays
        sorted(rnd.sample(range(1 << 33), 3000)),  # spans two 32-bit bitmaps
        [65535, 65536, (1 << 32) - 1, 1 << 32, (1 << 32) + 7],  # boundaries
    ]
    for ix in cases:
        assert dv.parse_bitmap_array(dv.serialize_bitmap_array(ix)) == sorted(set(ix))


def test_deletion_vector_descriptor_roundtrip(tmp_path):
    import random

    from gpu_telemetry_lakehouse_spark import deletion_vectors as dv

    rnd = random.Random(7)
    ix = sorted(rnd.sample(range(100_000), 1234))
    desc = dv.write_dv_file(str(tmp_path), ix)
    assert desc["storageType"] == "u" and desc["cardinality"] == len(ix)
    assert dv.read_dv_descriptor(str(tmp_path), desc) == ix
    # inline variant: pathOrInlineDv IS the Z85 of the bitmap bytes
    data = dv.serialize_bitmap_array(ix)
    pad = (-len(data)) % 4
    inline = {
        "storageType": "i",
        "pathOrInlineDv": dv.z85_encode(data + b"\x00" * pad),
        "sizeInBytes": len(data),
        "cardinality": len(ix),
    }
    assert dv.read_dv_descriptor(str(tmp_path), inline) == ix
    # corrupted checksum fails loud, never un-deletes rows silently
    import os as _os
    import struct

    fname = [f for f in _os.listdir(tmp_path) if f.startswith("deletion_vector_")][0]
    p = str(tmp_path / fname)
    raw = bytearray(open(p, "rb").read())
    raw[-1] ^= 0xFF
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum"):
        dv.read_dv_descriptor(str(tmp_path), desc)


def test_delta_deletion_vector_read(spark, tmp_path):
    """A DV-bearing snapshot (VERDICT r7 #6): delete_where_delta attaches
    protocol-conformant deletionVector descriptors; read_delta anti-joins
    the positions away on BOTH scan paths, and time travel to the pre-delete
    version still sees every row."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "dvtab")
    df = spark.range(0, 100).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 3).cast("string").alias("grp"),
        (F.col("id") * 1.5).alias("v"),
    )
    DI.write_delta(df, t, partition_by=["grp"])
    v1 = DI.delete_where_delta(spark, t, "id % 10 = 0")
    assert v1 == 1
    d = DI.read_delta(spark, t)
    assert d.count() == 90 and d.filter("id % 10 = 0").count() == 0
    assert DI.read_delta(spark, t, version=0).count() == 100
    # second delete UNIONS with the files' existing DVs (id=20 is already
    # gone: deleting it again must stay idempotent)
    v2 = DI.delete_where_delta(spark, t, "id = 13 OR id = 20")
    d2 = DI.read_delta(spark, t)
    assert d2.count() == 89
    assert sorted(r.id for r in d2.filter("id < 25").collect()) == [
        1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 12, 14, 15, 16, 17, 18, 19, 21, 22, 23, 24,
    ]
    # zero-match predicate: no commit minted
    assert DI.delete_where_delta(spark, t, "id = -1") == v2
    # the upgraded protocol is what a conformant reader requires
    log0 = DI.delta_history(t)
    assert [e["version"] for e in log0] == [0, 1, 2]


def test_delta_deletion_vector_joined_path(spark, tmp_path):
    """DV anti-join on the >_MAX_LITERAL_GROUPS one-scan+broadcast path."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "dvmany")
    n_groups = DI._MAX_LITERAL_GROUPS + 10
    df = spark.range(0, 2 * n_groups).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % n_groups).cast("string").alias("grp"),
        F.lit(1.0).alias("v"),
    )
    DI.write_delta(df, t, partition_by=["grp"])
    DI.delete_where_delta(spark, t, "id < 20")
    d = DI.read_delta(spark, t)
    assert d.count() == 2 * n_groups - 20 and d.filter("id < 20").count() == 0
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan


def test_delta_checkpoint_only_log(spark, delta_table):
    """ADVICE r7: a protocol-legal checkpoint-only log (retention expired
    every commit json at or before the checkpoint) must serve the snapshot
    from the newest complete checkpoint instead of raising."""
    before = _rows(DI.read_delta(spark, delta_table, version=1))
    state_actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta(),
        _add("dt=2024-01-01/f0.parquet", "2024-01-01"),
        _add("dt=2024-01-02/f1.parquet", "2024-01-02"),
        _add("dt=2024-01-01/f2.parquet", "2024-01-01"),
    ]
    log = os.path.join(delta_table, "_delta_log")
    jl = os.path.join(delta_table, "cp_staging.jsonl")
    build = os.path.join(delta_table, "cp_build")
    with open(jl, "w") as fh:
        for a in state_actions:
            fh.write(json.dumps(a) + "\n")
    spark.read.json(jl).coalesce(1).write.mode("overwrite").parquet(build)
    part = [f for f in os.listdir(build) if f.endswith(".parquet")][0]
    os.replace(
        os.path.join(build, part),
        os.path.join(log, f"{1:020d}.checkpoint.parquet"),
    )
    for v in (0, 1, 2):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    assert _rows(DI.read_delta(spark, delta_table)) == before
    # an explicit version NEWER than the checkpoint still fails loud: its
    # commit json is genuinely gone
    with pytest.raises(ValueError, match="gap"):
        DI.read_delta(spark, delta_table, version=2)


def test_delta_partition_lookup_miss_fails_loud(spark, tmp_path, monkeypatch):
    """ADVICE r7: on the one-scan path, a file-path normalization miss must
    raise, not return silently-NULL partition columns."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "misstab")
    n_groups = DI._MAX_LITERAL_GROUPS + 10
    df = spark.range(0, n_groups).select(
        F.col("id").cast("int").alias("id"),
        F.col("id").cast("string").alias("grp"),
        F.lit(1.0).alias("v"),
    )
    DI.write_delta(df, t, partition_by=["grp"])
    assert DI.read_delta(spark, t).count() == n_groups  # healthy join
    # simulate the miss: break the scan-side normalization
    monkeypatch.setattr(
        DI, "_decoded_path_expr", lambda col: F.lit("/nowhere/else.parquet")
    )
    with pytest.raises(Exception, match="partition lookup missed"):
        DI.read_delta(spark, t).collect()


def test_delta_dv_delete_review_contracts(spark, tmp_path):
    """r8 review findings pinned: dataChange=true on DV-delete actions
    (incremental consumers must NOT skip the commit), protocol MERGE keeps
    pre-existing features + legacy-implied writer features, re-running a
    delete whose rows are already dead mints NO new version, and a table
    whose snapshot has zero live files returns without a commit."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "dvrev")
    df = spark.range(0, 40).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 2).cast("string").alias("grp"),
        F.lit(1.0).alias("v"),
    )
    DI.write_delta(df, t, partition_by=["grp"])
    # declare an extra reader feature the reader supports (timestampNtz)
    _commit(
        t,
        1,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["timestampNtz"],
                    "writerFeatures": ["appendOnly"],
                }
            },
            {"commitInfo": {"operation": "UPGRADE"}},
        ],
    )
    v = DI.delete_where_delta(spark, t, "id < 4")
    assert v == 2
    with open(os.path.join(t, "_delta_log", f"{v:020d}.json")) as fh:
        acts = [json.loads(line) for line in fh if line.strip()]
    proto = [a["protocol"] for a in acts if "protocol" in a][0]
    assert "timestampNtz" in proto["readerFeatures"]  # merged, not clobbered
    assert "deletionVectors" in proto["readerFeatures"]
    assert {"appendOnly", "deletionVectors"} <= set(proto["writerFeatures"])
    for a in acts:
        if "add" in a:
            assert a["add"]["dataChange"] is True
        if "remove" in a:
            assert a["remove"]["dataChange"] is True
    assert DI.read_delta(spark, t).count() == 36
    # re-delete of already-dead rows: no new version
    assert DI.delete_where_delta(spark, t, "id < 4") == v
    # partial overlap still unions correctly
    v2 = DI.delete_where_delta(spark, t, "id < 6")
    assert v2 == v + 1 and DI.read_delta(spark, t).count() == 34


def test_delta_dv_delete_empty_snapshot_no_commit(spark, tmp_path):
    t = str(tmp_path / "dvempty")
    _write_data(spark, t, "dt=2024-01-01/f0.parquet", [(1, 1.5)])
    _commit(
        t,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(),
            _add("dt=2024-01-01/f0.parquet", "2024-01-01"),
        ],
    )
    _commit(
        t, 1, [{"remove": {"path": "dt=2024-01-01/f0.parquet", "dataChange": True}}]
    )
    assert DI.delete_where_delta(spark, t, "id = 1") == 1  # no crash, no commit
    assert DI.delta_history(t)[-1]["version"] == 1


def test_delta_dv_delete_many_partitions_single_scan(spark, tmp_path):
    """The delete matcher keeps a constant-size plan above the literal-
    groups cap (one scan + broadcast partition lookup, not a union branch
    per partition tuple) and the predicate may reference partition cols."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "dvmanydel")
    n_groups = DI._MAX_LITERAL_GROUPS + 12
    df = spark.range(0, 2 * n_groups).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % n_groups).cast("string").alias("grp"),
        F.lit(1.0).alias("v"),
    )
    DI.write_delta(df, t, partition_by=["grp"])
    DI.delete_where_delta(spark, t, "grp = '3' OR id = 10")
    d = DI.read_delta(spark, t)
    assert d.count() == 2 * n_groups - 3  # grp=3 has ids {3, 3+n}; id=10
    assert d.filter("grp = '3'").count() == 0 and d.filter("id = 10").count() == 0


def _write_file(spark, table, rel, rows):
    """Write rows as ONE parquet file at exactly ``table/rel`` (the DV read
    path joins on the true scanned file path, so the logged add.path must
    be the data file itself, not a directory of part files)."""
    import shutil

    stage = os.path.join(table, "__stage__")
    spark.createDataFrame(rows, "id int, v double").coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    dest = os.path.join(table, rel)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    os.replace(os.path.join(stage, part), dest)
    shutil.rmtree(stage)


def _inline_dv(positions):
    """Protocol inline-storage DV descriptor over the given row positions."""
    from gpu_telemetry_lakehouse_spark import deletion_vectors as dvmod

    data = dvmod.serialize_bitmap_array(sorted(positions))
    pad = (-len(data)) % 4
    return {
        "storageType": "i",
        "pathOrInlineDv": dvmod.z85_encode(data + b"\x00" * pad),
        "sizeInBytes": len(data),
        "cardinality": len(positions),
    }


_DV_PROTO = {
    "protocol": {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }
}


def test_delta_fold_dv_update_order_independent(spark, tmp_path):
    """ADVICE r8 (medium): a foreign commit that updates a file's DV may
    serialize add(path, newDV) BEFORE remove(path, oldDV) — an intra-commit
    order the protocol does not constrain. Path-only-keyed reconciliation
    popped the fresh add and the file silently vanished; (path, dvId)
    keying makes the two actions commute."""
    t = str(tmp_path / "dvorder")
    _write_file(spark, t, "dt=2024-01-01/f0.parquet", [(1, 1.5), (2, 2.5), (3, 3.5)])
    dv1, dv2 = _inline_dv([0]), _inline_dv([1])
    a1 = _add("dt=2024-01-01/f0.parquet", "2024-01-01")
    a1["add"]["deletionVector"] = dv1
    _commit(t, 0, [_DV_PROTO, _meta(), a1])
    a2 = _add("dt=2024-01-01/f0.parquet", "2024-01-01")
    a2["add"]["deletionVector"] = dv2
    _commit(
        t,
        1,
        [
            a2,  # add FIRST — the hostile ordering
            {
                "remove": {
                    "path": "dt=2024-01-01/f0.parquet",
                    "dataChange": True,
                    "deletionVector": dv1,
                }
            },
        ],
    )
    d = DI.read_delta(spark, t)
    assert sorted(r.id for r in d.collect()) == [1, 3]  # newDV (pos 1) applied
    # time travel to v0 applies the OLD dv
    assert sorted(r.id for r in DI.read_delta(spark, t, version=0).collect()) == [2, 3]


def test_delta_duplicate_live_path_fails_loud(spark, tmp_path):
    """A nonconformant writer that re-logs a DV'd add WITHOUT removing the
    superseded (path, oldDV) logical file leaves the same physical path
    live twice — a conformant scan would silently duplicate rows; replay
    must refuse the snapshot instead."""
    t = str(tmp_path / "dvdup")
    _write_file(spark, t, "dt=2024-01-01/f0.parquet", [(1, 1.5), (2, 2.5)])
    a1 = _add("dt=2024-01-01/f0.parquet", "2024-01-01")
    a1["add"]["deletionVector"] = _inline_dv([0])
    _commit(t, 0, [_DV_PROTO, _meta(), a1])
    a2 = _add("dt=2024-01-01/f0.parquet", "2024-01-01")
    a2["add"]["deletionVector"] = _inline_dv([1])
    _commit(t, 1, [a2])  # no remove of (path, dv1) — writer bug
    with pytest.raises(ValueError, match="live under two"):
        DI.read_delta(spark, t)


def test_delta_dv_tombstone_carries_superseded_descriptor(spark, tmp_path):
    """ADVICE r8 (high): when delete_where_delta replaces a file's DV, the
    remove tombstone must carry the superseded descriptor — reconciliation
    keys logical files by (path, dvId), so a bare remove(path) would leave
    BOTH adds live for a conformant reader (the file scanned twice)."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "dvtomb")
    df = spark.range(0, 30).select(
        F.col("id").cast("int").alias("id"), F.lit(1.0).alias("v")
    ).coalesce(1)  # ONE data file so both deletes hit the same file
    DI.write_delta(df, t)
    v1 = DI.delete_where_delta(spark, t, "id = 3")
    v2 = DI.delete_where_delta(spark, t, "id = 7")  # same file, second DV
    with open(os.path.join(t, "_delta_log", f"{v1:020d}.json")) as fh:
        first = [json.loads(line) for line in fh if line.strip()]
    with open(os.path.join(t, "_delta_log", f"{v2:020d}.json")) as fh:
        second = [json.loads(line) for line in fh if line.strip()]
    prev_dv = [a["add"]["deletionVector"] for a in first if "add" in a][0]
    removes = [a["remove"] for a in second if "remove" in a]
    assert len(removes) == 1 and removes[0]["deletionVector"] == prev_dv
    # the first delete's tombstone has no DV (the file had none yet)
    first_removes = [a["remove"] for a in first if "remove" in a]
    assert len(first_removes) == 1 and "deletionVector" not in first_removes[0]
    # (path, dvId)-keyed replay reconstructs exactly one live logical file
    assert sorted(r.id for r in DI.read_delta(spark, t).collect()) == sorted(
        set(range(30)) - {3, 7}
    )


def test_delta_dv_delete_checkpoint_only_log(spark, tmp_path):
    """ADVICE r8 (low): delete_where_delta on a checkpoint-only log (every
    commit json expired) resolves the snapshot from the newest complete
    checkpoint and commits as checkpoint_version + 1, mirroring read_delta."""
    t = str(tmp_path / "cpdel")
    _write_file(spark, t, "dt=2024-01-01/f0.parquet", [(1, 1.5), (2, 2.5)])
    _write_file(spark, t, "dt=2024-01-01/f2.parquet", [(4, 4.5)])
    _commit(
        t,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(),
            _add("dt=2024-01-01/f0.parquet", "2024-01-01"),
        ],
    )
    _commit(t, 1, [_add("dt=2024-01-01/f2.parquet", "2024-01-01")])
    state_actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta(),
        _add("dt=2024-01-01/f0.parquet", "2024-01-01"),
        _add("dt=2024-01-01/f2.parquet", "2024-01-01"),
    ]
    log = os.path.join(t, "_delta_log")
    jl = os.path.join(t, "cp_staging.jsonl")
    build = os.path.join(t, "cp_build")
    with open(jl, "w") as fh:
        for a in state_actions:
            fh.write(json.dumps(a) + "\n")
    spark.read.json(jl).coalesce(1).write.mode("overwrite").parquet(build)
    part = [f for f in os.listdir(build) if f.endswith(".parquet")][0]
    os.replace(
        os.path.join(build, part),
        os.path.join(log, f"{1:020d}.checkpoint.parquet"),
    )
    for v in (0, 1):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    v = DI.delete_where_delta(spark, t, "id = 1")
    assert v == 2  # checkpoint version 1 + 1
    d = DI.read_delta(spark, t)
    assert sorted(r.id for r in d.collect()) == [2, 4]


def test_dv_descriptor_missing_fields_fail_loud(tmp_path):
    """ADVICE r8 (low): a sidecar descriptor missing the nominally-optional
    offset (or sizeInBytes) raises a diagnosed ValueError, not a KeyError."""
    from gpu_telemetry_lakehouse_spark import deletion_vectors as dvmod

    desc = dvmod.write_dv_file(str(tmp_path), [1, 5, 9])
    for drop in ("offset", "sizeInBytes", "pathOrInlineDv"):
        broken = {k: v for k, v in desc.items() if k != drop}
        with pytest.raises(ValueError, match=f"missing required.*{drop}"):
            dvmod.read_dv_descriptor(str(tmp_path), broken)
    inline = {"storageType": "i", "pathOrInlineDv": "abcde"}
    with pytest.raises(ValueError, match="missing required.*sizeInBytes"):
        dvmod.read_dv_descriptor(str(tmp_path), inline)


# --- column mapping (name + id modes) ----------------------------------------


def _cm_schema_str():
    """Logical schema whose fields carry columnMapping metadata (the shape
    delta-spark writes: physical col-<uuid> names + stable field ids)."""
    def fld(name, typ, fid, phys):
        return {
            "name": name,
            "type": typ,
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": fid,
                "delta.columnMapping.physicalName": phys,
            },
        }

    return json.dumps(
        {
            "type": "struct",
            "fields": [
                fld("id", "integer", 1, "col-aaa"),
                fld("v", "double", 2, "col-bbb"),
                fld("dt", "date", 3, "col-ccc"),
            ],
        }
    )


def _cm_meta(mode):
    return {
        "metaData": {
            "id": "99999999-8888-7777-6666-555555555555",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _cm_schema_str(),
            "partitionColumns": ["dt"],
            "configuration": {
                "delta.columnMapping.mode": mode,
                "delta.columnMapping.maxColumnId": "3",
            },
        }
    }


def _write_phys_file(table, rel, rows, names=("col-aaa", "col-bbb"), ids=(1, 2)):
    """One parquet file with PHYSICAL column names and parquet field ids
    (pyarrow maps the PARQUET:field_id field-metadata key to the parquet
    schema's field_id on write) — what a column-mapping writer produces."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fields = [
        pa.field(names[0], pa.int32(), metadata={b"PARQUET:field_id": str(ids[0]).encode()}),
        pa.field(names[1], pa.float64(), metadata={b"PARQUET:field_id": str(ids[1]).encode()}),
    ]
    t = pa.table(
        [pa.array([r[0] for r in rows], pa.int32()),
         pa.array([r[1] for r in rows], pa.float64())],
        schema=pa.schema(fields),
    )
    dest = os.path.join(table, rel)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    pq.write_table(t, dest)


def _cm_add(rel, dt):
    # partitionValues tracked under the PHYSICAL name, per PROTOCOL.md
    return {
        "add": {
            "path": rel,
            "partitionValues": {"col-ccc": dt},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }
    }


def test_delta_column_mapping_name_mode(spark, tmp_path):
    """name mode: parquet columns resolve by delta.columnMapping.physicalName
    and come back under logical names; partition values are looked up under
    their physical key and reconstituted with the logical type."""
    t = str(tmp_path / "cmname")
    _write_phys_file(t, "part-0.parquet", [(1, 1.5), (2, 2.5)])
    _write_phys_file(t, "part-1.parquet", [(3, 3.5)])
    _commit(
        t,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _cm_meta("name"),
            _cm_add("part-0.parquet", "2024-01-01"),
            _cm_add("part-1.parquet", "2024-01-02"),
        ],
    )
    d = DI.read_delta(spark, t)
    assert d.columns == ["id", "v", "dt"]
    assert _rows(d) == [
        (1, 1.5, "2024-01-01"),
        (2, 2.5, "2024-01-01"),
        (3, 3.5, "2024-01-02"),
    ]
    assert d.schema["dt"].dataType.typeName() == "date"
    # predicate on a LOGICAL name still prunes/filters correctly
    assert d.filter("id = 3").count() == 1


def test_delta_column_mapping_id_mode(spark, tmp_path):
    """id mode: resolution is by parquet field id — the file's column NAMES
    deliberately match neither logical nor physicalName, so only field-id
    matching can produce these values."""
    t = str(tmp_path / "cmid")
    _write_phys_file(t, "part-0.parquet", [(7, 7.5), (8, 8.5)], names=("x1", "x2"))
    _commit(
        t,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _cm_meta("id"),
            _cm_add("part-0.parquet", "2024-03-01"),
        ],
    )
    d = DI.read_delta(spark, t)
    assert d.columns == ["id", "v", "dt"]
    assert _rows(d) == [(7, 7.5, "2024-03-01"), (8, 8.5, "2024-03-01")]


def test_delta_column_mapping_dv_delete(spark, tmp_path):
    """delete_where_delta on a column-mapped table: the matcher scans with
    the physical schema, binds the predicate to logical names, and the DV
    round-trips through read_delta."""
    t = str(tmp_path / "cmdel")
    _write_phys_file(t, "part-0.parquet", [(1, 1.5), (2, 2.5), (3, 3.5)])
    _commit(
        t,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _cm_meta("name"),
            _cm_add("part-0.parquet", "2024-01-01"),
        ],
    )
    v = DI.delete_where_delta(spark, t, "id = 2 AND dt = DATE'2024-01-01'")
    assert v == 1
    assert sorted(r.id for r in DI.read_delta(spark, t).collect()) == [1, 3]
    # time travel to v0 still sees the full file
    assert DI.read_delta(spark, t, version=0).count() == 3


def test_delta_column_mapping_joined_path(spark, tmp_path):
    """Column mapping on the >_MAX_LITERAL_GROUPS one-scan+broadcast path:
    physical->logical rename composes with the partition-value join."""
    n = DI._MAX_LITERAL_GROUPS + 5
    t = str(tmp_path / "cmmany")
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        _cm_meta("name"),
    ]
    for i in range(n):
        rel = f"part-{i}.parquet"
        _write_phys_file(t, rel, [(i, float(i))])
        actions.append(_cm_add(rel, f"2024-{(i // 28) + 1:02d}-{(i % 28) + 1:02d}"))
    _commit(t, 0, actions)
    d = DI.read_delta(spark, t)
    assert d.columns == ["id", "v", "dt"]
    assert d.count() == n
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert d.filter("id = 40").select("v").collect()[0][0] == 40.0


# --- V2 checkpoints (PROTOCOL.md "V2 Checkpoints") ---------------------------


def _v1_state_actions():
    """The action state of the delta_table fixture at version 1."""
    return [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta(),
        _add("dt=2024-01-01/f0.parquet", "2024-01-01"),
        _add("dt=2024-01-02/f1.parquet", "2024-01-02"),
        _add("dt=2024-01-01/f2.parquet", "2024-01-01"),
    ]


def _write_actions_parquet(spark, table, actions, dest):
    """Stage a list of action dicts as ONE parquet file at ``dest`` (the
    shape a checkpoint/sidecar writer produces: struct columns per action
    kind, nulls marking absent kinds)."""
    jl = os.path.join(table, "v2_staging.jsonl")
    build = os.path.join(table, "v2_build")
    with open(jl, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    spark.read.json(jl).coalesce(1).write.mode("overwrite").parquet(build)
    part = [f for f in os.listdir(build) if f.endswith(".parquet")][0]
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    os.replace(os.path.join(build, part), dest)
    os.remove(jl)


def test_delta_v2_checkpoint_json_inline(spark, delta_table):
    """A v2 JSON checkpoint (<v>.checkpoint.<uuid>.json) with inline file
    actions must shortcut replay exactly like a classic parquet one."""
    before = _rows(DI.read_delta(spark, delta_table))
    log = os.path.join(delta_table, "_delta_log")
    cp = os.path.join(log, f"{1:020d}.checkpoint.80a083e8-7026.json")
    with open(cp, "w") as fh:
        fh.write(json.dumps({"checkpointMetadata": {"version": 1}}) + "\n")
        for a in _v1_state_actions():
            fh.write(json.dumps(a) + "\n")
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    assert _rows(DI.read_delta(spark, delta_table, version=2)) == before
    # checkpoint-only log (v2 json also expired): v1 snapshot still serves
    os.remove(os.path.join(log, f"{2:020d}.json"))
    assert {r.id for r in DI.read_delta(spark, delta_table).collect()} == {
        1, 2, 3, 4,
    }


def test_delta_v2_checkpoint_parquet_sidecars(spark, delta_table):
    """A v2 parquet checkpoint whose file actions are offloaded to TWO
    sidecar parquet files under _delta_log/_sidecars/ must replay the same
    snapshot; the top-level carries only checkpointMetadata/protocol/
    metaData/sidecar."""
    before = _rows(DI.read_delta(spark, delta_table))
    log = os.path.join(delta_table, "_delta_log")
    state = _v1_state_actions()
    _write_actions_parquet(
        spark, delta_table, state[2:4],
        os.path.join(log, "_sidecars", "sc-aaa.parquet"),
    )
    _write_actions_parquet(
        spark, delta_table, state[4:],
        os.path.join(log, "_sidecars", "sc-bbb.parquet"),
    )
    top = [
        {"checkpointMetadata": {"version": 1}},
        state[0],
        state[1],
        {"sidecar": {"path": "sc-aaa.parquet", "sizeInBytes": 1}},
        {"sidecar": {"path": "sc-bbb.parquet", "sizeInBytes": 1}},
    ]
    _write_actions_parquet(
        spark, delta_table, top,
        os.path.join(log, f"{1:020d}.checkpoint.5fba94ed-2d8c.parquet"),
    )
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    assert _rows(DI.read_delta(spark, delta_table, version=2)) == before


def test_delta_v2_checkpoint_version_mismatch_fails_loud(spark, delta_table):
    """checkpointMetadata.version disagreeing with the file name means a
    torn/misnamed checkpoint — replay must refuse, not reconstruct."""
    log = os.path.join(delta_table, "_delta_log")
    cp = os.path.join(log, f"{1:020d}.checkpoint.bad0bad0.json")
    with open(cp, "w") as fh:
        fh.write(json.dumps({"checkpointMetadata": {"version": 7}}) + "\n")
        for a in _v1_state_actions():
            fh.write(json.dumps(a) + "\n")
    os.remove(os.path.join(log, f"{0:020d}.json"))
    with pytest.raises(ValueError, match="names version 7"):
        DI.read_delta(spark, delta_table, version=2)
    # and a checkpoint with NO checkpointMetadata at all is equally torn
    with open(cp, "w") as fh:
        for a in _v1_state_actions():
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(ValueError, match="checkpointMetadata"):
        DI.read_delta(spark, delta_table, version=2)


def test_delta_v2_checkpoint_missing_sidecar_fails_loud(spark, delta_table):
    """A sidecar action pointing at an absent file must refuse to replay —
    a partial snapshot is silent data loss."""
    log = os.path.join(delta_table, "_delta_log")
    cp = os.path.join(log, f"{1:020d}.checkpoint.cafe0001.json")
    with open(cp, "w") as fh:
        fh.write(json.dumps({"checkpointMetadata": {"version": 1}}) + "\n")
        fh.write(json.dumps(_v1_state_actions()[0]) + "\n")
        fh.write(json.dumps(_v1_state_actions()[1]) + "\n")
        fh.write(
            json.dumps({"sidecar": {"path": "gone.parquet", "sizeInBytes": 1}})
            + "\n"
        )
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    with pytest.raises(ValueError, match="sidecar missing"):
        DI.read_delta(spark, delta_table, version=2)


def test_delta_v2_checkpoint_reader_feature_accepted(spark, delta_table):
    """protocol readerFeatures=[v2Checkpoint] at minReaderVersion 3 is now
    a supported capability, not an UnsupportedDeltaFeature."""
    before = _rows(DI.read_delta(spark, delta_table))
    log = os.path.join(delta_table, "_delta_log")
    cp = os.path.join(log, f"{1:020d}.checkpoint.feat0001.json")
    actions = _v1_state_actions()
    actions[0] = {
        "protocol": {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["v2Checkpoint"],
            "writerFeatures": ["v2Checkpoint"],
        }
    }
    with open(cp, "w") as fh:
        fh.write(json.dumps({"checkpointMetadata": {"version": 1}}) + "\n")
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    assert _rows(DI.read_delta(spark, delta_table, version=2)) == before


def test_delta_checkpoint_writer_roundtrip(spark, tmp_path):
    """checkpoint_delta writes a classic parquet checkpoint + _last_checkpoint
    that (a) serves a checkpoint-only log, (b) carries live DV descriptors
    so deletes survive log cleanup, (c) composes with a later JSON tail."""
    t = str(tmp_path / "cpw")
    df = spark.createDataFrame(
        [(i, float(i), f"d{i % 2}") for i in range(10)], "id int, v double, dt string"
    )
    DI.write_delta(df, t, partition_by=["dt"])
    DI.delete_where_delta(spark, t, "id IN (3, 7)")  # v1, via deletion vectors
    before = sorted(r.id for r in DI.read_delta(spark, t).collect())
    assert before == [0, 1, 2, 4, 5, 6, 8, 9]
    v = DI.checkpoint_delta(spark, t)
    assert v == 1
    log = os.path.join(t, "_delta_log")
    assert os.path.exists(os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    hint = json.load(open(os.path.join(log, "_last_checkpoint")))
    assert hint["version"] == 1
    # partitionValues must be a true MAP column (json-inference structs
    # would break foreign readers)
    cp_df = spark.read.parquet(os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    import pyspark.sql.types as T

    assert isinstance(
        cp_df.schema["add"].dataType["partitionValues"].dataType, T.MapType
    )
    # (a)+(b): expire every commit json — the checkpoint alone serves the
    # DV'd snapshot
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    assert sorted(r.id for r in DI.read_delta(spark, t).collect()) == before
    # (c): append a JSON tail on top of the checkpoint-only log
    more = spark.createDataFrame([(100, 100.0, "d0")], "id int, v double, dt string")
    DI.append_delta(more, t)  # commits as checkpoint version + 1 = 2
    assert sorted(r.id for r in DI.read_delta(spark, t).collect()) == before + [100]
    # re-checkpoint at v2 and expire the tail too
    assert DI.checkpoint_delta(spark, t) == 2
    os.remove(os.path.join(log, f"{2:020d}.json"))
    assert sorted(r.id for r in DI.read_delta(spark, t).collect()) == before + [100]


def test_delta_type_widening_reads(spark, tmp_path):
    """typeWidening (PROTOCOL.md): files written BEFORE a widen carry the
    narrower physical types; replay scans with the logical schemaString
    types and Spark's parquet reader widens natively. Covers int->long,
    float->double, decimal growth and date->timestampNTZ in one table."""
    import pyspark.sql.types as T

    t = str(tmp_path / "widen")
    os.makedirs(t, exist_ok=True)
    # physical file: narrow types (written before the widen)
    spark.sql(
        "SELECT 1 AS id, CAST(1.5 AS FLOAT) AS v,"
        " CAST(12.3 AS DECIMAL(5,1)) AS dec, DATE'2024-01-02' AS dt"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(t, "part0"))
    rel = "part0/" + [
        f for f in os.listdir(os.path.join(t, "part0")) if f.endswith(".parquet")
    ][0]
    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "double", "nullable": True, "metadata": {}},
                {"name": "dec", "type": "decimal(10,2)", "nullable": True,
                 "metadata": {}},
                {"name": "dt", "type": "timestamp_ntz", "nullable": True,
                 "metadata": {}},
            ],
        }
    )
    _commit(
        t,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["typeWidening", "timestampNtz"],
                    "writerFeatures": ["typeWidening"],
                }
            },
            {
                "metaData": {
                    "id": "widen-1",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_str,
                    "partitionColumns": [],
                    "configuration": {},
                }
            },
            {
                "add": {
                    "path": rel,
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
        ],
    )
    out = DI.read_delta(spark, t)
    assert [f.dataType for f in out.schema.fields] == [
        T.LongType(), T.DoubleType(), T.DecimalType(10, 2), T.TimestampNTZType(),
    ]
    r = out.collect()[0]
    assert (r.id, r.v, str(r.dec)) == (1, 1.5, "12.30")
    assert r.dt.year == 2024 and r.dt.day == 2


def test_delta_variant_type_reads(spark, tmp_path):
    """variantType (PROTOCOL.md): schemaString "variant" parses into Spark's
    native VariantType and the protocol's value/metadata binary-pair
    physical layout IS Spark's parquet variant layout — an unshredded
    variant column reads and variant_get extracts typed fields."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "vart")
    os.makedirs(t, exist_ok=True)
    spark.sql(
        "SELECT 1 AS id, parse_json('{\"a\": 5, \"tags\": [\"x\",\"y\"]}') AS props"
        " UNION ALL SELECT 2, parse_json('{\"a\": 7}')"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(t, "part0"))
    rel = "part0/" + [
        f for f in os.listdir(os.path.join(t, "part0")) if f.endswith(".parquet")
    ][0]
    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "integer", "nullable": True, "metadata": {}},
                {"name": "props", "type": "variant", "nullable": True,
                 "metadata": {}},
            ],
        }
    )
    _commit(
        t,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["variantType"],
                    "writerFeatures": ["variantType"],
                }
            },
            {
                "metaData": {
                    "id": "variant-1",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_str,
                    "partitionColumns": [],
                    "configuration": {},
                }
            },
            {
                "add": {
                    "path": rel,
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
        ],
    )
    out = DI.read_delta(spark, t)
    assert out.schema["props"].dataType.typeName() == "variant"
    got = sorted(
        out.select(
            "id", F.expr("variant_get(props, '$.a', 'int')").alias("a")
        ).collect()
    )
    assert [(r.id, r.a) for r in got] == [(1, 5), (2, 7)]


# --- round-9 review fixes: cm writes, legacy upgrade, writer gate, txn ------


@pytest.mark.parametrize("mode,names", [("name", ("col-aaa", "col-bbb")),
                                        ("id", ("x1", "x2"))])
def test_delta_cm_append_physical(spark, tmp_path, mode, names):
    """append_delta on a column-mapped table writes PHYSICAL files: data
    columns carry physicalName (and parquet field ids in id mode) and the
    add keys partitionValues physically — pre-fix the writer emitted
    logical names, which read back silently all-NULL (review r9 high)."""
    from urllib.parse import unquote

    import pyarrow.parquet as pq

    t = str(tmp_path / f"cmapp_{mode}")
    _write_phys_file(t, "part-0.parquet", [(1, 1.5)], names=names)
    _commit(
        t,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _cm_meta(mode),
            _cm_add("part-0.parquet", "2024-01-01"),
        ],
    )
    df = spark.createDataFrame(
        [(9, 9.5, datetime.date(2024, 2, 2))], "id int, v double, dt date"
    )
    assert DI.append_delta(df, t) == 1
    out = DI.read_delta(spark, t)
    assert sorted((r.id, r.v, str(r.dt)) for r in out.collect()) == [
        (1, 1.5, "2024-01-01"),
        (9, 9.5, "2024-02-02"),
    ]
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json")) as fh:
        acts = [json.loads(line) for line in fh if line.strip()]
    add = next(a for a in acts if "add" in a)["add"]
    assert add["partitionValues"] == {"col-ccc": "2024-02-02"}
    sch = pq.read_schema(os.path.join(t, unquote(add["path"])))
    assert set(sch.names) == {"col-aaa", "col-bbb"}
    if mode == "id":
        fids = {
            f.name: (f.metadata or {}).get(b"PARQUET:field_id")
            for f in sch
        }
        assert fids == {"col-aaa": b"1", "col-bbb": b"2"}


def test_delta_upgrade_carries_legacy_features(spark, tmp_path):
    """A DV delete that upgrades a legacy reader-2/writer-5 protocol to
    table features must list every legacy-implied feature (PROTOCOL.md
    legacy mapping) — dropping columnMapping would hand conformant
    runtimes a mapped table they then read all-NULL (review r9 high)."""
    t = str(tmp_path / "cmupg")
    _write_phys_file(t, "part-0.parquet", [(1, 1.5), (2, 2.5), (3, 3.5)])
    _commit(
        t,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _cm_meta("name"),
            _cm_add("part-0.parquet", "2024-01-01"),
        ],
    )
    assert DI.delete_where_delta(spark, t, "id = 2") == 1
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json")) as fh:
        acts = [json.loads(line) for line in fh if line.strip()]
    proto = next(a for a in acts if "protocol" in a)["protocol"]
    assert proto["minReaderVersion"] == 3 and proto["minWriterVersion"] == 7
    assert set(proto["readerFeatures"]) >= {"columnMapping", "deletionVectors"}
    assert set(proto["writerFeatures"]) >= {
        "appendOnly",
        "invariants",
        "checkConstraints",
        "changeDataFeed",
        "generatedColumns",
        "columnMapping",
        "deletionVectors",
    }
    assert sorted(r.id for r in DI.read_delta(spark, t).collect()) == [1, 3]


def _write_single_file(table, rel, rows):
    """ONE parquet file (not a Spark part-file directory) so DV-delete's
    file-level _metadata paths match the add's path exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.int32()),
            "v": pa.array([r[1] for r in rows], pa.float64()),
        }
    )
    dest = os.path.join(table, rel)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    pq.write_table(t, dest)


def _gated_table(spark, tmp_path, tag, configuration=None, field_md=None):
    t = str(tmp_path / f"gate_{tag}")
    _write_single_file(t, "dt=2024-01-01/f0.parquet", [(1, 1.5)])
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "integer", "nullable": True,
             "metadata": (field_md or {}).get("id", {})},
            {"name": "v", "type": "double", "nullable": True,
             "metadata": (field_md or {}).get("v", {})},
            {"name": "dt", "type": "date", "nullable": True, "metadata": {}},
        ],
    }
    _commit(
        t,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "gate-1",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema),
                    "partitionColumns": ["dt"],
                    "configuration": configuration or {},
                }
            },
            _add("dt=2024-01-01/f0.parquet", "2024-01-01"),
        ],
    )
    return t


def test_delta_writer_gate(spark, tmp_path):
    """Conformant-writer refusals: a table property that OBLIGES the writer
    to do something this implementation doesn't (validate constraints, emit
    cdc, assign identity/row ids) fails loud instead of committing a
    nonconformant version (review r9)."""
    app = spark.createDataFrame(
        [(9, 9.5, datetime.date(2024, 2, 2))], "id int, v double, dt date"
    )

    # appendOnly=true: deletes refused, appends fine
    t = _gated_table(spark, tmp_path, "ao",
                     configuration={"delta.appendOnly": "true"})
    with pytest.raises(DI.UnsupportedDeltaFeature, match="appendOnly"):
        DI.delete_where_delta(spark, t, "id = 1")
    assert DI.append_delta(app, t) == 1
    assert DI.read_delta(spark, t).count() == 2

    # changeDataFeed: DELETE must write cdc files -> refused; append fine
    # (CDF readers derive inserts from dataChange=true adds)
    t = _gated_table(spark, tmp_path, "cdf",
                     configuration={"delta.enableChangeDataFeed": "true"})
    with pytest.raises(DI.UnsupportedDeltaFeature, match="cdc"):
        DI.delete_where_delta(spark, t, "id = 1")
    assert DI.append_delta(app, t) == 1

    # CHECK constraints: appends not validated -> refused; DV delete can
    # only remove rows, so it stays allowed
    t = _gated_table(
        spark, tmp_path, "ck",
        configuration={"delta.constraints.positive": "v > 0"},
    )
    with pytest.raises(DI.UnsupportedDeltaFeature, match="constraints"):
        DI.append_delta(app, t)
    assert DI.delete_where_delta(spark, t, "id = 1") == 1

    # column invariants / generated / identity metadata: appends refused
    for tag, md, pat in (
        ("inv", {"v": {"delta.invariants":
                       '{"expression":{"expression":"v > 0"}}'}}, "invariant"),
        ("gen", {"v": {"delta.generationExpression": "id + 1"}}, "generated"),
        ("idn", {"id": {"delta.identity.start": 1,
                        "delta.identity.step": 1}}, "identity"),
    ):
        t = _gated_table(spark, tmp_path, tag, field_md=md)
        with pytest.raises(DI.UnsupportedDeltaFeature, match=pat):
            DI.append_delta(app, t)

    # rowTracking / inCommitTimestamp bind every commit kind
    for key, pat in (
        ("delta.enableRowTracking", "rowTracking"),
        ("delta.enableInCommitTimestamps", "timestamp"),
    ):
        t = _gated_table(spark, tmp_path, key.split(".")[-1],
                         configuration={key: "true"})
        with pytest.raises(DI.UnsupportedDeltaFeature, match=pat):
            DI.append_delta(app, t)
        with pytest.raises(DI.UnsupportedDeltaFeature, match=pat):
            DI.delete_where_delta(spark, t, "id = 1")


def test_delta_checkpoint_preserves_txn(spark, tmp_path):
    """setTransaction watermarks survive checkpoint + commit-json cleanup
    (PROTOCOL.md checkpoint contents): foreign streaming writers key batch
    idempotence on them — a checkpoint that dropped them would let a
    restarted stream silently re-append committed batches (review r9)."""
    t = str(tmp_path / "txncp")
    _write_data(spark, t, "dt=2024-01-01/f0.parquet", [(1, 1.5)])
    _commit(
        t,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(),
            _add("dt=2024-01-01/f0.parquet", "2024-01-01"),
            {"txn": {"appId": "streamA", "version": 5}},
        ],
    )
    _commit(
        t,
        1,
        [
            {"txn": {"appId": "streamA", "version": 6, "lastUpdated": 1700}},
            {"txn": {"appId": "streamB", "version": 1}},
        ],
    )
    assert DI.checkpoint_delta(spark, t) == 1
    for v in (0, 1):
        os.remove(os.path.join(t, "_delta_log", f"{v:020d}.json"))
    state = DI._replay(spark, t, 1)
    # latest-per-appId survived the checkpoint round-trip
    assert state["txns"]["streamA"]["version"] == 6
    assert state["txns"]["streamB"]["version"] == 1
    # and the snapshot itself still serves
    assert DI.read_delta(spark, t).count() == 1


def test_delta_cm_fieldid_conf_inert(spark, tmp_path):
    """The session-global parquet.fieldId.read conf an id-mode read leaves
    set is inert for ordinary reads: field-id resolution only activates
    when the READ SCHEMA carries parquet.field.id metadata, which only the
    id-mode plans attach — a plain schema'd read still resolves by NAME."""
    t = str(tmp_path / "cmid2")
    _write_phys_file(t, "part-0.parquet", [(7, 7.5)], names=("x1", "x2"))
    _commit(
        t,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _cm_meta("id"),
            _cm_add("part-0.parquet", "2024-03-01"),
        ],
    )
    assert DI.read_delta(spark, t).count() == 1
    assert spark.conf.get("spark.sql.parquet.fieldId.read.enabled") == "true"
    p = str(tmp_path / "plain")
    spark.createDataFrame([(1, 2.5)], "a int, b double").write.parquet(p)
    # schema lists b first: name-based resolution must still map correctly
    got = spark.read.schema("b double, a int").parquet(p).collect()[0]
    assert (got.a, got.b) == (1, 2.5)


def test_delta_cm_partition_field_missing_physical_name(spark, tmp_path):
    """_pv_key fail-loud parity (review r9): a mapped table whose PARTITION
    field lacks physicalName metadata refuses instead of silently
    reconstituting every partition value as NULL."""
    def fld(name, typ, md):
        return {"name": name, "type": typ, "nullable": True, "metadata": md}

    cm = {"delta.columnMapping.id": 1,
          "delta.columnMapping.physicalName": "col-aaa"}
    cm2 = {"delta.columnMapping.id": 2,
           "delta.columnMapping.physicalName": "col-bbb"}
    schema = {"type": "struct", "fields": [
        fld("id", "integer", cm), fld("v", "double", cm2),
        fld("dt", "date", {}),  # nonconformant: no physicalName
    ]}
    t = str(tmp_path / "cmbadpv")
    _write_phys_file(t, "part-0.parquet", [(1, 1.5)])
    _commit(
        t,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "badpv-1",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema),
                    "partitionColumns": ["dt"],
                    "configuration": {"delta.columnMapping.mode": "name"},
                }
            },
            _cm_add("part-0.parquet", "2024-01-01"),
        ],
    )
    with pytest.raises(DI.UnsupportedDeltaFeature, match="partition field"):
        DI.read_delta(spark, t)
