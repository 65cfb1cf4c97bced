"""Multimodal plumbing: schema, Arrow batching, stubbed decode semantics."""

from __future__ import annotations

import pytest

from gpu_telemetry_lakehouse_spark.catalog import load_table
from gpu_telemetry_lakehouse_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
    frame_sample,
    resize,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return documents_as_media(load_table(spark, sf_dir, "documents"))


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.first()
    assert row.meta.byte_len == len(row.payload)


def test_extract_features_fake_decode(media):
    feats = extract_features(media, decode="fake")
    rows = feats.collect()
    assert len(rows) == media.count()
    r = rows[0]
    assert r.decode_ok and len(r.feature) == 16
    assert 64 <= r.width <= 319 and 64 <= r.height <= 319
    # deterministic: same payload -> same features
    again = {x.media_id: x.feature for x in extract_features(media, decode="fake").collect()}
    assert again[r.media_id] == r.feature


def test_extract_features_real_decode_is_stubbed(media):
    with pytest.raises(NotImplementedError, match="decode=<callable"):
        extract_features(media, decode="real").collect()


def test_resize_fixed_grid(media):
    out = resize(media, out_width=8, out_height=8, decode="fake")
    rows = out.collect()
    assert len(rows) == media.count()
    r = rows[0]
    assert r.decode_ok and len(r.pixels) == 64
    assert (r.out_width, r.out_height) == (8, 8)
    # deterministic across runs
    again = {x.media_id: x.pixels for x in resize(media, 8, 8).collect()}
    assert again[r.media_id] == r.pixels


def test_resize_real_decode_is_stubbed(media):
    with pytest.raises(NotImplementedError, match="decode=<callable"):
        resize(media, decode="real").collect()


def test_resize_null_payload_passthrough(spark, media):
    import pyspark.sql.functions as F

    nulled = media.withColumn(
        "payload", F.when(F.col("media_id") % 2 == 0, F.col("payload"))
    )
    out = resize(nulled, decode="fake")
    bad = out.filter(~F.col("decode_ok"))
    assert bad.count() > 0
    assert bad.filter(F.col("pixels").isNotNull()).count() == 0


def test_frame_sample(spark, sf_dir):
    video = documents_as_media(load_table(spark, sf_dir, "documents"), media_type="video")
    frames = frame_sample(video, every_n_bytes=64, max_frames=4)
    pdf = frames.toPandas()
    assert not pdf.empty
    assert set(pdf.columns) == {"media_id", "frame_no", "frame_bytes"}
    per_doc = pdf.groupby("media_id").frame_no.max()
    assert per_doc.max() <= 3
    assert all(len(b) <= 64 for b in pdf.frame_bytes)


def test_read_media_dir_binary_source(spark, tmp_path):
    from gpu_telemetry_lakehouse_spark.operators.multimodal import read_media_dir

    payloads = {f"img_{i}.bin": bytes(range(i, i + 32)) for i in range(4)}
    (tmp_path / "skip.txt").write_text("not media")
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)

    media = read_media_dir(spark, str(tmp_path), media_type="image", pattern="*.bin")
    rows = media.collect()
    assert len(rows) == 4
    assert len({r.media_id for r in rows}) == 4  # path-hash ids unique
    by_src = {r.meta.source.rsplit("/", 1)[-1]: bytes(r.payload) for r in rows}
    assert by_src == payloads
    for r in rows:
        assert r.meta.byte_len == len(r.payload)
    # feeds straight into the decode stage
    feats = extract_features(media, decode="fake").collect()
    assert len(feats) == 4 and all(f.decode_ok for f in feats)


def test_custom_decode_callable_injected_end_to_end(media):
    """The decode kernel is a dependency-injection point: a user-supplied
    callable (what a Pillow/ffmpeg deployment passes) ships to executors via
    cloudpickle and drives both featurize and resize — no library edit."""

    def my_decode(payload: bytes):
        import numpy as np

        # trivially verifiable kernel: "width" = byte length, 4-dim feature
        return len(payload), 7, np.array(
            [len(payload), payload[0], payload[-1], 1.0], dtype=np.float32
        )

    rows = {r.media_id: r for r in extract_features(media, decode=my_decode).collect()}
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert rows.keys() == src.keys()
    for mid, r in rows.items():
        assert r.width == len(src[mid]) and r.height == 7
        assert r.decode_ok and len(r.feature) == 4
        assert r.feature[1] == float(src[mid][0])

    resized = resize(media, out_width=2, out_height=2, decode=my_decode).collect()
    assert all(len(r.pixels) == 4 and r.decode_ok for r in resized)
