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


def _media_df(spark, payloads: dict[int, bytes], media_type="image"):
    from gpu_telemetry_lakehouse_spark.operators.multimodal import MEDIA_SCHEMA

    rows = [
        (mid, media_type, p, {"source": f"gen://{mid}", "byte_len": len(p)})
        for mid, p in payloads.items()
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_codec_roundtrips():
    import numpy as np

    from gpu_telemetry_lakehouse_spark.operators import media_codecs as C

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    assert (C.decode_ppm(C.encode_ppm(img)) == img).all()
    assert (C.decode_bmp(C.encode_bmp(img)) == img).all()  # incl. row padding
    # P3 ascii variant
    body = " ".join(str(v) for v in img.ravel())
    p3 = f"P3\n# comment\n9 13\n255\n{body}\n".encode()
    assert (C.decode_ppm(p3) == img).all()

    samples = (rng.integers(-32768, 32767, size=(220, 2))).astype(np.int16)
    rate, back = C.decode_wav(C.encode_wav(samples, rate=8000))
    assert rate == 8000 and (back == samples).all()

    for junk in (b"", b"not media at all", b"BMxx", b"RIFFxxxxJUNK"):
        with pytest.raises(ValueError):
            C.real_decode(junk)


def test_extract_features_real_decode_end_to_end(spark):
    import numpy as np

    from gpu_telemetry_lakehouse_spark.operators import media_codecs as C

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    wav = C.encode_wav((rng.integers(-2000, 2000, size=300)).astype(np.int16), rate=16000)
    payloads = {
        1: C.encode_ppm(img),
        2: C.encode_bmp(img),
        3: wav,
        4: b"corrupt payload",
    }
    media = _media_df(spark, payloads)
    rows = {r.media_id: r for r in extract_features(media, decode="real").collect()}

    assert rows[1].decode_ok and (rows[1].width, rows[1].height) == (32, 24)
    assert rows[2].decode_ok and (rows[2].width, rows[2].height) == (32, 24)
    # PPM and BMP of the SAME image produce identical features
    assert rows[1].feature == rows[2].feature
    expected = C.image_features(img)
    assert np.allclose(rows[1].feature, expected)
    # histogram bins sum to 1
    assert abs(sum(rows[1].feature[8:16]) - 1.0) < 1e-5

    assert rows[3].decode_ok and (rows[3].width, rows[3].height) == (300, 1)
    assert np.allclose(rows[3].feature, C.audio_features(16000, C.decode_wav(wav)[1]))

    # corrupt payload -> decode_ok false, never a task failure
    assert not rows[4].decode_ok and rows[4].feature is None


def test_resize_real_decode_box_resample(spark):
    import numpy as np

    from gpu_telemetry_lakehouse_spark.operators import media_codecs as C

    # 16x16 image, left half black, right half white -> 4x4 luma grid has
    # two black columns then two white columns
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, 8:, :] = 255
    media = _media_df(spark, {1: C.encode_ppm(img), 2: b"junk"})
    rows = {r.media_id: r for r in resize(media, 4, 4, decode="real").collect()}
    grid = np.array(rows[1].pixels).reshape(4, 4)
    assert rows[1].decode_ok and (rows[1].width, rows[1].height) == (16, 16)
    assert np.allclose(grid[:, :2], 0.0) and np.allclose(grid[:, 2:], 1.0)
    assert not rows[2].decode_ok and rows[2].pixels is None


def test_text_payloads_fail_closed_under_real_decode(media):
    """documents_as_media payloads are text bytes, not media — the default
    real decoder must mark every row decode_ok=false without failing."""
    out = extract_features(media.limit(20), decode="real").collect()
    assert out and all(not r.decode_ok for r in out)


def test_resize_fixed_grid(media):
    out = resize(media, out_width=8, out_height=8, decode="fake")
    rows = out.collect()
    assert len(rows) == media.count()
    r = rows[0]
    assert r.decode_ok and len(r.pixels) == 64
    assert (r.out_width, r.out_height) == (8, 8)
    # deterministic across runs
    again = {x.media_id: x.pixels for x in resize(media, 8, 8, decode="fake").collect()}
    assert again[r.media_id] == r.pixels


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


def test_wav_empty_data_chunk_rejected():
    """A structurally-valid WAV with zero samples must raise (decode_ok=false
    downstream), not yield NaN features with decode_ok=true (review r3)."""
    import numpy as np
    import pytest

    from gpu_telemetry_lakehouse_spark.operators import media_codecs as C

    empty = C.encode_wav(np.zeros((0,), dtype=np.int16), rate=8000)
    with pytest.raises(ValueError, match="empty data"):
        C.decode_wav(empty)


def test_phash64_properties():
    """pHash kernel contract: (a) deterministic signed-64 code; (b) near-
    invariant to pixel swaps inside one box-resample cell (sum-preserving in
    exact arithmetic; float32 per-pixel luma rounding can still flip a
    knife-edge bit or two, which is why the multimodal_phash_neardup oracle
    twins via container change, not pixel noise); (c) sensitive to genuinely
    different textures; (d) robust through a PPM encode/decode roundtrip."""
    import numpy as np

    from gpu_telemetry_lakehouse_spark.operators import media_codecs as C

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(48, 64, 3)).astype(np.uint8)
    code = C.phash64(img)
    assert isinstance(code, int) and -(1 << 63) <= code < (1 << 63)
    assert C.phash64(img) == code
    assert C.phash64(C.decode_image(C.encode_ppm(img))) == code

    # swap both pixels of an x-resample cell (64 -> 32 cells are [2i, 2i+1])
    swapped = img.copy()
    for k in range(12):
        yy, xi, cc = (7 * k) % 48, (11 * k) % 32, k % 3
        a_px = swapped[yy, 2 * xi, cc]
        swapped[yy, 2 * xi, cc] = swapped[yy, 2 * xi + 1, cc]
        swapped[yy, 2 * xi + 1, cc] = a_px
    ham = bin((C.phash64(swapped) ^ code) & ((1 << 64) - 1)).count("1")
    assert ham <= 2, ham

    other = rng.randint(0, 256, size=(48, 64, 3)).astype(np.uint8)
    ham = bin((C.phash64(other) ^ code) & ((1 << 64) - 1)).count("1")
    assert ham >= 8, ham


def test_perceptual_hash_operator(spark):
    """perceptual_hash maps payloads -> (media_id, phash, decode_ok) with
    NULL-hash rows for undecodable payloads."""
    import numpy as np

    from gpu_telemetry_lakehouse_spark.operators import media_codecs as C
    from gpu_telemetry_lakehouse_spark.operators.multimodal import perceptual_hash

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    media = _media_df(
        spark, {1: C.encode_ppm(img), 2: C.encode_bmp(img), 3: b"not media"}
    )
    rows = {r.media_id: r for r in perceptual_hash(media).collect()}
    assert rows[1].decode_ok and rows[2].decode_ok and not rows[3].decode_ok
    assert rows[3].phash is None
    # PPM and BMP carry the same pixels -> identical perceptual code
    assert rows[1].phash == rows[2].phash == C.phash64(img)


def test_y4m_roundtrip_all_chroma_layouts():
    """encode_y4m/decode_y4m reproduce luma planes exactly for every
    supported chroma layout (the chroma stride must be right to find the
    next FRAME marker), and corrupt streams raise ValueError."""
    import numpy as np
    import pytest as _pytest

    from gpu_telemetry_lakehouse_spark.operators import media_codecs as C

    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, size=(8, 16)).astype(np.uint8) for _ in range(5)]
    for chroma in ("C420jpeg", "C420", "C422", "C444", "Cmono"):
        w, h, out = C.decode_y4m(C.encode_y4m(frames, chroma))
        assert (w, h, len(out)) == (16, 8, 5)
        for a, b in zip(frames, out):
            assert (a == b).all()
    assert C.sniff(C.encode_y4m(frames)) == "y4m"
    for bad in (
        b"YUV4MPEG2 W16 H8 C444\nFRAM",  # bad marker
        C.encode_y4m(frames)[:-3],  # truncated plane
        b"YUV4MPEG2 C444\nFRAME\n",  # missing geometry
        b"YUV4MPEG2 W16 H8 C999\nFRAME\n" + b"\0" * 128,  # unknown chroma
    ):
        with _pytest.raises(ValueError):
            C.decode_y4m(bad)
    with _pytest.raises(ValueError):
        C.encode_y4m([frames[0][:7, :]], "C420jpeg")  # odd height, subsampled


def test_sample_video_frames_real_parser(spark):
    """sample_video_frames explodes each Y4M payload into every-Nth-frame
    rows with exact luma sums; corrupt/NULL payloads yield one
    decode_ok=false row instead of failing the job."""
    import numpy as np

    from gpu_telemetry_lakehouse_spark.operators import media_codecs as C
    from gpu_telemetry_lakehouse_spark.operators.multimodal import (
        sample_video_frames,
    )

    rng = np.random.RandomState(7)
    clips = {
        1: [rng.randint(0, 256, size=(8, 16)).astype(np.uint8) for _ in range(5)],
        2: [rng.randint(0, 256, size=(4, 6)).astype(np.uint8) for _ in range(2)],
    }
    payloads = {k: C.encode_y4m(v) for k, v in clips.items()}
    payloads[3] = b"definitely not a video"
    media = _media_df(spark, payloads, media_type="video")
    rows = sample_video_frames(media, every_n=2).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    assert sorted(r.frame_no for r in by_media[1]) == [0, 2, 4]
    assert all(r.n_frames == 5 and (r.width, r.height) == (16, 8) for r in by_media[1])
    for r in by_media[1]:
        assert r.luma_sum == int(clips[1][r.frame_no].sum(dtype=np.int64))
    assert [r.frame_no for r in by_media[2]] == [0]
    (bad,) = by_media[3]
    assert bad.frame_no == -1 and not bad.decode_ok and bad.luma_sum is None


def test_real_decode_video_features():
    """real_decode routes Y4M through video_features: (w, h, 16-dim) with
    frame count in slot 0 and a non-zero motion proxy for changing clips."""
    import numpy as np

    from gpu_telemetry_lakehouse_spark.operators import media_codecs as C

    frames = [np.full((8, 16), 10 * (f + 1), dtype=np.uint8) for f in range(3)]
    w, h, feat = C.real_decode(C.encode_y4m(frames))
    assert (w, h) == (16, 8)
    assert feat.shape == (16,) and feat.dtype == np.float32
    assert feat[0] == 3.0  # n_frames
    assert feat[3] > 0.0  # motion: luma changes between frames
    still = [frames[0]] * 3
    _, _, sfeat = C.real_decode(C.encode_y4m(still))
    assert sfeat[3] == 0.0
