"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The default ``decode="real"`` kernel is the pure-
numpy PPM/BMP/WAV codec suite in ``media_codecs`` (no Pillow/ffmpeg
needed); corrupt or unrecognized payloads surface as ``decode_ok=false``
rows rather than task failures — a corrupt file must never kill a 100 TB
job. ``decode="fake"`` keeps a deterministic md5-derived stand-in for
plumbing tests over non-media payloads, and any callable can be injected
(cloudpickle ships it to executors) to swap in a library-backed kernel.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("byte_len", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, width int, height int, "
    "feature array<float>, decode_ok boolean"
)


def documents_as_media(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Testdata adapter: document bytes stand in for media payloads."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.octet_length(payload).cast("long").alias("byte_len"),
        ).alias("meta"),
    )


def read_media_dir(spark, path: str, media_type: str = "image", pattern: str = "*") -> DataFrame:
    """Ingest a directory of raw media files via Spark's ``binaryFile``
    source (SURVEY.md §2.2: binary/file columns) into MEDIA_SCHEMA shape.

    binaryFile scans distribute like any file source — one task per file
    split, content never touches the driver — so a 100 TB image corpus
    ingests with ordinary scan parallelism; ``pathGlobFilter`` prunes
    non-media files at listing time. media_id is the path hash: stable
    across re-ingests, collision odds 2^-63 per pair.
    """
    from pyspark.sql import functions as F  # local alias mirrors module import

    raw = spark.read.format("binaryFile").option("pathGlobFilter", pattern).load(path)
    return raw.select(
        F.abs(F.xxhash64("path")).alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col("content").alias("payload"),
        F.struct(
            F.col("path").alias("source"),
            F.col("length").cast("long").alias("byte_len"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for an image decoder: dimensions and a 16-dim
    feature vector derived from the content hash. REPLACE with Pillow/libvips
    in a real deployment."""
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    feat = np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0
    return width, height, feat


def _resolve_decoder(decode):
    """Dependency-injection point for the decode kernel.

    ``decode`` is either a CALLABLE ``payload: bytes -> (width, height,
    feature: np.ndarray)`` — cloudpickle ships it to executors, so with
    Pillow installed real decode is a one-liner::

        def pil_decode(payload):
            from io import BytesIO
            import numpy as np
            from PIL import Image
            img = Image.open(BytesIO(payload)).convert("RGB")
            arr = np.asarray(img, dtype=np.float32) / 255.0
            return img.width, img.height, arr.mean(axis=(0, 1))

        extract_features(media, decode=pil_decode)

    — or a string: ``"real"`` (the default: pure-numpy PPM/BMP/WAV codecs,
    ``media_codecs.real_decode``) / ``"fake"`` (deterministic md5 stand-in
    for plumbing tests over non-media payloads)."""
    if callable(decode):
        return decode
    if decode == "fake":
        return _fake_decode
    if decode == "real":
        from .media_codecs import real_decode

        return real_decode
    raise ValueError(decode)


def extract_features(media: DataFrame, decode="real") -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batches; executors never
    materialize more than one batch of payloads at a time — the pattern that
    holds at 100 TB with spark.sql.execution.arrow.maxRecordsPerBatch).
    ``decode`` injects the kernel — see ``_resolve_decoder``. Rows whose
    payload is NULL or fails to decode come back with decode_ok=false."""
    decoder = _resolve_decoder(decode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                if payload is None:
                    rows.append((mid, mtype, None, None, None, False))
                    continue
                try:
                    w, h, feat = decoder(bytes(payload))
                except (ValueError, struct.error, IndexError):
                    rows.append((mid, mtype, None, None, None, False))
                    continue
                rows.append((mid, mtype, w, h, np.asarray(feat).tolist(), True))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "media_type",
                    "width",
                    "height",
                    "feature",
                    "decode_ok",
                ],
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, width int, height int, out_width int, out_height int, "
    "pixels array<float>, decode_ok boolean"
)


def resize(media: DataFrame, out_width: int = 8, out_height: int = 8, decode="real") -> DataFrame:
    """Decode + resize via mapInPandas: emits a fixed out_width×out_height
    row-major pixel grid per image — the normalize-before-embed step of a
    multimodal training pipeline.

    With the default ``decode="real"`` the grid is a true box-resample of
    the decoded image's luma plane (``media_codecs.luma_grid``); with
    ``decode="fake"`` or an injected callable, the kernel's feature vector
    is tiled deterministically across the grid so plumbing tests can run on
    non-media payloads. The Spark-side contract — Arrow batch in,
    fixed-width float array out, one row per input row, NULL/corrupt rows
    pass through with decode_ok=false — is identical either way.
    """
    real = decode == "real"
    decoder = None if real else _resolve_decoder(decode)
    n_px = out_width * out_height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_codecs import decode_image, luma_grid

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, out_width, out_height, None, False))
                    continue
                try:
                    if real:
                        img = decode_image(bytes(payload))
                        h, w = img.shape[0], img.shape[1]
                        # pass the decoded array: one parse per payload
                        px = luma_grid(img, out_width, out_height)
                    else:
                        w, h, feat = decoder(bytes(payload))
                        feat = np.asarray(feat, dtype=np.float32)
                        # Deterministic "resample": tile the 16-dim content
                        # feature across the grid, modulated by pixel index.
                        px = np.resize(feat, n_px) * (
                            1.0 + np.arange(n_px, dtype=np.float32) / n_px
                        )
                except (ValueError, struct.error, IndexError):
                    rows.append((mid, None, None, out_width, out_height, None, False))
                    continue
                rows.append((mid, w, h, out_width, out_height, px.tolist(), True))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height",
                    "out_width", "out_height", "pixels", "decode_ok",
                ],
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """Byte-sliced frame-sampling stand-in for OPAQUE video containers the
    pure-numpy layer can't parse (mp4/mkv need ffmpeg). For real container
    parsing use ``sample_video_frames`` — Y4M streams decode end-to-end.
    This variant keeps the explode-to-frames plumbing exercised for
    arbitrary payloads."""
    idx = F.sequence(
        F.lit(1),
        F.least(F.lit(max_frames), (F.octet_length("payload") / every_n_bytes).cast("int")),
    )
    frames = F.transform(
        idx,
        lambda i: F.struct(
            (i - 1).alias("frame_no"),
            F.substring(F.col("payload"), ((i - 1) * every_n_bytes + 1).cast("int"), every_n_bytes).alias("frame_bytes"),
        ),
    )
    return media.filter(F.col("media_type") == "video").select(
        "media_id", F.explode(frames).alias("frame")
    ).select("media_id", "frame.frame_no", "frame.frame_bytes")


VIDEO_FRAME_SCHEMA = (
    "media_id long, frame_no int, n_frames int, width int, height int, "
    "luma_sum long, decode_ok boolean"
)


def sample_video_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video frame sampling: parse each Y4M payload with the pure-numpy
    container parser (``media_codecs.decode_y4m``), keep every
    ``every_n``-th frame, and emit one row per sampled frame with its exact
    luma byte sum — the keyframe-extraction step of a video training
    pipeline, minus only the ffmpeg codec swap.

    The chroma-plane arithmetic must be exactly right for the parser to land
    on each successive FRAME marker, so the per-frame sums are a hard
    correctness probe of the container math, not just of the plumbing.
    Corrupt/NULL payloads emit a single frame_no=-1 row with decode_ok=false
    (a bad file never kills the job). One payload is decoded ONCE per row
    regardless of its frame count — the explode happens on parsed planes,
    not by re-reading bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_codecs import decode_y4m

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, -1, None, None, None, None, False))
                    continue
                try:
                    w, h, frames = decode_y4m(bytes(payload))
                except (ValueError, struct.error, IndexError):
                    rows.append((mid, -1, None, None, None, None, False))
                    continue
                for fno in range(0, len(frames), every_n):
                    lsum = int(frames[fno].sum(dtype=np.int64))
                    rows.append((mid, fno, len(frames), w, h, lsum, True))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_no", "n_frames",
                    "width", "height", "luma_sum", "decode_ok",
                ],
            )

    return media.mapInPandas(run, schema=VIDEO_FRAME_SCHEMA)


PHASH_SCHEMA = "media_id long, phash long, decode_ok boolean"


def perceptual_hash(media: DataFrame) -> DataFrame:
    """Image payloads -> 64-bit perceptual hash (media_codecs.phash64) via
    mapInPandas. The content-addressed key for image near-dup: band the code
    into 16-bit keys, equi-join bands, verify with bit_count(xor) — the
    SimHash/LSH idiom, never all-pairs. Non-image / corrupt payloads emit
    decode_ok=false with NULL hash."""
    from .media_codecs import decode_image, phash64

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, False))
                    continue
                try:
                    rows.append((mid, phash64(decode_image(bytes(payload))), True))
                except (ValueError, struct.error, IndexError):
                    rows.append((mid, None, False))
            yield pd.DataFrame(rows, columns=["media_id", "phash", "decode_ok"])

    return media.mapInPandas(run, schema=PHASH_SCHEMA)
