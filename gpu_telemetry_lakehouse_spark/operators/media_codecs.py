"""Pure-numpy media codecs: PPM / BMP images, WAV audio.

Real decode kernels for the multimodal pipeline (operators/multimodal.py)
with zero third-party dependencies — the formats are simple enough that a
correct parser is ~30 lines each, so nothing here needs Pillow/ffmpeg:

- PPM  (P6 binary / P3 ascii, maxval <= 255) -> uint8 (H, W, 3)
- BMP  (BITMAPINFOHEADER, 24-bpp uncompressed BI_RGB, bottom-up or
  top-down) -> uint8 (H, W, 3)
- WAV  (RIFF/WAVE, PCM 8-bit unsigned or 16-bit signed) -> (rate,
  int16 (n_samples, n_channels))

Encoders exist for all three so tests generate deterministic media without
fixtures on disk. ``real_decode`` sniffs magic bytes and emits the
(width, height, 16-dim float32 feature) contract ``extract_features``
expects; corrupt/unknown payloads raise ValueError, which the mapInPandas
stage converts to decode_ok=false (a corrupt file must never kill a 100 TB
job).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# PPM (netpbm): http://netpbm.sourceforge.net/doc/ppm.html
# --------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 3) -> binary P6 PPM."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("PPM needs 3 channels")
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def _ppm_header_tokens(buf: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read n whitespace-separated numeric tokens, skipping '#' comments."""
    toks: list[int] = []
    i = start
    while len(toks) < n:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if i < len(buf) and buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        toks.append(int(buf[i:j]))
        i = j
    return toks, i


def decode_ppm(buf: bytes) -> np.ndarray:
    magic = buf[:2]
    if magic not in (b"P6", b"P3"):
        raise ValueError("not a PPM payload")
    (w, h, maxval), i = _ppm_header_tokens(buf, 3, 2)
    if maxval > 255 or w <= 0 or h <= 0:
        raise ValueError("unsupported PPM (maxval > 255 or empty)")
    if magic == b"P6":
        i += 1  # single whitespace byte after maxval
        px = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=i)
    else:  # P3 ascii
        vals = buf[i:].split()
        if len(vals) < w * h * 3:
            raise ValueError("truncated P3 pixel data")
        px = np.array(vals[: w * h * 3], dtype=np.uint8)
    return px.reshape(h, w, 3)


# --------------------------------------------------------------------------
# BMP: 14-byte file header + 40-byte BITMAPINFOHEADER, 24-bpp BI_RGB
# --------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB -> 24-bpp bottom-up BMP."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("BMP needs 3 channels")
    row_len = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    img = np.zeros((h, row_len), dtype=np.uint8)
    img[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = img.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(buf: bytes) -> np.ndarray:
    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", buf, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError("unsupported BMP (only 24-bpp BI_RGB)")
    bottom_up, h = h > 0, abs(h)
    row_len = (w * 3 + 3) & ~3
    need = offset + row_len * h
    if w <= 0 or h <= 0 or len(buf) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(buf, dtype=np.uint8, count=row_len * h, offset=offset)
    img = rows.reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    return img[::-1] if bottom_up else img


# --------------------------------------------------------------------------
# WAV: RIFF container, PCM integer samples
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 (n,) or (n, channels) -> PCM16 WAV."""
    a = np.atleast_2d(np.asarray(samples, dtype=np.int16).T).T  # (n, ch)
    n, ch = a.shape
    data = np.ascontiguousarray(a).tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, int16 (n_samples, n_channels))."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    i, fmt, data = 12, None, None
    while i + 8 <= len(buf):
        cid, sz = buf[i : i + 4], struct.unpack_from("<I", buf, i + 4)[0]
        chunk = buf[i + 8 : i + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", chunk, 0)
        elif cid == b"data":
            data = chunk
        i += 8 + sz + (sz & 1)  # chunks pad to even length
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or ch < 1:
        raise ValueError("unsupported WAV (PCM only)")
    if rate <= 0:
        # a zero rate would later divide-by-zero in audio_features — reject
        # here so corrupt files map to decode_ok=false, never a dead task
        raise ValueError("corrupt WAV: non-positive sample rate")
    if bits == 16:
        a = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
    elif bits == 8:  # unsigned 8-bit -> center to int16 range
        a = (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) * 256
    else:
        raise ValueError("unsupported WAV bit depth")
    n = len(a) // ch
    if n == 0:
        # an empty data chunk would make audio_features emit NaN means with
        # decode_ok=true — reject like the zero-rate case
        raise ValueError("corrupt WAV: empty data chunk")
    return rate, a[: n * ch].reshape(n, ch)


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2): https://wiki.multimedia.cx/index.php/YUV4MPEG2
# The simplest real video container — plain-text stream header, one
# ``FRAME\n`` marker per frame, raw planar YUV after each. Supported
# chroma layouts: C420* (2x2-subsampled U/V), C422, C444, Cmono.
# --------------------------------------------------------------------------


def _y4m_chroma_bytes(tag: str, w: int, h: int) -> int:
    """Per-frame chroma-plane byte count for a chroma tag."""
    if tag.startswith("C420"):
        return 2 * (w // 2) * (h // 2)
    if tag.startswith("C422"):
        return 2 * (w // 2) * h
    if tag.startswith("C444"):
        return 2 * w * h
    if tag.startswith("Cmono"):
        return 0
    raise ValueError(f"unsupported Y4M chroma layout {tag!r}")


def encode_y4m(frames, chroma: str = "C420jpeg") -> bytes:
    """uint8 luma frames [(H, W), ...] -> Y4M with neutral (0x80) chroma."""
    if not frames:
        raise ValueError("Y4M needs at least one frame")
    h, w = frames[0].shape
    if chroma.startswith(("C420", "C422")) and (w % 2 or h % 2):
        raise ValueError("subsampled chroma needs even dimensions")
    parts = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 %s\n" % (w, h, chroma.encode())]
    pad = b"\x80" * _y4m_chroma_bytes(chroma, w, h)
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all frames must share one geometry")
        parts.append(b"FRAME\n")
        parts.append(np.ascontiguousarray(fr, dtype=np.uint8).tobytes())
        parts.append(pad)
    return b"".join(parts)


def decode_y4m(buf: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Y4M -> (width, height, [uint8 (H, W) luma planes]).

    Chroma planes are parsed (their size must be exactly right to find the
    next FRAME marker) but not returned — the pipeline's features are
    luma-only. Unknown stream parameters are ignored per spec; unknown
    chroma layouts, bad geometry, or truncated planes raise ValueError.
    """
    nl = buf.find(b"\n")
    if not buf.startswith(b"YUV4MPEG2") or nl < 0:
        raise ValueError("not a Y4M stream")
    w = h = 0
    chroma = "C420jpeg"
    for tok in buf[9:nl].decode("ascii", "replace").split():
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("C"):
            chroma = tok
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing geometry")
    ysz, csz = w * h, _y4m_chroma_bytes(chroma, w, h)
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(buf):
        if buf[pos : pos + 5] != b"FRAME":
            raise ValueError("bad Y4M frame marker")
        fnl = buf.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("truncated Y4M frame header")
        pos = fnl + 1
        if pos + ysz + csz > len(buf):
            raise ValueError("truncated Y4M frame data")
        frames.append(
            np.frombuffer(buf, dtype=np.uint8, count=ysz, offset=pos).reshape(h, w)
        )
        pos += ysz + csz
    return w, h, frames


# --------------------------------------------------------------------------
# Dispatch + feature kernels (the multimodal pipeline's decode contract)
# --------------------------------------------------------------------------


def sniff(buf: bytes) -> str | None:
    if buf[:2] in (b"P6", b"P3"):
        return "ppm"
    if buf[:2] == b"BM":
        return "bmp"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "wav"
    if buf[:9] == b"YUV4MPEG2":
        return "y4m"
    return None


def decode_image(buf: bytes) -> np.ndarray:
    kind = sniff(buf)
    if kind == "ppm":
        return decode_ppm(buf)
    if kind == "bmp":
        return decode_bmp(buf)
    raise ValueError("not a supported image payload")


def image_features(img: np.ndarray) -> np.ndarray:
    """16-dim float32: RGB means/stds, luma mean/std, 8-bin luma histogram."""
    f = img.astype(np.float32) / 255.0
    luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    hist = np.histogram(luma, bins=8, range=(0.0, 1.0))[0] / luma.size
    return np.concatenate(
        [f.mean(axis=(0, 1)), f.std(axis=(0, 1)),
         [luma.mean(), luma.std()], hist]
    ).astype(np.float32)


def audio_features(rate: int, samples: np.ndarray) -> np.ndarray:
    """16-dim float32: amplitude stats, zero-crossing rate, format fields,
    8-segment RMS envelope."""
    mono = (samples.astype(np.float32) / 32768.0).mean(axis=1)
    zc = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8))))) if len(mono) > 1 else 0.0
    segs = np.array_split(mono, 8)
    env = [float(np.sqrt(np.mean(s * s))) if len(s) else 0.0 for s in segs]
    return np.array(
        [mono.mean(), mono.std(), float(np.sqrt(np.mean(mono * mono))),
         zc, float(np.abs(mono).max(initial=0.0)),
         rate / 48000.0, samples.shape[1], len(mono) / rate, *env],
        dtype=np.float32,
    )


def video_features(frames: list[np.ndarray]) -> np.ndarray:
    """16-dim float32: frame count, global luma mean/std, mean absolute
    inter-frame difference (motion proxy), and a 12-slot temporal luma-mean
    profile (evenly sampled, zero-padded for short clips)."""
    lum = np.stack([f.astype(np.float32) / 255.0 for f in frames])
    motion = (
        float(np.mean(np.abs(np.diff(lum, axis=0)))) if len(frames) > 1 else 0.0
    )
    idx = np.linspace(0, len(frames) - 1, num=min(12, len(frames))).round().astype(int)
    profile = np.zeros(12, dtype=np.float32)
    profile[: len(idx)] = lum[idx].mean(axis=(1, 2))
    return np.concatenate(
        [[float(len(frames)), lum.mean(), lum.std(), motion], profile]
    ).astype(np.float32)


def real_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Magic-sniffing decode kernel: (width, height, 16-dim feature).

    Images: (pixel width, pixel height, image_features). Audio:
    (n_samples, n_channels, audio_features). Video (Y4M): (pixel width,
    pixel height, video_features). Raises ValueError on unknown/corrupt
    payloads — callers map that to decode_ok=false.
    """
    kind = sniff(payload)
    try:
        if kind in ("ppm", "bmp"):
            img = decode_image(payload)
            return img.shape[1], img.shape[0], image_features(img)
        if kind == "wav":
            rate, samples = decode_wav(payload)
            return samples.shape[0], samples.shape[1], audio_features(rate, samples)
        if kind == "y4m":
            w, h, frames = decode_y4m(payload)
            if not frames:
                raise ValueError("Y4M stream with zero frames")
            return w, h, video_features(frames)
    except (struct.error, IndexError) as e:  # truncated headers/chunks
        raise ValueError(f"corrupt {kind} payload: {e}") from e
    raise ValueError("unrecognized media payload")


def luma_grid(img_or_buf, out_w: int, out_h: int) -> np.ndarray:
    """Box-resample an image's luma plane to a flat row-major
    (out_h * out_w) float32 grid — the real `resize` kernel.

    Accepts either raw payload bytes or an ALREADY-DECODED (h, w, 3) array
    so callers that need dimensions + grid decode once, not twice. Every
    output cell averages a non-empty source window (hi > lo per axis via
    the +1 floor), so UPSCALING gathers nearest pixels instead of leaving
    zero holes (the old scatter-by-source-pixel form emitted 0.0 for any
    cell no source pixel mapped to — a mostly-black grid for a small white
    image). Windows come from one integral image: O(h*w) regardless of
    grid size.
    """
    img = (
        img_or_buf
        if isinstance(img_or_buf, np.ndarray)
        else decode_image(img_or_buf)
    ).astype(np.float32) / 255.0
    luma = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    h, w = luma.shape

    def bounds(src: int, out: int):
        lo = (np.arange(out) * src) // out
        hi = np.maximum((np.arange(1, out + 1) * src) // out, lo + 1)
        return lo.astype(int), np.minimum(hi, src).astype(int)

    ylo, yhi = bounds(h, out_h)
    xlo, xhi = bounds(w, out_w)
    integral = np.zeros((h + 1, w + 1), dtype=np.float64)
    integral[1:, 1:] = luma.cumsum(axis=0).cumsum(axis=1)
    cell = (
        integral[yhi][:, xhi]
        - integral[ylo][:, xhi]
        - integral[yhi][:, xlo]
        + integral[ylo][:, xlo]
    )
    counts = (yhi - ylo)[:, None] * (xhi - xlo)[None, :]
    return (cell / counts).astype(np.float32).ravel()


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis (float64): D @ x applies the 1-D transform."""
    global _DCT32
    if _DCT32 is None or _DCT32.shape[0] != n:
        k = np.arange(n)
        d = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        d *= np.sqrt(2.0 / n)
        d[0] *= np.sqrt(0.5)
        _DCT32 = d
    return _DCT32


def phash64(img_or_buf) -> int:
    """64-bit perceptual hash (pHash family: Zauner 2010): luma box-resampled
    to 32x32, 2-D DCT-II, the low-frequency 8x8 block thresholded at the
    median of its 63 AC coefficients. Robust to small pixel noise and
    resampling; Hamming distance on the codes orders perceptual similarity.
    Pure numpy, deterministic, returns a SIGNED 64-bit int (Spark LongType).
    """
    grid = luma_grid(img_or_buf, 32, 32).astype(np.float64).reshape(32, 32)
    d = _dct_matrix(32)
    coef = d @ grid @ d.T
    block = coef[:8, :8].ravel()
    med = float(np.median(block[1:]))
    bits = block > med
    code = 0
    for b in bits:
        code = (code << 1) | int(b)
    if code >= 1 << 63:
        code -= 1 << 64
    return code
