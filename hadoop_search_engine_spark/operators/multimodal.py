"""Multimodal columns: opaque binary payloads + typed metadata.

The reference's raw assets are ``.mp4`` blobs in HDFS processed by a
per-partition YOLO closure (/root/reference/processVideo/process.py:
67-174) — per-row Python, shelled-out file copies, and a full
collect() round trip. Here the same capability is Spark-shaped:

  * payloads are ``binary`` columns with typed metadata columns
    (media_type, n_bytes, sniffed container magic) — schema'd, never
    files shelled around;
  * decode / feature-extract / frame-sample run as Arrow ``mapInPandas``
    batches with an executor-singleton decoder (the one pattern worth
    keeping from the reference: its download-once-per-executor model
    bootstrap, process.py:67-73);
  * the actual media decoding is STUBBED — the image/audio libraries
    are not in this container — behind :class:`MediaDecoder`:
    ``deterministic_fake=True`` (default) produces seeded fake features
    so the distributed plumbing (schema, batching, partitioning) is
    fully testable; ``deterministic_fake=False`` raises
    NotImplementedError where a real libjpeg/ffmpeg call would go.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = {
    b"\xff\xd8\xff": "image/jpeg",
    b"\x89PNG": "image/png",
    b"RIFF": "audio/wav",
    b"\x00\x00\x00\x18ftyp": "video/mp4",
    b"\x00\x00\x00\x20ftyp": "video/mp4",
    b"<htm": "text/html",
    b"<!DO": "text/html",
}

FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "url string, media_type string, n_bytes long, "
    "n_frames int, features array<float>"
)


def sniff_media_type(payload: bytes | None) -> str:
    if not payload:
        return "application/octet-stream"
    for magic, mt in MAGIC.items():
        if payload[: len(magic)] == magic:
            return mt
    return "application/octet-stream"


class MediaDecoder:
    """Executor-singleton decoder (one instance per Python worker).

    Real decoding (PIL/ffmpeg) is not available in this container; the
    deterministic fake derives features from the payload bytes alone so
    every test assertion is reproducible. Swap in a real implementation
    by overriding ``decode``.
    """

    _instance: "MediaDecoder | None" = None

    def __init__(self, deterministic_fake: bool = True):
        self.deterministic_fake = deterministic_fake

    @classmethod
    def get(cls, deterministic_fake: bool = True) -> "MediaDecoder":
        if cls._instance is None or cls._instance.deterministic_fake != deterministic_fake:
            cls._instance = cls(deterministic_fake)
        return cls._instance

    def decode(self, payload: bytes) -> tuple[int, np.ndarray]:
        """-> (n_frames, feature vector).

        ``deterministic_fake=False`` REALLY decodes the containers
        this environment can do without external libraries — PNG
        (8-bit gray/RGB, all filters), uncompressed 24-bit BMP, and
        PCM-16 WAV, via the pure-NumPy codecs below — and derives the
        16-dim feature vector from the decoded pixels/samples
        (:func:`_stat_features`). JPEG/MP4 genuinely need
        libjpeg/ffmpeg and raise NotImplementedError. The fake path
        (default) stays byte-deterministic for plumbing tests."""
        if not self.deterministic_fake:
            if payload[:8] == b"\x89PNG\r\n\x1a\n":
                px = decode_png(payload)
                return 1, _stat_features(px, 0.0, 255.0)
            if payload[:2] == b"BM":
                px = decode_bmp(payload)
                return 1, _stat_features(px, 0.0, 255.0)
            if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                _rate, samples = decode_wav(payload)
                return len(samples), _stat_features(
                    samples, -32768.0, 32767.0
                )
            raise NotImplementedError(
                f"real decode for {sniff_media_type(payload)!r} requires "
                "libjpeg/ffmpeg, absent from this container; PNG/BMP/WAV "
                "decode natively, or use deterministic_fake=True"
            )
        from ..corpus import _splitmix64

        b = np.frombuffer(payload[:4096], dtype=np.uint8)
        seed = np.uint64(len(payload)) ^ _splitmix64(
            np.array([b.astype(np.uint64).sum()], dtype=np.uint64)
        )[0]
        h = _splitmix64(seed + np.arange(FEATURE_DIM, dtype=np.uint64))
        feats = (h.astype(np.float64) * np.float64(2.0**-64)).astype(np.float32)
        n_frames = int(seed % np.uint64(30)) + 1
        return n_frames, feats


def extract_media_features(
    assets: DataFrame,
    payload_col: str = "html",
    url_col: str = "url",
    deterministic_fake: bool = True,
    frame_sample_rate: int = 30,
) -> DataFrame:
    """binary payloads -> typed metadata + feature vectors, Arrow-batched.

    The frame-sampling knob mirrors the reference's 1-in-30 frame
    sampling (process.py:87): with the fake decoder it only affects the
    reported n_frames_sampled column, keeping batch shapes realistic.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = MediaDecoder.get(deterministic_fake)
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                n_frames, feats = decoder.decode(payload)
                rows.append(
                    (
                        url,
                        sniff_media_type(payload),
                        len(payload),
                        max(1, n_frames // frame_sample_rate),
                        feats.tolist(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["url", "media_type", "n_bytes", "n_frames", "features"],
            )

    return assets.select(url_col, payload_col).mapInPandas(run, schema=FEATURES_SCHEMA)


def blob_chunks(
    assets: DataFrame,
    chunk_size: int = 1_000_000,
    payload_col: str = "html",
    id_col: str = "url",
) -> DataFrame:
    """Byte-range chunking of a blob column — the dataflow analog of the
    reference's HTTP 206 range streaming (/root/reference/server/src/
    services/video.services.js:19-66, CHUNK_SIZE 1e6 at :35, offset
    math :36-38). Each blob explodes into consecutive
    (chunk_id, chunk binary, chunk_len, total_len) rows; pure built-in
    expressions (substring over binary is JVM-side), so a consumer can
    filter to one (id, chunk_id) and the scan prunes to that row group.
    """
    p = F.col(payload_col)
    total = F.length(p)
    n_chunks = F.greatest(F.ceil(total / F.lit(chunk_size)).cast("int"), F.lit(1))
    out = assets.select(
        F.col(id_col),
        total.alias("total_len"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.substring(p, i * chunk_size + 1, chunk_size),
            )
        ).alias("chunk_id", "chunk"),
    )
    return out.select(
        id_col, "chunk_id", "chunk",
        F.length("chunk").alias("chunk_len"), "total_len",
    )


def blob_range(
    assets: DataFrame,
    offset: int,
    length: int,
    payload_col: str = "html",
    id_col: str = "url",
) -> DataFrame:
    """One byte range [offset, offset+length) of each blob (the single
    Range-request shape); empty-past-end semantics like HTTP 206."""
    p = F.col(payload_col)
    chunk = F.substring(p, offset + 1, length)
    return assets.select(
        F.col(id_col),
        chunk.alias("chunk"),
        F.length(chunk).alias("chunk_len"),
        F.length(p).alias("total_len"),
    )


def media_metadata(assets: DataFrame, payload_col: str = "html") -> DataFrame:
    """Cheap metadata without decoding: byte length + sniffed type,
    computed with built-in expressions only (no Python)."""
    p = F.col(payload_col)
    mt = F.lit("application/octet-stream")
    for magic in sorted(MAGIC, key=len, reverse=True):
        hexs = magic.hex()
        mt = F.when(
            F.hex(F.substring(p, 1, len(magic))) == hexs.upper(), F.lit(MAGIC[magic])
        ).otherwise(mt)
    return assets.withColumn("n_bytes", F.length(p)).withColumn("media_type", mt)


# ---------------------------------------------------------------------------
# Real pure-NumPy codecs (round 4): PNG (zlib is stdlib), uncompressed
# 24-bit BMP, and PCM-16 WAV decode WITHOUT PIL/ffmpeg — so the decode
# stage is a real, oracle-checkable implementation for the containers
# this environment can honestly do. JPEG/MP4 stay gated behind
# NotImplementedError (the codecs genuinely need external libraries).
# Reference analog: the per-partition frame decode + feature stage of
# /root/reference/processVideo/process.py:75-126 (YOLO inference is
# the part that stays stubbed; the container parsing is real here).
# ---------------------------------------------------------------------------

import struct
import zlib


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal valid PNG writer: 8-bit grayscale (h, w) or RGB
    (h, w, 3), filter type 0 on every scanline, one IDAT. Produces
    files any standard viewer opens; exists so binary image columns
    can be SUNK as real PNGs and so fixtures exercise decode_png."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color_type, channels = 0, 1
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"expected (h,w) gray or (h,w,3) rgb, got {px.shape}")
    h, w = px.shape[:2]
    raw = b"".join(
        b"\x00" + px[y].tobytes() for y in range(h)
    )  # filter 0 per scanline

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Full PNG decode for 8-bit grayscale / RGB, all five scanline
    filters (None/Sub/Up/Average/Paeth), multi-IDAT: chunk walk ->
    zlib inflate -> per-scanline defilter. Interlace and palette are
    rejected explicitly."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG (bad signature)")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color_type not in (0, 2):
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color_type={color_type}); "
                    "only 8-bit gray/RGB"
                )
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            meta = (w, h, 1 if color_type == 0 else 3)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if meta is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, channels = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            out[y] = line
        elif ftype == 1:  # Sub: prefix sum at stride bpp (uint8 wraps)
            for c in range(bpp):
                out[y, c::bpp] = np.add.accumulate(line[c::bpp], dtype=np.uint8)
        elif ftype == 2:  # Up
            out[y] = line + prev
        elif ftype == 3:  # Average
            row = out[y]
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            row = out[y]
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                row[x] = (int(line[x]) + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    px = out.reshape(h, w, channels)
    return px[:, :, 0] if channels == 1 else px


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Uncompressed 24-bit BI_RGB BMP writer (bottom-up rows, BGR,
    4-byte row padding). Gray input is expanded to RGB."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=2)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h,w) or (h,w,3), got {px.shape}")
    h, w = px.shape[:2]
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    body = b"".join(
        px[y, :, ::-1].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    data_off = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
        + body
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP -> (h, w, 3) RGB uint8 (handles
    bottom-up and top-down row order, row padding)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h_signed, planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    h = abs(h_signed)
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    rows = []
    for y in range(h):
        off = data_off + y * stride
        rows.append(
            np.frombuffer(payload, dtype=np.uint8, count=row_bytes, offset=off)
            .reshape(w, 3)[:, ::-1]
        )
    px = np.stack(rows)
    return px[::-1] if h_signed > 0 else px  # bottom-up -> top-down


def encode_wav_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Canonical 44-byte-header PCM-16 WAV writer; (n,) mono or
    (n, ch)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    body = s.astype("<i2").tobytes()
    byte_rate = rate * ch * 2
    return (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate, byte_rate,
                                ch * 2, 16)
        + b"data" + struct.pack("<I", len(body)) + body
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """PCM-16 WAV -> (sample_rate, (n, ch) int16 array); walks RIFF
    chunks, so extra chunks (LIST/fact) before data are fine."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (RIFF/WAVE)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        if tag == b"fmt ":
            audio_fmt, ch, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, pos + 8
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={audio_fmt}, bits={bits}); PCM-16 only"
                )
            fmt = (ch, rate)
        elif tag == b"data":
            data = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    ch, rate = fmt
    s = np.frombuffer(data, dtype="<i2")
    return rate, s.reshape(-1, ch)


def _stat_features(values: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """16-dim deterministic features from decoded samples: [mean, std,
    min, max] normalized to [0,1] by the container's value range +
    12-bin histogram density. Population std (ddof=0)."""
    v = values.astype(np.float64).ravel()
    span = hi - lo
    base = np.array(
        [v.mean(), v.std(), v.min(), v.max()], dtype=np.float64
    )
    base = (base - np.array([lo, 0.0, lo, lo])) / span
    hist, _ = np.histogram(v, bins=12, range=(lo, hi))
    return np.concatenate([base, hist / v.size]).astype(np.float32)
