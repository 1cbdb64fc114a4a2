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
        """-> (n_frames, feature vector). STUB: see module docstring."""
        if not self.deterministic_fake:
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg, absent from this "
                "container; use deterministic_fake=True for plumbing tests"
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
