"""Pure-NumPy media codecs (round 4): PNG / BMP / WAV encode+decode
without PIL/ffmpeg, and the MediaDecoder real-decode dispatch.

Reference analog: the container-parsing half of the reference's video
feature stage (/root/reference/processVideo/process.py:75-126); the
model-inference half (YOLO) stays honestly gated.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from hadoop_search_engine_spark.operators.multimodal import (
    MediaDecoder,
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav_pcm16,
)


def test_png_gray_round_trip():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (23, 31), dtype=np.uint8)
    assert (decode_png(encode_png(px)) == px).all()


def test_png_rgb_round_trip():
    rng = np.random.default_rng(12)
    px = rng.integers(0, 256, (7, 9, 3), dtype=np.uint8)
    out = decode_png(encode_png(px))
    assert out.shape == (7, 9, 3) and (out == px).all()


def _png_with_filters(px: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG whose scanlines use the given filter types, so
    the decoder's Sub/Up/Average/Paeth paths are exercised (our encoder
    only emits filter 0)."""
    h, w = px.shape
    from hadoop_search_engine_spark.operators.multimodal import _paeth

    lines = []
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        f = filters[y % len(filters)]
        row = px[y]
        if f == 0:
            filt = row.copy()
        elif f == 1:
            filt = row - np.concatenate([[0], row[:-1]])
        elif f == 2:
            filt = row - prev
        elif f == 3:
            filt = np.array(
                [
                    (int(row[x]) - ((int(row[x - 1]) if x else 0)
                                    + int(prev[x])) // 2) & 0xFF
                    for x in range(w)
                ],
                dtype=np.uint8,
            )
        else:  # paeth
            filt = np.array(
                [
                    (int(row[x]) - _paeth(
                        int(row[x - 1]) if x else 0,
                        int(prev[x]),
                        int(prev[x - 1]) if x else 0,
                    )) & 0xFF
                    for x in range(w)
                ],
                dtype=np.uint8,
            )
        lines.append(bytes([f]) + filt.astype(np.uint8).tobytes())
        prev = row

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


def test_png_all_five_filters_decode():
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (10, 12), dtype=np.uint8)
    payload = _png_with_filters(px, [0, 1, 2, 3, 4])
    assert (decode_png(payload) == px).all()


def test_png_multi_idat_and_rejects():
    # split the IDAT of a valid file into two chunks
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    raw = encode_png(px)
    # find IDAT
    off = raw.index(b"IDAT") - 4
    (ln,) = struct.unpack_from(">I", raw, off)
    data = raw[off + 8 : off + 8 + ln]
    mid = len(data) // 2

    def chunk(tag, d):
        return (struct.pack(">I", len(d)) + tag + d
                + struct.pack(">I", zlib.crc32(tag + d) & 0xFFFFFFFF))

    rebuilt = (
        raw[:off] + chunk(b"IDAT", data[:mid]) + chunk(b"IDAT", data[mid:])
        + raw[off + 12 + ln:]
    )
    assert (decode_png(rebuilt) == px).all()
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"notapng")
    # 16-bit depth rejected explicitly
    ihdr16 = struct.pack(">IIBBBBB", 8, 8, 16, 0, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
           + chunk(b"IDAT", zlib.compress(b"\x00" * (8 * 16 + 8)))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(bad)


def test_bmp_round_trip_and_padding():
    rng = np.random.default_rng(14)
    # width 5 -> 15-byte rows -> 1 byte padding exercised
    px = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(px)) == px).all()
    gray = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    out = decode_bmp(encode_bmp(gray))
    assert (out[:, :, 0] == gray).all() and (out[:, :, 1] == gray).all()
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"nope")


def test_wav_round_trip_mono_stereo():
    rng = np.random.default_rng(15)
    mono = rng.integers(-32768, 32767, 200).astype(np.int16)
    rate, out = decode_wav(encode_wav_pcm16(mono, 16000))
    assert rate == 16000 and out.shape == (200, 1) and (out[:, 0] == mono).all()
    stereo = rng.integers(-32768, 32767, (64, 2)).astype(np.int16)
    rate2, out2 = decode_wav(encode_wav_pcm16(stereo, 44100))
    assert rate2 == 44100 and (out2 == stereo).all()
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x00" * 16)


def test_wav_extra_chunk_walk():
    """Decoder walks RIFF chunks — a LIST chunk between fmt and data
    must be skipped (real-world WAVs carry metadata chunks)."""
    s = np.arange(-50, 50, dtype=np.int16)
    raw = encode_wav_pcm16(s, 8000)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = raw[:fmt_end] + extra + raw[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate, out = decode_wav(patched)
    assert rate == 8000 and (out[:, 0] == s).all()


def test_media_decoder_real_dispatch():
    dec = MediaDecoder(deterministic_fake=False)
    px = np.arange(256, dtype=np.uint8).reshape(16, 16)
    n_frames, feats = dec.decode(encode_png(px))
    assert n_frames == 1 and feats.shape == (16,)
    # [mean,std,min,max]/255 then 12 histogram densities summing to 1
    assert feats[0] == pytest.approx(127.5 / 255.0, abs=1e-6)
    assert feats[2] == 0.0 and feats[3] == 1.0
    assert feats[4:].sum() == pytest.approx(1.0, abs=1e-6)

    s = np.zeros(100, dtype=np.int16)
    n, feats_w = dec.decode(encode_wav_pcm16(s))
    assert n == 100 and feats_w.shape == (16,)

    bmp = encode_bmp(px)
    n_b, feats_b = dec.decode(bmp)
    assert n_b == 1

    with pytest.raises(NotImplementedError, match="libjpeg/ffmpeg"):
        dec.decode(b"\xff\xd8\xff\xe0fakejpeg")
    with pytest.raises(NotImplementedError):
        dec.decode(b"\x00\x00\x00\x18ftypisommp4")


def test_media_decoder_fake_path_unchanged():
    """The plumbing-test fake stays byte-deterministic and available."""
    dec = MediaDecoder.get(deterministic_fake=True)
    a = dec.decode(b"some payload bytes")
    b = dec.decode(b"some payload bytes")
    assert a[0] == b[0] and (a[1] == b[1]).all()
