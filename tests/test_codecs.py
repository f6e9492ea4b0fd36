"""Pure-stdlib PNG/WAV codec unit tests (no Spark)."""

import struct
import zlib

import numpy as np
import pytest

from stumpy_spark.functions.codecs import (audio_feature, image_feature,
                                           png_decode, png_encode,
                                           resize_nearest, wav_decode,
                                           wav_encode)


@pytest.mark.parametrize("shape", [(17, 23), (9, 13, 3), (5, 7, 4),
                                   (1, 1), (2, 300, 3)])
def test_png_roundtrip(shape):
    rs = np.random.RandomState(hash(shape) % 2**31)
    a = rs.randint(0, 256, size=shape, dtype=np.uint8)
    b = png_decode(png_encode(a))
    assert b.shape == a.shape
    np.testing.assert_array_equal(a, b)


def _encode_with_filters(px, ftypes):
    """Reference PNG writer using explicit per-scanline filter types, to
    prove the decoder handles Sub/Up/Average/Paeth from other encoders."""
    h, w, c = px.shape
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int32)
    out = []
    for y, ft in enumerate(ftypes):
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
        line = flat[y]
        enc = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = line[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else \
                    (b if pb <= pc else cc)
            enc[x] = (line[x] - pred) & 0xFF
        out.append(bytes([ft]) + bytes(enc.astype(np.uint8)))
    raw = b"".join(out)

    def chunk(tag, pl):
        return (struct.pack(">I", len(pl)) + tag + pl +
                struct.pack(">I", zlib.crc32(tag + pl) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n" +
            chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)) +
            chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_decode_foreign_filters():
    rs = np.random.RandomState(7)
    px = rs.randint(0, 256, (6, 5, 3)).astype(np.uint8)
    blob = _encode_with_filters(px, [0, 1, 2, 3, 4, 1])
    np.testing.assert_array_equal(png_decode(blob), px)


def _naive_unfilter(raw, h, stride, bpp):
    """Spec-literal per-byte PNG unfilter (RFC 2083 §6) — the oracle for
    the engine's fast-path `_unfilter`."""
    out = np.zeros((h, stride), dtype=np.int32)
    for y in range(h):
        ftype = int(raw[y, 0])
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = out[y, x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            v = int(raw[y, 1 + x])
            if ftype == 1:
                v += a
            elif ftype == 2:
                v += b
            elif ftype == 3:
                v += (a + b) >> 1
            elif ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                v += a if pa <= pb and pa <= pc else \
                    (b if pb <= pc else c)
            out[y, x] = v & 0xFF
    return out.astype(np.uint8)


def test_unfilter_matches_naive_all_bpp():
    from stumpy_spark.functions.codecs import _unfilter
    rs = np.random.RandomState(11)
    for bpp in (1, 2, 3, 4):
        for _ in range(3):
            h = int(rs.randint(1, 24))
            stride = int(rs.randint(1, 24)) * bpp
            raw = rs.randint(0, 256, size=(h, 1 + stride)).astype(np.uint8)
            raw[:, 0] = rs.randint(0, 5, size=h)
            np.testing.assert_array_equal(
                _unfilter(raw, h, stride, bpp),
                _naive_unfilter(raw, h, stride, bpp))


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all....")


def test_wav_roundtrip():
    rs = np.random.RandomState(3)
    s = rs.randint(-32768, 32768, 4321).astype(np.int16)
    s2, rate = wav_decode(wav_encode(s, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(s, s2)


def test_resize_nearest_identity_and_shape():
    rs = np.random.RandomState(1)
    a = rs.randint(0, 256, (10, 8, 3)).astype(np.uint8)
    np.testing.assert_array_equal(resize_nearest(a, 8, 10), a)
    assert resize_nearest(a, 3, 20).shape == (20, 3, 3)


def test_features_shape_and_range():
    rs = np.random.RandomState(2)
    img = rs.randint(0, 256, (30, 40, 3)).astype(np.uint8)
    f = image_feature(img)
    assert f.shape == (64,) and (0 <= f).all() and (f <= 1).all()
    # constant image → constant feature
    flat = image_feature(np.full((16, 16), 128, dtype=np.uint8))
    np.testing.assert_allclose(flat, 128 / 255.0, rtol=1e-6)
    s = rs.randint(-32768, 32768, 1000).astype(np.int16)
    g = audio_feature(s)
    assert g.shape == (64,) and (0 <= g).all() and (g <= 1).all()
    assert audio_feature(np.zeros(0, dtype=np.int16)).sum() == 0
