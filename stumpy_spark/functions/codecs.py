"""Pure-stdlib media codecs: PNG (zlib inflate + unfilter) and WAV (PCM16).

This container has no image/audio libraries, so the engine carries its own
minimal, dependency-free codecs for the two formats the multimodal pipeline
decodes for real:

- **PNG**: 8-bit greyscale / RGB / RGBA, non-interlaced — encoder writes
  filter-0 scanlines; decoder inflates the IDAT stream and reverses all
  five standard filter types (None/Sub/Up/Average/Paeth), so it reads
  PNGs produced by any conforming encoder, not just its own.
- **WAV**: PCM 16-bit little-endian via the stdlib ``wave`` module.

Everything is vectorized numpy per image/clip; these run inside
``mapInPandas`` Arrow batches (see ``multimodal.py``) so there is no
per-row Python in the Spark hot path beyond the per-blob decode itself,
which is irreducibly per-object work.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> channels (8-bit only)
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + \
        struct.pack(">I", crc)


def png_encode(arr: np.ndarray) -> bytes:
    """Encode a (H,W) or (H,W,C) uint8 array as a non-interlaced PNG
    (filter 0 on every scanline)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    # prepend filter byte 0 to each scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8),
         arr.reshape(h, w * c)], axis=1).tobytes()
    return (_PNG_SIG + _chunk(b"IHDR", ihdr) +
            _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b""))


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters.  ``raw`` is (h, 1+stride) uint8 with
    the filter byte in column 0.  Returns (h, stride) uint8."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(
            stride, dtype=np.int32)
        if ftype == 0:
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif ftype == 1:  # Sub — prefix recurrence per byte lane
            cur = line.reshape(-1, bpp)
            np.cumsum(cur, axis=0, out=cur)
            out[y] = (cur & 0xFF).reshape(-1)
        else:  # Average (3) / Paeth (4) need the running left value
            cur = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 3:
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c0 = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c0
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c0)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c0
                    cur[x] = (line[x] + pred) & 0xFF
            out[y] = cur
    return out


def png_decode(blob: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG → (H,W) or (H,W,C) uint8."""
    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = []
    w = h = None
    channels = None
    while pos + 8 <= len(blob):
        (ln,) = struct.unpack(">I", blob[pos:pos + 4])
        tag = blob[pos + 4:pos + 8]
        payload = blob[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", payload)
            if depth != 8 or ilace != 0 or ctype not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth} ctype={ctype} "
                    f"interlace={ilace})")
            channels = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    px = _unfilter(rows, h, stride, channels)
    arr = px.reshape(h, w, channels)
    return arr[:, :, 0] if channels == 1 else arr


def wav_encode(samples: np.ndarray, rate: int = 16000,
               channels: int = 1) -> bytes:
    """Encode int16 PCM samples as a WAV blob (stdlib ``wave``)."""
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def wav_decode(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 WAV blob → (samples int16 ndarray, sample_rate)."""
    with wave.open(io.BytesIO(blob), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    return np.frombuffer(frames, dtype=np.int16).copy(), rate


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize of a (H,W[,C]) uint8 image."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[ys][:, xs]


def image_feature(arr: np.ndarray, grid: int = 8) -> np.ndarray:
    """64-dim feature: grid×grid mean-pooled greyscale in [0,1]."""
    if arr.ndim == 3:
        arr = arr.mean(axis=2)
    h, w = arr.shape
    ys = np.minimum(np.arange(h) * grid // max(h, 1), grid - 1)
    xs = np.minimum(np.arange(w) * grid // max(w, 1), grid - 1)
    sums = np.zeros((grid, grid), dtype=np.float64)
    cnts = np.zeros((grid, grid), dtype=np.int64)
    np.add.at(sums, (ys[:, None], xs[None, :]), arr)
    np.add.at(cnts, (ys[:, None], xs[None, :]), 1)
    cnts[cnts == 0] = 1
    return (sums / cnts / 255.0).astype(np.float32).reshape(-1)


def audio_feature(samples: np.ndarray, bins: int = 64) -> np.ndarray:
    """64-dim feature: per-bin mean |amplitude| in [0,1]."""
    n = len(samples)
    if n == 0:
        return np.zeros(bins, dtype=np.float32)
    amp = np.abs(samples.astype(np.float64)) / 32768.0
    idx = np.minimum(np.arange(n) * bins // n, bins - 1)
    sums = np.bincount(idx, weights=amp, minlength=bins)
    cnts = np.maximum(np.bincount(idx, minlength=bins), 1)
    return (sums / cnts).astype(np.float32)
