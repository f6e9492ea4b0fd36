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
    the filter byte in column 0.  Returns (h, stride) uint8.

    Filters 0/1/2 are fully vectorized (Sub is a cumsum per byte lane).
    Average/Paeth carry a left-value recurrence, so they run a
    per-scanline byte loop — but over plain-Python ``bytearray`` ints
    with locals-cached state, which measures >10x faster than the
    numpy-scalar-indexing loop it replaced (per-element numpy indexing
    plus ``abs()`` on numpy scalars dominates at that granularity).
    O(stride) Python work per Average/Paeth scanline is the honest cost
    floor without a C extension; foreign Paeth-heavy PNGs decode at
    roughly bytearray-arithmetic speed."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev_ba: bytearray | None = None  # previous row when a byte loop ran
    for y in range(h):
        ftype = int(raw[y, 0])
        if ftype in (0, 1, 2):
            prev_ba = None
            line = raw[y, 1:].astype(np.int32)
            if ftype == 0:
                out[y] = line
            elif ftype == 2:  # Up
                prev = out[y - 1].astype(np.int32) if y else 0
                out[y] = (line + prev) & 0xFF
            else:  # Sub — prefix recurrence per byte lane
                cur = line.reshape(-1, bpp)
                np.cumsum(cur, axis=0, out=cur)
                out[y] = (cur & 0xFF).reshape(-1)
            continue
        # Average (3) / Paeth (4): running-left recurrence, pure-Python
        # bytearrays (no numpy scalar indexing in the hot loop)
        line_b = raw[y, 1:].tobytes()
        if prev_ba is None:
            prev_ba = bytearray(out[y - 1]) if y else bytearray(stride)
        cur_b = bytearray(stride)
        pb_ = prev_ba
        nb = min(bpp, stride)
        if ftype == 3:
            for x in range(nb):  # a = 0 at the left edge
                cur_b[x] = (line_b[x] + (pb_[x] >> 1)) & 0xFF
            for x, lb, b in zip(range(nb, stride), line_b[nb:], pb_[nb:]):
                cur_b[x] = (lb + ((cur_b[x - bpp] + b) >> 1)) & 0xFF
        else:
            for x in range(nb):  # a = c = 0 → Paeth predictor is b
                cur_b[x] = (line_b[x] + pb_[x]) & 0xFF
            for x, lb, b, c0 in zip(range(nb, stride), line_b[nb:],
                                    pb_[nb:], pb_):
                a = cur_b[x - bpp]
                pa = b - c0
                pb2 = a - c0
                pc = pa + pb2
                if pa < 0:
                    pa = -pa
                if pb2 < 0:
                    pb2 = -pb2
                if pc < 0:
                    pc = -pc
                if pa <= pb2 and pa <= pc:
                    pred = a
                elif pb2 <= pc:
                    pred = b
                else:
                    pred = c0
                cur_b[x] = (lb + pred) & 0xFF
        out[y] = np.frombuffer(bytes(cur_b), dtype=np.uint8)
        prev_ba = cur_b
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


_Y4M_MAGIC = b"YUV4MPEG2"


def y4m_encode(frames: np.ndarray, fps: int = 4) -> bytes:
    """Encode (T,H,W) uint8 luma frames as a YUV4MPEG2 (y4m) stream with
    the ``Cmono`` colorspace — an uncompressed-frame video container
    (mjpegtools / ffmpeg interchange format): a plain-text stream header,
    then ``FRAME\\n`` + H*W luma bytes per frame.  Pure stdlib/bytes."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 3:
        raise ValueError("frames must be (T, H, W) uint8 luma")
    t, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode()
    body = b"FRAME\n".join(
        [b""] + [frames[i].tobytes() for i in range(t)])
    # join puts FRAME\n before each frame payload thanks to the leading ""
    return head + body


def y4m_decode(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono YUV4MPEG2 blob → ((T,H,W) uint8 frames, fps)."""
    nl = blob.find(b"\n")
    if nl < 0 or not blob.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = fps = None
    for tok in blob[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            fps = int(tok[1:].split(b":")[0])
        elif tok[:1] == b"C" and tok != b"Cmono":
            raise ValueError(f"unsupported y4m colorspace {tok!r}")
    if not (w and h and fps):
        raise ValueError("truncated y4m header")
    fsz = w * h
    frames = []
    pos = nl + 1
    while pos < len(blob):
        fnl = blob.find(b"\n", pos)
        if fnl < 0 or blob[pos:pos + 5] != b"FRAME":
            raise ValueError("corrupt y4m FRAME header")
        pos = fnl + 1
        if pos + fsz > len(blob):
            raise ValueError("truncated y4m frame payload")
        frames.append(np.frombuffer(blob[pos:pos + fsz],
                                    dtype=np.uint8).reshape(h, w))
        pos += fsz
    return np.stack(frames) if frames else \
        np.zeros((0, h, w), dtype=np.uint8), fps


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
