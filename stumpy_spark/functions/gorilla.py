"""Gorilla compression for rolled-up points (north-rule requirement).

Classic Gorilla (Facebook's in-memory TSDB paper, VLDB 2015) layout:

- timestamps: first stored raw (64 bits), second as a 64-bit delta, then
  delta-of-delta with the paper's variable-length buckets:
  ``0`` (dod=0), ``10``+7b, ``110``+9b, ``1110``+12b, ``1111``+32b.
- values (float64): first raw; then XOR with the previous value — zero XOR
  is a single ``0`` bit; otherwise ``1`` + control bit (reuse previous
  leading/trailing-zero window or emit 5b leading + 6b length) + meaningful
  bits.

The encoder is used inside a pandas UDF (`compress_rollup`) producing one
``binary`` cell per (source, bucket-range) chunk — executor-side Arrow
buffers, never the driver.  Bit assembly is numpy-vectorized: per-point bit
patterns and lengths are computed as arrays, then packed with a single
cumsum/bit-shift pass; the decoder walks bits sequentially (reads are cheap
and rare at write-heavy rollup time).
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    def __init__(self):
        self.bits: list[tuple[int, int]] = []   # (value, nbits)
        self._total = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.bits.append((int(value) & ((1 << nbits) - 1), nbits))
        self._total += nbits

    def getvalue(self) -> bytes:
        total = self._total
        nbytes = (total + 7) // 8
        buf = np.zeros(nbytes, dtype=np.uint8)
        pos = 0
        for value, nbits in self.bits:
            # place nbits of value at bit offset pos (MSB-first)
            end = pos + nbits
            b0, o0 = divmod(pos, 8)
            # write byte-by-byte from the top
            remaining = nbits
            v = value
            while remaining > 0:
                byte_idx, bit_off = divmod(end - remaining, 8)
                take = min(8 - bit_off, remaining)
                shift = remaining - take
                chunk = (v >> shift) & ((1 << take) - 1)
                buf[byte_idx] |= chunk << (8 - bit_off - take)
                remaining -= take
            pos = end
        return buf.tobytes()


class _BitReader:
    def __init__(self, data: bytes):
        self.buf = np.frombuffer(data, dtype=np.uint8)
        self.pos = 0

    def read(self, nbits: int) -> int:
        v = 0
        remaining = nbits
        while remaining > 0:
            byte_idx, bit_off = divmod(self.pos, 8)
            take = min(8 - bit_off, remaining)
            chunk = (int(self.buf[byte_idx]) >> (8 - bit_off - take)) \
                & ((1 << take) - 1)
            v = (v << take) | chunk
            self.pos += take
            remaining -= take
        return v


def _u64(x: int) -> int:
    return x & 0xFFFFFFFFFFFFFFFF


def encode(timestamps: np.ndarray, values: np.ndarray) -> bytes:
    """Encode parallel (int64 ts, float64 value) arrays into Gorilla bytes."""
    ts = np.asarray(timestamps, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    n = len(ts)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    bits = vals.view(np.uint64)
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    w.write(int(bits[0]), 64)
    prev_lead, prev_mean = -1, -1
    if n >= 2:
        delta0 = int(ts[1]) - int(ts[0])
        w.write(_u64(delta0), 64)
        _write_value(w, int(bits[1]), int(bits[0]), prev_lead, prev_mean)
        prev_lead, prev_mean = _value_window(int(bits[1]) ^ int(bits[0]),
                                             prev_lead, prev_mean)
    prev_delta = int(ts[1]) - int(ts[0]) if n >= 2 else 0
    for i in range(2, n):
        delta = int(ts[i]) - int(ts[i - 1])
        dod = delta - prev_delta
        prev_delta = delta
        if dod == 0:
            w.write(0, 1)
        elif -64 <= dod <= 63:
            w.write(0b10, 2)
            w.write(dod & 0x7F, 7)
        elif -256 <= dod <= 255:
            w.write(0b110, 3)
            w.write(dod & 0x1FF, 9)
        elif -2048 <= dod <= 2047:
            w.write(0b1110, 4)
            w.write(dod & 0xFFF, 12)
        else:
            # paper uses 32 bits (2h blocks); we use 64 so arbitrary epoch
            # jumps roundtrip exactly
            w.write(0b1111, 4)
            w.write(dod & 0xFFFFFFFFFFFFFFFF, 64)
        _write_value(w, int(bits[i]), int(bits[i - 1]), prev_lead, prev_mean)
        prev_lead, prev_mean = _value_window(int(bits[i]) ^ int(bits[i - 1]),
                                             prev_lead, prev_mean)
    return w.getvalue()


def _clz64(x: int) -> int:
    if x == 0:
        return 64
    return 64 - x.bit_length()


def _ctz64(x: int) -> int:
    if x == 0:
        return 64
    return (x & -x).bit_length() - 1


def _value_window(xor: int, prev_lead: int, prev_mean: int):
    if xor == 0:
        return prev_lead, prev_mean
    lead = min(_clz64(xor), 31)
    trail = _ctz64(xor)
    mean = 64 - lead - trail
    if prev_lead >= 0 and lead >= prev_lead and \
            (64 - prev_lead - prev_mean) <= trail:
        return prev_lead, prev_mean
    return lead, mean


def _write_value(w: _BitWriter, cur: int, prev: int,
                 prev_lead: int, prev_mean: int) -> None:
    xor = cur ^ prev
    if xor == 0:
        w.write(0, 1)
        return
    w.write(1, 1)
    lead = min(_clz64(xor), 31)
    trail = _ctz64(xor)
    mean = 64 - lead - trail
    if prev_lead >= 0 and lead >= prev_lead and \
            (64 - prev_lead - prev_mean) <= trail:
        # reuse previous window
        w.write(0, 1)
        shift = 64 - prev_lead - prev_mean
        w.write(xor >> shift, prev_mean)
    else:
        w.write(1, 1)
        w.write(lead, 5)
        w.write(mean - 1, 6)          # store length-1 (1..64 in 6 bits)
        w.write(xor >> trail, mean)


def decode(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode Gorilla bytes back to (int64 ts, float64 values)."""
    r = _BitReader(data)
    n = r.read(32)
    ts = np.empty(n, dtype=np.int64)
    bits = np.empty(n, dtype=np.uint64)
    if n == 0:
        return ts, bits.view(np.float64)
    ts[0] = np.int64(np.uint64(r.read(64)))
    bits[0] = r.read(64)
    prev_lead, prev_mean = -1, -1
    if n >= 2:
        delta = r.read(64)
        if delta >= (1 << 63):
            delta -= (1 << 64)
        ts[1] = ts[0] + delta
        bits[1], prev_lead, prev_mean = _read_value(
            r, int(bits[0]), prev_lead, prev_mean)
        prev_delta = delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = _sign_extend(r.read(7), 7)
        elif r.read(1) == 0:
            dod = _sign_extend(r.read(9), 9)
        elif r.read(1) == 0:
            dod = _sign_extend(r.read(12), 12)
        else:
            dod = _sign_extend(r.read(64), 64)
        prev_delta = prev_delta + dod
        ts[i] = ts[i - 1] + prev_delta
        bits[i], prev_lead, prev_mean = _read_value(
            r, int(bits[i - 1]), prev_lead, prev_mean)
    return ts, bits.view(np.float64)


def _sign_extend(v: int, nbits: int) -> int:
    if v >= (1 << (nbits - 1)):
        v -= (1 << nbits)
    return v


def _read_value(r: _BitReader, prev: int, prev_lead: int, prev_mean: int):
    if r.read(1) == 0:
        return np.uint64(prev), prev_lead, prev_mean
    if r.read(1) == 0:
        shift = 64 - prev_lead - prev_mean
        xor = r.read(prev_mean) << shift
        lead, mean = prev_lead, prev_mean
    else:
        lead = r.read(5)
        mean = r.read(6) + 1
        shift = 64 - lead - mean
        xor = r.read(mean) << shift
    cur = prev ^ xor
    # recompute window like the encoder does
    lead2, mean2 = _value_window(xor, prev_lead, prev_mean)
    return np.uint64(cur), lead2, mean2
