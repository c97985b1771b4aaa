"""rANS 4x8 entropy codec (CRAM 3.0 spec §13; byte-oriented range
asymmetric numeral system with 4 interleaved states, 12-bit
frequencies).

Decoder semantics: state ``i % 4`` decodes output byte ``i`` in order-0;
in order-1 each state owns a quarter segment of the output and the
context is the previous byte of that segment (state 3's segment extends
over the remainder). Encoding runs the exact step sequence in reverse,
prepending renormalization bytes, so the streams interoperate with
htslib's rans_static.

This is the pure-Python implementation (used by the CRAM reader for
arbitrary inputs and by the writer/tests); hot-path decoding can move
to libpancov_io later.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

TOTFREQ = 1 << 12
SHIFT = 12
RANS_BYTE_L = 1 << 23


# ----------------------------------------------------------------------
# frequency tables
def _read_freq(buf: bytes, p: int) -> Tuple[int, int]:
    f = buf[p]
    p += 1
    if f >= 128:
        f = ((f & 127) << 8) | buf[p]
        p += 1
    return f, p


def _write_freq(f: int) -> bytes:
    if f < 128:
        return bytes([f])
    return bytes([128 | (f >> 8), f & 0xFF])


def _read_table(buf: bytes, p: int) -> Tuple[np.ndarray, int]:
    """Order-0 style symbol table: sorted symbols with RLE for runs."""
    freq = np.zeros(256, np.int64)
    rle = 0
    j = buf[p]
    p += 1
    while True:
        f, p = _read_freq(buf, p)
        freq[j] = f
        if rle > 0:
            rle -= 1
            j += 1
        else:
            nj = buf[p]
            p += 1
            if nj == j + 1:
                rle = buf[p]
                p += 1
            j = nj
        if j == 0:
            break
    return freq, p


def _write_table(freq: np.ndarray) -> bytes:
    syms = [int(s) for s in np.nonzero(freq)[0]]
    out = bytearray()
    rle = 0
    for i, s in enumerate(syms):
        if rle > 0:
            rle -= 1
        else:
            out.append(s)
            if i and s == syms[i - 1] + 1:
                # count the run of consecutive symbols that follows
                run = 0
                while i + run + 1 <= len(syms) - 1 and \
                        syms[i + run + 1] == s + run + 1:
                    run += 1
                out.append(run)
                rle = run
        out += _write_freq(int(freq[s]))
    out.append(0)
    return bytes(out)


def _normalize(counts: np.ndarray) -> np.ndarray:
    """Scale counts so present symbols get >= 1 and the sum is 4096."""
    total = counts.sum()
    if total == 0:
        raise ValueError("cannot encode empty data")
    freq = (counts * TOTFREQ // total).astype(np.int64)
    freq[(counts > 0) & (freq == 0)] = 1
    # fix the rounding drift on the most frequent symbol
    drift = TOTFREQ - freq.sum()
    freq[int(np.argmax(freq))] += drift
    if freq[int(np.argmax(freq))] <= 0:
        raise ValueError("frequency normalization failed")
    return freq


def _cumulative(freq: np.ndarray) -> np.ndarray:
    c = np.zeros(257, np.int64)
    c[1:] = np.cumsum(freq)
    return c


# ----------------------------------------------------------------------
# encode
class _Enc:
    __slots__ = ("x",)

    def __init__(self):
        self.x = RANS_BYTE_L

    def put(self, out: bytearray, start: int, f: int):
        x = self.x
        x_max = ((RANS_BYTE_L >> SHIFT) << 8) * f
        while x >= x_max:
            out.append(x & 0xFF)
            x >>= 8
        self.x = ((x // f) << SHIFT) + (x % f) + start

    def flush(self, out: bytearray):
        x = self.x
        out += bytes([(x >> 0) & 0xFF, (x >> 8) & 0xFF,
                      (x >> 16) & 0xFF, (x >> 24) & 0xFF])[::-1]


def _encode_order0(data: bytes) -> bytes:
    n = len(data)
    arr = np.frombuffer(data, np.uint8)
    counts = np.bincount(arr, minlength=256).astype(np.int64)
    freq = _normalize(counts)
    cum = _cumulative(freq)
    table = _write_table(freq)

    out = bytearray()  # reversed stream
    states = [_Enc() for _ in range(4)]
    for i in range(n - 1, -1, -1):
        s = data[i]
        states[i % 4].put(out, int(cum[s]), int(freq[s]))
    for j in (3, 2, 1, 0):
        states[j].flush(out)
    return table + bytes(reversed(out))


def _encode_order1(data: bytes) -> bytes:
    n = len(data)
    if n < 4:
        raise ValueError("order-1 needs >= 4 bytes")
    isz4 = n >> 2
    counts = np.zeros((256, 256), np.int64)
    segs = [(0, isz4), (isz4, 2 * isz4), (2 * isz4, 3 * isz4),
            (3 * isz4, n)]
    for a, b in segs:
        ctx = 0
        for i in range(a, b):
            counts[ctx][data[i]] += 1
            ctx = data[i]
    freq = np.zeros_like(counts)
    cum = np.zeros((256, 257), np.int64)
    table = bytearray()
    # context table uses the same RLE layout one level up
    ctxs = [int(c) for c in np.nonzero(counts.sum(axis=1))[0]]
    rle = 0
    for k, c in enumerate(ctxs):
        freq[c] = _normalize(counts[c])
        cum[c] = _cumulative(freq[c])
        if rle > 0:
            rle -= 1
        else:
            table.append(c)
            if k and c == ctxs[k - 1] + 1:
                run = 0
                while k + run + 1 <= len(ctxs) - 1 and \
                        ctxs[k + run + 1] == c + run + 1:
                    run += 1
                table.append(run)
                rle = run
        table += _write_table(freq[c])
    table.append(0)

    # decode step order: i = 0..isz4-1 with states 0..3, then the
    # remainder with state 3; encode in exact reverse
    steps: List[Tuple[int, int]] = []  # (state, position)
    for i in range(isz4):
        for j in range(4):
            steps.append((j, segs[j][0] + i))
    for i in range(3 * isz4 + isz4, n):
        steps.append((3, i))

    out = bytearray()
    states = [_Enc() for _ in range(4)]
    for j, posn in reversed(steps):
        s = data[posn]
        a = segs[j][0]
        ctx = data[posn - 1] if posn > a else 0
        states[j].put(out, int(cum[ctx][s]), int(freq[ctx][s]))
    for j in (3, 2, 1, 0):
        states[j].flush(out)
    return bytes(table) + bytes(reversed(out))


def rans_encode(data: bytes, order: int = 0) -> bytes:
    if len(data) == 0:
        body = b""
        comp = b""
    else:
        comp = _encode_order0(data) if order == 0 else \
            _encode_order1(data)
        body = comp
    import struct

    return bytes([order]) + struct.pack("<II", len(body), len(data)) + \
        body


# ----------------------------------------------------------------------
# decode
def _decode_order0(buf: bytes, p: int, out_sz: int) -> bytes:
    freq, p = _read_table(buf, p)
    cum = _cumulative(freq)
    # symbol lookup per 12-bit slot
    ssym = np.repeat(np.arange(256, dtype=np.uint8),
                     freq.astype(np.int64))
    R = [int.from_bytes(buf[p + 4 * j: p + 4 * j + 4], "little")
         for j in range(4)]
    p += 16
    out = bytearray(out_sz)
    mask = TOTFREQ - 1
    n = len(buf)
    for i in range(out_sz):
        j = i & 3
        x = R[j]
        m = x & mask
        s = int(ssym[m])
        out[i] = s
        x = int(freq[s]) * (x >> SHIFT) + m - int(cum[s])
        while x < RANS_BYTE_L and p < n:
            x = (x << 8) | buf[p]
            p += 1
        R[j] = x
    return bytes(out)


def _decode_order1(buf: bytes, p: int, out_sz: int) -> bytes:
    freq = np.zeros((256, 256), np.int64)
    cum = np.zeros((256, 257), np.int64)
    ssym = {}
    rle = 0
    i = buf[p]
    p += 1
    while True:
        f, p = _read_table(buf, p)
        freq[i] = f
        cum[i] = _cumulative(f)
        ssym[i] = np.repeat(np.arange(256, dtype=np.uint8),
                            f.astype(np.int64))
        if rle > 0:
            rle -= 1
            i += 1
        else:
            ni = buf[p]
            p += 1
            if ni == i + 1:
                rle = buf[p]
                p += 1
            i = ni
        if i == 0:
            break
    R = [int.from_bytes(buf[p + 4 * j: p + 4 * j + 4], "little")
         for j in range(4)]
    p += 16
    isz4 = out_sz >> 2
    segs = [0, isz4, 2 * isz4, 3 * isz4]
    ctx = [0, 0, 0, 0]
    out = bytearray(out_sz)
    mask = TOTFREQ - 1
    n = len(buf)

    def step(j: int, posn: int):
        nonlocal p
        x = R[j]
        m = x & mask
        c = ctx[j]
        s = int(ssym[c][m])
        out[posn] = s
        x = int(freq[c][s]) * (x >> SHIFT) + m - int(cum[c][s])
        while x < RANS_BYTE_L and p < n:
            x = (x << 8) | buf[p]
            p += 1
        R[j] = x
        ctx[j] = s

    for i2 in range(isz4):
        for j in range(4):
            step(j, segs[j] + i2)
    for posn in range(4 * isz4, out_sz):
        step(3, posn)
    return bytes(out)


def rans_decode(data: bytes, out_size: int) -> bytes:
    import struct

    order = data[0]
    comp_sz, raw_sz = struct.unpack_from("<II", data, 1)
    if raw_sz != out_size:
        raise ValueError(
            f"rANS raw size mismatch ({raw_sz} != {out_size})")
    if out_size == 0:
        return b""
    if order == 0:
        return _decode_order0(data, 9, out_size)
    if order == 1:
        return _decode_order1(data, 9, out_size)
    raise ValueError(f"unsupported rANS order {order}")
