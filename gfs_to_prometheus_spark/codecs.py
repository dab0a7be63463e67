"""Chunk codecs: delta-of-delta timestamps + Gorilla XOR floats + Geode
compact ints — pure numpy, invoked only inside vectorized pandas UDFs
(chunks.py). Public algorithms:

* Gorilla XOR float compression and delta-of-delta timestamp buckets:
  Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time Series
  Database", VLDB 2015 (the format Prometheus TSDB chunks use — invoked
  by the reference at /root/reference/internal/tsdb/writer.go:34,60).
* Geode compact int encoding: the reference DECODES this form on its
  input path (/root/reference/internal/gfs/statarchive.go:1034-1088);
  we implement both directions from the public semantics: a token byte
  in [-128,-122] announces a 2..8-byte big-endian two's-complement
  payload, any other byte IS the value (so one byte covers [-121,127]).

Bit layout (our chunk format, stable; versioned by chunks.py):

timestamps (DoD):
    t0      : 64 raw bits (int64 epoch-ms)
    dod_i   : '0'                      if dod == 0
              '10'   + 7-bit  zigzag   if it fits
              '110'  + 11-bit zigzag   if it fits
              '1110' + 17-bit zigzag   if it fits
              '1111' + 64-bit zigzag   otherwise
    (dod_1 is the first delta itself — i.e. delta vs an implicit 0)

values (Gorilla XOR):
    v0      : 64 raw bits (float64)
    x_i = bits(v_i) XOR bits(v_{i-1}):
              '0'                                      if x == 0
              '1' + 5-bit #lead + 6-bit #meaningful(mod 64) + meaningful bits
    (classic Gorilla adds a window-reuse '10' control; we keep the
    encoder stateless — one fewer sequential dependency, ~1 bit/sample
    cost, same asymptotic compression)

Encode is fully vectorized (numpy bit scatter via searchsorted); decode
walks the bit stream sequentially (data-dependent control flow) over a
pre-unpacked bit array — chunk-local, no per-sample allocation.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_ALL1 = np.uint64(0xFFFFFFFFFFFFFFFF)

# ---------------------------------------------------------------------------
# bit-level helpers
# ---------------------------------------------------------------------------


def _zigzag(v: np.ndarray) -> np.ndarray:
    """int64 -> uint64 zigzag (small magnitudes -> small codes)."""
    v = np.ascontiguousarray(v, dtype=np.int64)
    u = v.view(_U64)
    sign = (v >> np.int64(63)).view(_U64)  # all-ones for negatives
    return ((u << _U64(1)) & _ALL1) ^ sign


def _unzigzag_scalar(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _pack_bits(vals: np.ndarray, nbits: np.ndarray) -> bytes:
    """Pack vals[i]'s low nbits[i] bits (each <= 64), MSB-first.

    Vectorized: each output bit's (element, position-in-field) comes from
    searchsorted over cumulative bit offsets — no Python loop.
    """
    vals = np.ascontiguousarray(vals, dtype=_U64)
    nbits = np.ascontiguousarray(nbits, dtype=np.int64)
    ends = np.cumsum(nbits)
    total = int(ends[-1]) if len(ends) else 0
    if total == 0:
        return b""
    starts = ends - nbits
    idx = np.arange(total, dtype=np.int64)
    elem = np.searchsorted(ends, idx, side="right")
    shift = (nbits[elem] - 1 - (idx - starts[elem])).astype(_U64)
    bits = ((vals[elem] >> shift) & _U64(1)).astype(np.uint8)
    return np.packbits(bits).tobytes()


class _BitReader:
    __slots__ = ("bits", "pos")

    def __init__(self, buf: bytes):
        self.bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        p = self.pos
        self.pos = p + n
        out = 0
        for b in self.bits[p : p + n]:
            out = (out << 1) | int(b)
        return out

    def read_bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b


# ---------------------------------------------------------------------------
# delta-of-delta timestamps
# ---------------------------------------------------------------------------

# (prefix bits value, prefix width, payload width)
_DOD_BUCKETS = ((0b10, 2, 7), (0b110, 3, 11), (0b1110, 4, 17), (0b1111, 4, 64))


def dod_encode(ts_ms: np.ndarray) -> bytes:
    """Delta-of-delta encode a non-decreasing int64 epoch-ms array."""
    ts = np.ascontiguousarray(ts_ms, dtype=np.int64)
    n = len(ts)
    if n == 0:
        return b""
    head_v = ts[:1].view(_U64)
    head_n = np.array([64], dtype=np.int64)
    if n == 1:
        return _pack_bits(head_v, head_n)

    deltas = np.diff(ts)
    dods = np.empty(n - 1, dtype=np.int64)
    dods[0] = deltas[0]
    dods[1:] = np.diff(deltas)
    z = _zigzag(dods)

    # two fields per sample: prefix, payload (payload width 0 when dod==0)
    pre_v = np.zeros(n - 1, dtype=_U64)
    pre_n = np.ones(n - 1, dtype=np.int64)  # the '0' control bit
    pay_v = np.zeros(n - 1, dtype=_U64)
    pay_n = np.zeros(n - 1, dtype=np.int64)
    done = z == 0
    for prefix, pbits, payload in _DOD_BUCKETS:
        fits = ~done & (
            z <= (_ALL1 if payload == 64 else _U64((1 << payload) - 1))
        )
        pre_v[fits] = prefix
        pre_n[fits] = pbits
        pay_v[fits] = z[fits]
        pay_n[fits] = payload
        done |= fits

    vals = np.empty(1 + 2 * (n - 1), dtype=_U64)
    widths = np.empty_like(vals, dtype=np.int64)
    vals[0], widths[0] = head_v[0], 64
    vals[1::2], widths[1::2] = pre_v, pre_n
    vals[2::2], widths[2::2] = pay_v, pay_n
    return _pack_bits(vals, widths)


def dod_decode(buf: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.int64)
    r = _BitReader(buf)
    out = np.empty(n, dtype=np.int64)
    out[0] = np.int64(_U64(r.read(64)))
    delta = 0
    for i in range(1, n):
        if r.read_bit() == 0:
            dod = 0
        elif r.read_bit() == 0:
            dod = _unzigzag_scalar(r.read(7))
        elif r.read_bit() == 0:
            dod = _unzigzag_scalar(r.read(11))
        elif r.read_bit() == 0:
            dod = _unzigzag_scalar(r.read(17))
        else:
            dod = _unzigzag_scalar(r.read(64))
        delta += dod
        out[i] = out[i - 1] + delta
    return out


# ---------------------------------------------------------------------------
# Gorilla XOR floats
# ---------------------------------------------------------------------------


def xor_encode(vals: np.ndarray) -> bytes:
    v = np.ascontiguousarray(vals, dtype=np.float64).view(_U64)
    n = len(v)
    if n == 0:
        return b""
    if n == 1:
        return _pack_bits(v[:1], np.array([64], dtype=np.int64))

    x = v[1:] ^ v[:-1]
    lead = np.minimum(_clz64(x), 31)
    trail = _ctz64(x)
    mean = 64 - lead - trail  # >= 1 when x != 0
    nz = x != 0

    # header field: '1' + 5-bit lead + 6-bit mean%64  (12 bits), or '0'
    hdr_v = np.zeros(n - 1, dtype=_U64)
    hdr_n = np.ones(n - 1, dtype=np.int64)
    hdr_v[nz] = (
        (_U64(1) << _U64(11))
        | (lead[nz].astype(_U64) << _U64(6))
        | (mean[nz] % 64).astype(_U64)
    )
    hdr_n[nz] = 12
    # payload field: the meaningful bits
    pay_v = np.zeros(n - 1, dtype=_U64)
    pay_n = np.zeros(n - 1, dtype=np.int64)
    pay_v[nz] = (x[nz] >> trail[nz].astype(_U64)) & _mask(mean[nz])
    pay_n[nz] = mean[nz]

    out_v = np.empty(1 + 2 * (n - 1), dtype=_U64)
    out_n = np.empty_like(out_v, dtype=np.int64)
    out_v[0], out_n[0] = v[0], 64
    out_v[1::2], out_n[1::2] = hdr_v, hdr_n
    out_v[2::2], out_n[2::2] = pay_v, pay_n
    return _pack_bits(out_v, out_n)


def xor_decode(buf: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.float64)
    r = _BitReader(buf)
    out = np.empty(n, dtype=_U64)
    out[0] = _U64(r.read(64))
    for i in range(1, n):
        if r.read_bit() == 0:
            out[i] = out[i - 1]
            continue
        lead = r.read(5)
        mean = r.read(6) or 64
        payload = r.read(mean)
        trail = 64 - lead - mean
        out[i] = out[i - 1] ^ (_U64(payload) << _U64(trail))
    return out.view(np.float64)


def _mask(nbits: np.ndarray) -> np.ndarray:
    nb = nbits.astype(_U64)
    full = nb >= _U64(64)
    m = (_U64(1) << np.where(full, _U64(0), nb)) - _U64(1)
    return np.where(full, _ALL1, m)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Leading zeros of uint64, vectorized (0 -> 64)."""
    out = np.full(len(x), 64, dtype=np.int64)
    nz = x != 0
    hi = (x[nz] >> _U64(32)).astype(np.uint32)
    lo = (x[nz] & _U64(0xFFFFFFFF)).astype(np.uint32)
    out[nz] = np.where(hi != 0, 32 - _bitlen32(hi), 64 - _bitlen32(lo))
    return out


def _ctz64(x: np.ndarray) -> np.ndarray:
    out = np.full(len(x), 64, dtype=np.int64)
    nz = x != 0
    low = x[nz] & (~x[nz] + _U64(1))  # isolate lowest set bit
    out[nz] = 63 - _clz64(low)
    return out


def _bitlen32(x: np.ndarray) -> np.ndarray:
    """bit_length of uint32 via exact float64 log2 (uint32 fits mantissa)."""
    out = np.zeros(len(x), dtype=np.int64)
    nz = x != 0
    out[nz] = np.floor(np.log2(x[nz].astype(np.float64))).astype(np.int64) + 1
    return out


# ---------------------------------------------------------------------------
# Geode compact ints (reference input-path parity, byte-aligned)
# ---------------------------------------------------------------------------

_TOKEN_BASE = -130  # token for an N-byte payload is _TOKEN_BASE + N, N in 2..8
_MIN_1BYTE = -121
_MAX_1BYTE = 127


def compact_encode(vals: np.ndarray) -> bytes:
    v = np.asarray(vals, dtype=np.int64)
    nbytes = np.full(len(v), 8, dtype=np.int64)
    for w in range(7, 1, -1):
        lo, hi = -(1 << (8 * w - 1)), (1 << (8 * w - 1)) - 1
        nbytes[(v >= lo) & (v <= hi)] = w
    one = (v >= _MIN_1BYTE) & (v <= _MAX_1BYTE)
    out = bytearray()
    for i in range(len(v)):  # parity/test path only; hot path is dod/xor
        if one[i]:
            out.append(int(v[i]) & 0xFF)
        else:
            w = int(nbytes[i])
            out.append((_TOKEN_BASE + w) & 0xFF)
            out += int(v[i]).to_bytes(w, "big", signed=True)
    return bytes(out)


def compact_decode(buf: bytes) -> np.ndarray:
    out = []
    i = 0
    b = np.frombuffer(buf, dtype=np.int8)
    while i < len(b):
        t = int(b[i])
        i += 1
        if t >= _MIN_1BYTE:
            out.append(t)
        else:
            w = t - _TOKEN_BASE
            out.append(int.from_bytes(buf[i : i + w], "big", signed=True))
            i += w
    return np.array(out, dtype=np.int64)
