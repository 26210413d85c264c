"""Pure-Python XXH64 twin of Spark's `xxhash64` expression.

Implements the public xxHash64 algorithm (Yann Collet's spec, BSD-licensed;
the same algorithm Spark's `org.apache.spark.sql.catalyst.expressions.XxHash64`
uses) with Spark's column-chaining convention:

- a STRING column contributes ``xxh64(utf8_bytes, seed)``;
- a LONG column contributes ``xxh64_long(value, seed)`` (the single 8-byte
  block fast path);
- multiple columns chain: each column's hash becomes the next column's seed;
  the initial seed is 42 (Spark's default).

This gives the engine an independent (non-Spark, non-JVM) implementation of
the xxhash64-based fast paths (MinHash `flavor='xx'`, SimHash64), used by
the DuckDB golden oracles and pytest equality checks. Equality with Spark is
asserted in tests/test_kernel.py over strings of every length class
(0, <8, <32, >=32 bytes) and signed longs.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _round(acc: int, k: int) -> int:
    acc = (acc + k * _P2) & _MASK
    acc = _rotl(acc, 31)
    return (acc * _P1) & _MASK


def xxh64_long(value: int, seed: int = 42) -> int:
    """Spark XXH64.hashLong: one 8-byte block + finalization (unsigned out)."""
    value &= _MASK  # two's-complement view of the signed long
    h = (seed + _P5 + 8) & _MASK
    k = (value * _P2) & _MASK
    k = _rotl(k, 31)
    k = (k * _P1) & _MASK
    h ^= k
    h = (_rotl(h, 27) * _P1 + _P4) & _MASK
    return _fmix(h)


def xxh64_int(value: int, seed: int = 42) -> int:
    """Spark XXH64.hashInt: one 4-byte block + finalization (unsigned out).
    Spark hashes IntegerType columns (e.g. a plain `F.lit(j)`) through this
    path, NOT hashLong — the two produce different values."""
    value &= 0xFFFFFFFF
    h = (seed + _P5 + 4) & _MASK
    h ^= (value * _P1) & _MASK
    h = (_rotl(h, 23) * _P2 + _P3) & _MASK
    return _fmix(h)


def xxh64_bytes(data: bytes, seed: int = 42) -> int:
    """xxHash64 over a byte buffer (little-endian word reads), unsigned out."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h ^= _round(0, v)
            h = (h * _P1 + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        k = (k * _P2) & _MASK
        k = _rotl(k, 31)
        k = (k * _P1) & _MASK
        h ^= k
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i:i + 4], "little")
        h ^= (k * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    return _fmix(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


class i32(int):
    """Marker: hash this value through the IntegerType (4-byte) path."""


def spark_xxhash64(*cols, seed: int = 42) -> int:
    """Twin of ``F.xxhash64(*cols)``: chain column hashes, signed-long out.

    Accepted column values: str (hashed as UTF-8 bytes), bytes, int (hashed
    as an 8-byte LongType block), i32 (IntegerType 4-byte path — what a bare
    Python-int `F.lit(j)` literal becomes). None columns are skipped
    (Spark's null rule)."""
    h = seed
    for c in cols:
        if c is None:
            continue
        if isinstance(c, str):
            h = xxh64_bytes(c.encode("utf-8"), h)
        elif isinstance(c, (bytes, bytearray)):
            h = xxh64_bytes(bytes(c), h)
        elif isinstance(c, i32):
            h = xxh64_int(c, h)
        elif isinstance(c, int):
            h = xxh64_long(c, h)
        else:
            raise TypeError(f"unsupported column type {type(c)!r}")
    return _signed(h)
