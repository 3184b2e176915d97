"""Driver-side reimplementation of Spark's ``xxhash64`` expression.

Spark's bucket routing hashes the record key with xxHash64 (seed 42,
per-column seed chaining). Recomputing that hash in Python lets a point
lookup resolve its ``__bucket`` directory with ZERO Spark jobs — pure driver
arithmetic — instead of running a one-row job just to evaluate the hash
(a ~100 ms round-trip per lookup).

The algorithm is the public xxHash64 specification (Cyan4973/xxHash), which
is also what Spark's ``XXH64`` implements; the per-type serialization below
mirrors ``XxHash64Function.hash``: integral types hash their value as one
little-endian 64-bit word, strings hash their UTF-8 bytes, floating point
hashes the IEEE-754 bit pattern (with -0.0 normalized to 0.0). Equality with
the JVM implementation is pinned by tests/test_hashing.py across types,
lengths, and seed chaining.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, acc: int) -> int:
    h ^= _round(0, acc)
    return (h * _P1 + _P4) & _M


def _avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """Reference xxHash64 over a byte buffer (unsigned 64-bit result)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, struct.unpack_from("<Q", data, i)[0])
            v2 = _round(v2, struct.unpack_from("<Q", data, i + 8)[0])
            v3 = _round(v3, struct.unpack_from("<Q", data, i + 16)[0])
            v4 = _round(v4, struct.unpack_from("<Q", data, i + 24)[0])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, struct.unpack_from("<Q", data, i)[0])
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (struct.unpack_from("<I", data, i)[0] * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _avalanche(h)


def _hash_long(value: int, seed: int) -> int:
    """``XXH64.hashLong``: one 8-byte little-endian word (two's complement)."""
    return xxh64(struct.pack("<q", value), seed)


def _hash_int(value: int, seed: int) -> int:
    """``XXH64.hashInt``: 32-bit types hash as one 4-byte word, not 8."""
    return xxh64(struct.pack("<i", value), seed)


def spark_xxhash64(values: list[tuple[object, str]], seed: int = SPARK_SEED) -> int:
    """Replicates ``F.xxhash64(c1, c2, ...)`` for Python values.

    ``values`` is ``[(value, spark_simple_type), ...]`` in column order;
    column i's hash seeds column i+1 (Spark's chaining). Returns the SIGNED
    64-bit result, matching the LongType output of the SQL expression.
    Nulls skip their column (Spark leaves the seed unchanged)."""
    h = seed
    for value, dtype in values:
        if value is None:
            continue
        t = dtype.lower()
        if t in ("bigint", "long"):
            h = _hash_long(int(value), h)
        elif t in ("int", "integer", "smallint", "short", "tinyint", "byte"):
            h = _hash_int(int(value), h)
        elif t == "boolean":
            h = _hash_int(1 if value else 0, h)
        elif t == "string":
            h = xxh64(str(value).encode("utf-8"), h)
        elif t == "binary":
            h = xxh64(bytes(value), h)
        elif t in ("double", "float"):
            v = float(value)
            if v == 0.0:
                v = 0.0  # normalize -0.0, like Spark
            if t == "float":
                bits = struct.unpack("<i", struct.pack("<f", v))[0]
                h = _hash_int(bits, h)
            else:
                bits = struct.unpack("<q", struct.pack("<d", v))[0]
                h = _hash_long(bits, h)
        elif t == "date":
            import datetime

            epoch = datetime.date(1970, 1, 1)
            h = _hash_int((value - epoch).days, h)
        elif t == "timestamp":
            import calendar

            micros = calendar.timegm(value.timetuple()) * 1_000_000 + value.microsecond
            h = _hash_long(micros, h)
        else:
            raise TypeError(f"spark_xxhash64: unsupported key type {dtype!r}")
    # to signed 64-bit
    return h - (1 << 64) if h >= (1 << 63) else h
