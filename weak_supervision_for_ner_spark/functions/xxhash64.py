"""Pure-Python mirror of Spark's ``xxhash64`` expression.

The minhash-LSH canonicalization (operators/triples.py) computes its
signatures with ``F.xxhash64(F.lit(i), shingle)`` — JVM-side, zero
UDFs. The single-node oracle (plans/oracle.py) must reproduce those
signatures bit-for-bit to materialize an independent triples fixture,
so this module reimplements the public xxHash64 algorithm exactly as
Spark's ``XXH64.java`` applies it (seed 42, per-child chaining:
``hash = computeHash(child, hash)`` — IntegerType via ``hashInt``,
LongType via ``hashLong``, StringType via ``hashUnsafeBytes`` over the
UTF-8 bytes, little-endian word reads).

Parity is not assumed: tests/test_xxhash64.py fuzzes this mirror
against Spark's own ``F.xxhash64`` over random ints/longs/strings
(including multi-byte UTF-8 and >32-byte strings exercising every
branch of the algorithm).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_int(value: int, seed: int) -> int:
    """XXH64.hashInt — 4-byte input (Spark IntegerType child)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_long(value: int, seed: int) -> int:
    """XXH64.hashLong — 8-byte input (Spark LongType child)."""
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((value & _M) * _P2 & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """XXH64.hashUnsafeBytes — arbitrary byte string (Spark StringType
    child hashes the UTF-8 bytes). Words are read little-endian, as on
    the JVM's x86 Platform.getLong."""
    length = len(data)
    offset = 0
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        limit = length - 32
        while offset <= limit:
            for i, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(data[offset + 8 * i:offset + 8 * i + 8], "little")
                v = (v + k * _P2) & _M
                v = (_rotl(v, 31) * _P1) & _M
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            offset += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            v = (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h ^= v
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + length) & _M
    # full 8-byte words of the tail
    while offset + 8 <= length:
        k = int.from_bytes(data[offset:offset + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        offset += 8
    # one 4-byte word
    if offset + 4 <= length:
        k = int.from_bytes(data[offset:offset + 4], "little")
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        offset += 4
    # trailing bytes
    while offset < length:
        h ^= (data[offset] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        offset += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64(*values, seed: int = DEFAULT_SEED) -> int:
    """``F.xxhash64(*cols)`` for a single row: chain each value through
    the running hash (the expression's per-child seeding). Python ints
    in the 32-bit range map to Spark IntegerType (``F.lit(0)`` is an
    int), ``("long", n)`` forces LongType, ``str``/``bytes`` map to
    StringType/BinaryType. Returns Spark's signed 64-bit result."""
    h = seed & _M
    for v in values:
        if isinstance(v, tuple) and len(v) == 2 and v[0] == "long":
            h = hash_long(int(v[1]), h)
        elif isinstance(v, bool):
            raise TypeError("boolean hashing not mirrored")
        elif isinstance(v, int):
            if -(1 << 31) <= v < (1 << 31):
                h = hash_int(v, h)
            else:
                h = hash_long(v, h)
        elif isinstance(v, str):
            h = hash_bytes(v.encode("utf-8"), h)
        elif isinstance(v, bytes):
            h = hash_bytes(v, h)
        else:
            raise TypeError(f"unsupported type for xxhash64 mirror: {type(v)}")
    return _to_signed(h)
