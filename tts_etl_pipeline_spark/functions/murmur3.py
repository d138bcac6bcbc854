"""Spark-compatible Murmur3 (x86 32-bit, seed 42) in pure Python.

Why this exists: Spark's storage bucketing (``bucketBy``) assigns file
bucket ids with ``pmod(murmur3_hash(key), numBuckets)`` — the exact same
expression the SQL ``hash()`` function evaluates. Reproducing that hash
driver-side is what lets the versioned table format's ``sbucket(N)``
partition transform (sources/versioned.py) be *storage-bucket
compatible*: a file's recorded bucket tuple is byte-identical to the
bucket id Spark's own bucketed scan would assign, so a versioned
snapshot can be exposed to the session catalog as a genuine bucketed
table and joined with ZERO Exchange (storage-partitioned joins,
sources/spj.py) — while equality probes still prune files driver-side
without launching a job.

The algorithm is public (MurmurHash3 x86_32; Spark's variant lives in
``org.apache.spark.unsafe.hash.Murmur3_x86_32`` and
``sql/catalyst``'s ``Murmur3Hash`` expression — reimplemented here from
the published algorithm, not copied):

- int-family values (byte/short/int) hash as one 32-bit block;
- longs hash as two 32-bit blocks, low half first;
- strings hash their UTF-8 bytes: 4-byte little-endian blocks, then each
  TAIL byte mixed as its own *signed* block (Spark's
  ``hashUnsafeBytes`` tail rule — this differs from canonical Murmur3's
  tail accumulation, and matching it exactly is the whole point);
- null never reaches the hash (the bucket transform records no tuple for
  a null key, mirroring how HashPartitioning folds nulls to the seed).

Every function is pinned against ``F.hash`` / a real ``bucketBy`` write
in tests/test_spj.py — if Spark ever changed the hash (it cannot;
bucket layouts on disk depend on it), the parity test fails loudly.
"""

from __future__ import annotations

_MASK32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593
SPARK_SEED = 42  # the fixed seed both hash() and bucketBy use


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _MASK32
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _MASK32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK32
    h1 ^= h1 >> 16
    return h1


def _signed32(x: int) -> int:
    x &= _MASK32
    return x - (1 << 32) if x >= (1 << 31) else x


def hash_int(value: int, seed: int = SPARK_SEED) -> int:
    """Murmur3 of one 32-bit block — Spark's hash for byte/short/int."""
    return _signed32(_fmix(_mix_h1(seed & _MASK32, _mix_k1(value & _MASK32)), 4))


def hash_long(value: int, seed: int = SPARK_SEED) -> int:
    """Murmur3 of a long as two 32-bit blocks, LOW half first."""
    h1 = _mix_h1(seed & _MASK32, _mix_k1(value & _MASK32))
    h1 = _mix_h1(h1, _mix_k1((value >> 32) & _MASK32))
    return _signed32(_fmix(h1, 8))


def hash_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """Murmur3 over raw bytes with Spark's per-byte SIGNED tail rule."""
    n = len(data)
    aligned = n - n % 4
    h1 = seed & _MASK32
    for i in range(0, aligned, 4):
        block = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(block))
    for i in range(aligned, n):
        b = data[i]
        if b >= 128:  # Java bytes are signed; the tail mixes them as ints
            b -= 256
        h1 = _mix_h1(h1, _mix_k1(b & _MASK32))
    return _signed32(_fmix(h1, n))


def hash_string(value: str, seed: int = SPARK_SEED) -> int:
    return hash_bytes(value.encode("utf-8"), seed)


def spark_hash(value, type_name: str, seed: int = SPARK_SEED) -> int:
    """``F.hash(col)`` for one scalar of the named Spark type. Only the
    types the sbucket transform admits (int-family and string) — wider
    coverage would need the full HashExpression type matrix for no
    caller."""
    if type_name in ("byte", "short", "integer"):
        return hash_int(int(value), seed)
    if type_name == "long":
        return hash_long(int(value), seed)
    if type_name in ("string", "varchar", "char"):
        return hash_string(str(value), seed)
    raise ValueError(f"spark_hash: unsupported type {type_name!r}")


def bucket_id(value, type_name: str, n_buckets: int) -> int:
    """``pmod(hash(value), n)`` — the bucket id Spark's bucketed writer
    and the sbucket partition transform both assign this value."""
    return spark_hash(value, type_name) % n_buckets
