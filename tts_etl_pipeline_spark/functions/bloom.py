"""Mergeable Bloom filter — the membership twin of functions/cms.py.

Used by the incremental-dedup operator (operators/dedup.py d10): the
existing corpus's fingerprint set is summarized into a bit array sized from
a corpus count() — a fixed m would saturate at scale, FPR -> 1, silently
routing every row to the exact join — (built distributed: one partial
filter per partition via mapInPandas, tree-merged through an executor
reduce level before one small driver collect), broadcast,
and probed to split an incoming batch into definitely-new rows (bloom says
absent — NO false negatives, so they skip the expensive anti-join entirely)
and maybe-duplicate rows (bloom says present — verified by an exact
anti-join, which removes the false positives). Results are therefore
bit-identical to a plain anti-join; the bloom only routes work.

Spark ships `bloom_filter_agg`/`might_contain` as internal expressions for
join runtime filters, but they are not registered SQL functions in this
build — and a first-class, testable implementation is needed anyway for
merge/serialize semantics (same rationale as CountMinSketch).

Standard double hashing (Kirsch-Mitzenmacher): k probe positions derived as
h1 + i*h2 mod m from one 128-bit blake2b digest — index-independent hash
quality without k full hash computations.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


class BloomFilter:
    """Fixed-size Bloom filter sized for `n_items` at false-positive rate
    `fpp`. add/might_contain/merge/to_bytes/from_bytes; merge requires
    identical sizing (same m, k)."""

    def __init__(self, n_items: int = 100_000, fpp: float = 0.01):
        if not (0.0 < fpp < 1.0) or n_items <= 0:
            raise ValueError("need n_items > 0 and 0 < fpp < 1")
        self.n_items = n_items
        self.fpp = fpp
        self.m = max(64, int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))))
        self.k = max(1, round(self.m / n_items * math.log(2)))
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _h12(self, item: str) -> tuple[int, int]:
        d = hashlib.blake2b(item.encode("utf-8"), digest_size=16).digest()
        h1 = int.from_bytes(d[:8], "little")
        h2 = int.from_bytes(d[8:], "little") | 1  # odd => full-period stride
        return h1, h2

    def add(self, item: str) -> None:
        h1, h2 = self._h12(item)
        for i in range(self.k):
            pos = (h1 + i * h2) % self.m
            self.bits[pos >> 6] |= np.uint64(1 << (pos & 63))

    def might_contain(self, item: str) -> bool:
        h1, h2 = self._h12(item)
        for i in range(self.k):
            pos = (h1 + i * h2) % self.m
            if not (int(self.bits[pos >> 6]) >> (pos & 63)) & 1:
                return False
        return True

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError("cannot merge Bloom filters with different sizing")
        out = BloomFilter(self.n_items, self.fpp)
        out.bits = self.bits | other.bits
        return out

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(
        cls, raw: bytes, n_items: int = 100_000, fpp: float = 0.01
    ) -> "BloomFilter":
        bf = cls(n_items, fpp)
        arr = np.frombuffer(raw, dtype=np.uint64)
        if arr.shape != bf.bits.shape:
            raise ValueError("serialized filter does not match sizing params")
        bf.bits = arr.copy()
        return bf
