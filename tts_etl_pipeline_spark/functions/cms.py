"""Mergeable count-min sketch — numpy-backed, deterministic md5-derived hash
rows, built per-partition and merged by element-wise sum (the associative
merge is what makes it a fixed-memory distributed frequency estimator).

Guarantee: estimate(x) >= true_count(x), and
estimate(x) <= true_count(x) + eps * N with probability 1 - delta, for
width = ceil(e / eps), depth = ceil(ln(1 / delta)).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


class CountMinSketch:
    def __init__(self, eps: float = 0.001, delta: float = 0.01, seed: int = 42):
        self.width = int(math.ceil(math.e / eps))
        self.depth = int(math.ceil(math.log(1.0 / delta)))
        self.seed = seed
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)

    def _indices(self, item: str) -> np.ndarray:
        h = hashlib.md5(f"{self.seed}:{item}".encode()).digest()
        # carve the 128-bit digest into depth independent row indices
        out = np.empty(self.depth, dtype=np.int64)
        for d in range(self.depth):
            chunk = hashlib.md5(h + bytes([d])).digest()[:8]
            out[d] = int.from_bytes(chunk, "big") % self.width
        return out

    def add(self, item: str, count: int = 1) -> None:
        idx = self._indices(item)
        self.table[np.arange(self.depth), idx] += count

    def estimate(self, item: str) -> int:
        idx = self._indices(item)
        return int(self.table[np.arange(self.depth), idx].min())

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        """Return a NEW sketch with summed counters; neither input mutates
        (callers may keep probing per-partition sketches after merging)."""
        assert (self.width, self.depth, self.seed) == (
            other.width,
            other.depth,
            other.seed,
        ), "sketches must share shape and seed to merge"
        out = CountMinSketch.__new__(CountMinSketch)
        out.width, out.depth, out.seed = self.width, self.depth, self.seed
        out.table = self.table + other.table
        return out

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(
        cls, data: bytes, eps: float = 0.001, delta: float = 0.01, seed: int = 42
    ) -> "CountMinSketch":
        sk = cls(eps, delta, seed)
        sk.table = np.frombuffer(data, dtype=np.int64).reshape(sk.depth, sk.width).copy()
        return sk
