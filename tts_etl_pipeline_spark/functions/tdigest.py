"""Dependency-free merging t-digest (Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests", arXiv:1902.04023) — the mergeable
quantile sketch that replaces exact percentile sorts at 100 TB.

The digest is a sorted list of (mean, weight) centroids whose sizes are
bounded by the k1 scale function: centroids near the tails (q→0, q→1) stay
tiny, so tail quantiles are near-exact, while the middle compresses
aggressively. Two properties make it the scale path:

- FIXED SIZE: ≤ ~2·compression centroids regardless of input count, so a
  partial digest per partition ships kilobytes to the merge level.
- MERGEABLE: merge = concatenate centroid lists + one compress pass;
  associative and order-insensitive up to the documented accuracy bound
  (the estimator, like HLL/CMS, is not bit-deterministic under re-ordering
  — which is why x4 is a rows-only query with an error-bound test, not an
  oracle hash match).

Pure numpy, no external sketch library. Used by
operators/sketches.py::x4_tdigest_quantiles via the two-level
partial-per-partition → merge-per-group pattern.
"""

from __future__ import annotations

import math
import struct

import numpy as np


class TDigest:
    """Merging t-digest with the k1 (arcsine) scale function."""

    def __init__(self, compression: float = 100.0):
        self.compression = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        # unmerged buffer — batched inserts amortize the compress pass
        self._buf_means: list[np.ndarray] = []
        self._buf_weights: list[np.ndarray] = []

    # -- scale function ----------------------------------------------------
    def _k(self, q: float) -> float:
        # k1(q) = (δ / 2π) · asin(2q − 1)
        return self.compression / (2.0 * math.pi) * math.asin(2.0 * q - 1.0)

    def _k_inv(self, k: float) -> float:
        return (math.sin(k * 2.0 * math.pi / self.compression) + 1.0) / 2.0

    # -- building ----------------------------------------------------------
    def add_batch(self, values: np.ndarray, weights: np.ndarray | None = None):
        values = np.asarray(values, dtype=np.float64)
        mask = ~np.isnan(values)
        if weights is not None:
            # drop the SAME positions from weights, or the buffers misalign
            weights = np.asarray(weights, dtype=np.float64)[mask]
        values = values[mask]
        if values.size == 0:
            return
        if weights is None:
            weights = np.ones_like(values)
        self._buf_means.append(values)
        self._buf_weights.append(weights)
        # keep the buffer bounded so memory stays O(compression)
        if sum(a.size for a in self._buf_means) > 32 * int(self.compression):
            self.compress()

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.compression)
        out._buf_means = [self.means, other.means, *self._buf_means, *other._buf_means]
        out._buf_weights = [
            self.weights,
            other.weights,
            *self._buf_weights,
            *other._buf_weights,
        ]
        out.compress()
        return out

    def compress(self):
        if self._buf_means:
            means = np.concatenate([self.means, *self._buf_means])
            weights = np.concatenate([self.weights, *self._buf_weights])
            self._buf_means, self._buf_weights = [], []
        else:
            means, weights = self.means, self.weights
        if means.size == 0:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = float(weights.sum())

        out_means: list[float] = []
        out_weights: list[float] = []
        # merge pass: grow the active centroid while its q-span stays inside
        # one unit of the scale function
        acc_m, acc_w = means[0], weights[0]
        w_before = 0.0  # total weight strictly before the active centroid
        k_lo = self._k(0.0)
        for m, w in zip(means[1:], weights[1:]):
            q_hi = (w_before + acc_w + w) / total
            if self._k(min(q_hi, 1.0)) - k_lo <= 1.0:
                acc_m += (m - acc_m) * (w / (acc_w + w))
                acc_w += w
            else:
                out_means.append(acc_m)
                out_weights.append(acc_w)
                w_before += acc_w
                k_lo = self._k(w_before / total)
                acc_m, acc_w = m, w
        out_means.append(acc_m)
        out_weights.append(acc_w)
        self.means = np.asarray(out_means)
        self.weights = np.asarray(out_weights)

    # -- querying ----------------------------------------------------------
    @property
    def n(self) -> float:
        self.compress()
        return float(self.weights.sum())

    def quantile(self, q: float) -> float:
        """Interpolated quantile estimate (midpoint rule between centroids)."""
        self.compress()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        # cumulative weight at each centroid's MIDPOINT
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = int(np.searchsorted(cum, target) - 1)
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + frac * (self.means[i + 1] - self.means[i]))

    # -- serialization (partial-sketch shuffle payload) --------------------
    def to_bytes(self) -> bytes:
        self.compress()
        header = struct.pack("<dI", self.compression, self.means.size)
        return header + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        compression, size = struct.unpack_from("<dI", blob, 0)
        off = struct.calcsize("<dI")
        out = cls(compression)
        out.means = np.frombuffer(blob, dtype=np.float64, count=size, offset=off).copy()
        out.weights = np.frombuffer(
            blob, dtype=np.float64, count=size, offset=off + 8 * size
        ).copy()
        return out
