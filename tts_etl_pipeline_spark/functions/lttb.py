"""Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013,
"Downsampling Time Series for Visual Representation", U. Iceland MSc) —
the standard shape-preserving decimation for time-series dashboards:
reduce each series to N points while keeping peaks/valleys that a naive
every-k-th sample would erase.

Kernel is pure numpy (one series in memory at a time); the Spark surface
runs it per-series via applyInPandas (operators/events.py::h4) — one
shuffle on the series key, each series decimated executor-side. A single
series is assumed to fit one task (the same contract every per-key
window sort already makes); series count scales out, length is bounded
by retention.
"""

from __future__ import annotations

import numpy as np


def lttb(x: np.ndarray, y: np.ndarray, n_out: int) -> np.ndarray:
    """Return the INDICES of the selected points (sorted ascending).

    First and last points are always kept; interior points fall into
    n_out - 2 equal buckets; each bucket keeps the point forming the
    largest triangle with the previously selected point and the NEXT
    bucket's average — the paper's exact formulation.
    """
    n = len(x)
    if n_out >= n:
        return np.arange(n)
    if n_out < 3:
        raise ValueError("LTTB needs n_out >= 3")
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)

    # bucket boundaries over the interior points (paper: equal splits)
    edges = (
        np.round(np.linspace(1, n - 1, n_out - 1)).astype(np.int64)
    )  # n_out-2 interior buckets: [edges[i], edges[i+1])
    selected = [0]
    a = 0  # index of the previously selected point
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        # average of the NEXT bucket (or the last point for the final one)
        nlo, nhi = edges[i + 1], edges[i + 2] if i + 2 < len(edges) else n
        avg_x = float(np.mean(x[nlo:nhi])) if nhi > nlo else float(x[-1])
        avg_y = float(np.mean(y[nlo:nhi])) if nhi > nlo else float(y[-1])
        # triangle area vs point a and the next-bucket average
        ax, ay = x[a], y[a]
        areas = np.abs(
            (ax - avg_x) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (avg_y - ay)
        )
        a = lo + int(np.argmax(areas))
        selected.append(a)
    selected.append(n - 1)
    return np.asarray(selected, dtype=np.int64)


def lttb_reference(x, y, n_out):
    """Deliberately different implementation for tests: per-point loops,
    shoelace triangle area, no vectorization."""
    n = len(x)
    if n_out >= n:
        return list(range(n))
    edges = [int(round(v)) for v in np.linspace(1, n - 1, n_out - 1)]
    sel = [0]
    a = 0
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo = edges[i + 1]
        nhi = edges[i + 2] if i + 2 < len(edges) else n
        pts = list(range(nlo, nhi))
        avg_x = sum(x[j] for j in pts) / len(pts) if pts else x[-1]
        avg_y = sum(y[j] for j in pts) / len(pts) if pts else y[-1]
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs(
                x[a] * (y[j] - avg_y) + x[j] * (avg_y - y[a]) + avg_x * (y[a] - y[j])
            ) / 2.0
            if area > best_area:
                best, best_area = j, area
        sel.append(best)
        a = best
    sel.append(n - 1)
    return sel
