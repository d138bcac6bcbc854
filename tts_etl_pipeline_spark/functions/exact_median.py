"""Exact distributed quantiles WITHOUT sorting: binary search on the value
domain (the classic selection-by-counting algorithm, Blum et al. lineage —
each probe is one parallel COUNT, so an exact median at 100 TB costs
O(log(domain)) cheap scan-side aggregations instead of a full sort or a
memory-bound per-group percentile buffer).

Works on integer-valued columns (cents, ids, counts — the exact-money
domain this repo already standardizes on via functions/exact.py): binary
search maintains [lo, hi] with count(x <= mid) guiding the step, and
terminates at the smallest value v such that count(x <= v) >= k. For an
even row count the lower-median convention is used (deterministic, no
interpolation — callers wanting the interpolated midpoint run it twice
with k and k+1).

Each probe is a jobs-not-shuffles pattern: a single scan + scalar agg
(whole-stage codegen, no Exchange beyond the final partial/final fold),
and the probe count is bounded by log2(domain) ≈ 40 for int64 — a
control-plane loop, the t12/d10 discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_kth_by_counting(df: DataFrame, col: str | Column, k: int) -> int:
    """Smallest value v with count(col <= v) >= k (1-indexed k-th order
    statistic) over an integer column, via domain binary search."""
    c = F.col(col) if isinstance(col, str) else col
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    bounds = df.agg(
        F.min(c).alias("lo"), F.max(c).alias("hi"), F.count(c).alias("n")
    ).collect()[0]
    if bounds["n"] is None or bounds["n"] < k:
        raise ValueError(f"k={k} exceeds non-null count {bounds['n']}")
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    while lo < hi:
        mid = (lo + hi) // 2
        n_le = df.agg(F.sum((c <= mid).cast("long")).alias("n")).collect()[0]["n"]
        if n_le >= k:
            hi = mid
        else:
            lo = mid + 1
    return lo


def exact_median_by_counting(df: DataFrame, col: str | Column) -> int:
    """Lower median of an integer column, sort-free."""
    n = df.agg(F.count(F.col(col) if isinstance(col, str) else col)).collect()[0][0]
    if not n:
        raise ValueError("median of an empty relation")
    return exact_kth_by_counting(df, col, (n + 1) // 2)
