#!/usr/bin/env python
"""Measure the SCD2 fold's per-batch cost vs current-slice size, plain vs
key-clustered (the round-10 'next rung' experiment behind BASELINE.md's
clustered-fold row).

The round-10 wave-1 rework made the fold's WRITE O(current + batch); the
deliberately-kept residual was the O(current) read+rewrite of the current
slice itself. cluster_files=N removes that for key-LOCALIZED batches: the
current slice lives in N key-range files with manifest key stats, and a
fold reads/rewrites only the files its batch keys touch.

Usage: python scripts/scd2_cluster_residual.py [N_FOLDS]
Protocol per (n_current, mode): seed n_current keys in one fold (clustered
modes use cluster_files=32 for the seed — ~6k keys/file at 200k), then
N_FOLDS (default 6) localized 2,000-key contiguous batches; report the
steady-state mean of the last N_FOLDS-2 folds (first folds amortize JVM
warmup). The clustered row should stay FLAT as n_current grows 10x; the
plain row tracks it (the recorded +21%/10x envelope).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from tts_etl_pipeline_spark.session import get_spark
from tts_etl_pipeline_spark.sources.scd import scd2_apply


def run(spark, n_current: int, cluster: int | None, n_folds: int) -> float:
    base = tempfile.mkdtemp(prefix="scdres_")
    path = f"{base}/dim"
    try:
        seed = spark.range(n_current).selectExpr(
            "CAST(id AS INT) AS k", "'s0' AS state", "CAST(10 AS LONG) AS eff"
        )
        scd2_apply(spark, path, seed, "k", ["state"], "eff",
                   cluster_files=32 if cluster else None)
        walls = []
        for i in range(1, n_folds + 1):
            lo = (i * 2000) % max(1, n_current - 2000)
            batch = spark.range(lo, lo + 2000).selectExpr(
                "CAST(id AS INT) AS k",
                f"'s{i}' AS state",
                f"CAST({(i + 1) * 10} AS LONG) AS eff",
            )
            t0 = time.time()
            scd2_apply(spark, path, batch, "k", ["state"], "eff",
                       cluster_files=cluster)
            walls.append(time.time() - t0)
        tail = walls[2:] or walls
        return sum(tail) / len(tail)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    n_folds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("scd2_cluster_residual", cpus=32)
    print(f"{'n_current':>10} {'plain s/fold':>14} {'clustered s/fold':>18}")
    for n_current in (20_000, 200_000):
        plain = run(spark, n_current, None, n_folds)
        clustered = run(spark, n_current, 8, n_folds)
        print(f"{n_current:>10} {plain:>14.2f} {clustered:>18.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
