#!/usr/bin/env python
"""End-to-end sf1 measurement of the r11 write paths (r11 verdict task 7):
a ~6 M-row VERSIONED orders table (sf0.1 orders replicated 40x with key
offsets, the make_scaled_sf.py recipe) driven through the real maintenance
sequence — clustered SCD2 fold, localized fold batch, merge-on-read DV
UPDATE, targeted purge — recording WALL and FILES TOUCHED per step, so the
component-isolated numbers in scripts/manifest_scale.py get one measured
end-to-end row in BASELINE.md next to the r6 sf1 curve.

"Files touched" per step = data files the commit added or rewrote
(manifest diff) — the O(matched) claim is that this tracks the BATCH, not
the 6 M-row table.

Usage: python scripts/sf1_write_paths.py [SRC_SF_DIR] [FACTOR]
       (defaults: /root/testdata/sf0.1, 40 -> ~6.0 M orders rows)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tts_etl_pipeline_spark.session import get_spark
from tts_etl_pipeline_spark.sources.scd import scd2_apply
from tts_etl_pipeline_spark.sources.versioned import (
    current_version,
    manifest,
    purge_dvs,
    read_version,
    update_where_dv,
)


def files_of(path: str, v: int) -> set:
    return set(manifest(path, v)["files"])


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    spark = get_spark("sf1_write_paths", cpus=32)
    base = tempfile.mkdtemp(prefix="sf1wp_")
    dim = os.path.join(base, "orders_dim")
    try:
        orders = spark.read.parquet(os.path.join(src, "orders.parquet"))
        span = orders.agg(
            F.min("o_orderkey").alias("mn"), F.max("o_orderkey").alias("mx")
        ).collect()[0]
        stride = int(span["mx"]) - int(span["mn"]) + 1
        copies = spark.range(factor).select(F.col("id").alias("__copy"))
        big = (
            orders.crossJoin(copies)
            .select(
                (F.col("o_orderkey") + F.col("__copy") * stride).alias("k"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").cast("double").alias("price"),
                F.lit(1_000_000).alias("eff"),
            )
        )
        n = big.count()
        kmx = int(span["mx"]) + (factor - 1) * stride
        print(f"rows: {n:,}  key span: {span['mn']}..{kmx}")

        # 1) clustered SCD2 seed fold: the whole 6 M-row table, 64 key-range
        #    current files with manifest key stats
        t0 = time.time()
        v1 = scd2_apply(
            spark, dim, big, "k", ["status", "price"], "eff",
            cluster_files=64,
        )
        t1 = time.time()
        f1 = files_of(dim, v1)
        print(f"seed fold (6M rows, cluster_files=64): {t1-t0:.2f}s  "
              f"files written: {len(f1)}")

        # 2) localized fold batch: 2,000 contiguous keys — O(touched files
        #    + batch), the clustered-fold contract
        lo = int(span["mn"]) + 10 * stride
        batch = (
            spark.range(lo, lo + 2000)
            .select(
                F.col("id").alias("k"),
                F.lit("X").alias("status"),
                F.lit(1.0).alias("price"),
                F.lit(2_000_000).alias("eff"),
            )
        )
        t0 = time.time()
        v2 = scd2_apply(spark, dim, batch, "k", ["status", "price"], "eff")
        t1 = time.time()
        f2 = files_of(dim, v2)
        touched2 = len(f2 - f1)
        reused2 = len(f1 & f2)
        print(f"localized fold (2k keys): {t1-t0:.2f}s  files added: "
              f"{touched2}  reused by reference: {reused2}")

        # 3) merge-on-read DV UPDATE on a 1,000-key range: data files
        #    byte-untouched, updated copies appended
        t0 = time.time()
        v3 = update_where_dv(
            spark, dim, "k", lo + 100_000, lo + 101_000,
            {"price": "price * 2"},
        )
        t1 = time.time()
        f3 = files_of(dim, v3)
        appended3 = len(f3 - f2)
        rewritten3 = len(f2 - f3)
        ndv = len(manifest(dim, v3).get("dvs") or {})
        print(f"DV update (1k-key range): {t1-t0:.2f}s  files appended: "
              f"{appended3}  rewritten: {rewritten3}  files with DVs: {ndv}")

        # 4) targeted purge: rewrites ONLY the vectored files
        t0 = time.time()
        v4 = purge_dvs(spark, dim)
        t1 = time.time()
        f4 = files_of(dim, v4)
        print(f"purge_dvs: {t1-t0:.2f}s  files rewritten: {len(f4 - f3)}  "
              f"(= vectored {ndv})  carried: {len(f3 & f4)}")
        print(f"final rows: {read_version(spark, dim).count():,}  "
              f"versions: {current_version(dim)}")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
