#!/usr/bin/env python
"""Scale rows for the r13 continuation features (BASELINE.md evidence):

1. merge — full-clause-matrix MERGE against a ~6 M-row key-clustered
   versioned table: a 2000-key confined CDC batch must rewrite
   O(overlapping files), not the table (mtime-checked), and the commit
   wall must track the batch.
2. textindex — inverted-token-index build over the sf0.1 documents
   corpus, then probe cost (one shard load + pruned read) vs the full
   token scan.
3. ivm — one confined-delta join-view maintenance step vs the batch
   recompute of the same view at the same scale.

Usage: python scripts/feature_scale_r13.py [SRC_SF_DIR] [FACTOR]
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
from tts_etl_pipeline_spark.sources.ivm import (
    maintain_join_agg_from_cdf,
    read_maintained_join_agg,
)
from tts_etl_pipeline_spark.sources.textindex import (
    build_text_index,
    read_version_token_pruned,
    token_filter_expr,
)
from tts_etl_pipeline_spark.sources.versioned import (
    manifest,
    merge,
    read_version,
    write_version,
)


def scaled_orders(spark, src: str, factor: int):
    o = spark.read.parquet(os.path.join(src, "orders.parquet")).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    span = o.agg(F.max("o_orderkey")).first()[0] + 1
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return (
        o.crossJoin(reps)
        .select(
            (F.col("o_orderkey") + F.col("rep") * span).alias("o_orderkey"),
            "o_orderstatus",
            "o_totalprice",
        )
    )


def bench_merge(spark, src: str, factor: int) -> None:
    base = tempfile.mkdtemp(prefix="fsr13_merge_")
    path = os.path.join(base, "orders_v")
    try:
        big = scaled_orders(spark, src, factor)
        write_version(
            big.repartitionByRange(64, "o_orderkey"), path,
            collect_stats=("o_orderkey",),
        )
        n = read_version(spark, path).count()
        m1 = manifest(path, 1)
        sig = {
            f: os.stat(os.path.join(path, f)).st_mtime_ns for f in m1["files"]
        }
        lo, hi = 1, 2000
        batch = (
            read_version(spark, path)
            .filter(F.col("o_orderkey").between(lo, hi))
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        )
        nb = batch.count()
        t0 = time.time()
        v = merge(
            spark, path, batch, "o_orderkey",
            matched=(("update", None),),
            not_matched=(("insert", None),),
        )
        wall = time.time() - t0
        m2 = manifest(path, v)
        carried = sum(
            1
            for f in m1["files"]
            if f in set(m2["files"])
            and os.stat(os.path.join(path, f)).st_mtime_ns == sig[f]
        )
        rewritten = len(m1["files"]) - carried
        added = len([f for f in m2["files"] if f not in set(m1["files"])])
        print(
            f"MERGE rows={n} files={len(m1['files'])} batch={nb} "
            f"wall={wall:.2f}s carried_by_ref={carried} "
            f"rewritten={rewritten} added={added}"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def bench_textindex(spark, src: str) -> None:
    """Two corpora: the sf0.1 documents table (tiny synthetic vocabulary —
    every token lands in every file, the worst case for pruning), and a
    200k-doc clustered corpus where the probe token is RARE (lives in one
    file) — the case the index exists for."""
    base = tempfile.mkdtemp(prefix="fsr13_tix_")
    try:
        docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
        n = docs.count()
        p1 = os.path.join(base, "docs_v")
        write_version(
            docs.repartitionByRange(16, "doc_id"), p1,
            collect_stats=("doc_id",),
        )
        t0 = time.time()
        idx = build_text_index(spark, p1, "text")
        t_build = time.time() - t0
        idx_bytes = sum(
            os.path.getsize(os.path.join(idx, f)) for f in os.listdir(idx)
        )
        probe = "customer"
        t0 = time.time()
        pruned, nread, ntot = read_version_token_pruned(spark, p1, probe)
        n_hit = pruned.count()
        t_probe = time.time() - t0
        t0 = time.time()
        n_full = (
            read_version(spark, p1)
            .filter(token_filter_expr("text", probe))
            .count()
        )
        t_full = time.time() - t0
        assert n_hit == n_full
        print(
            f"TEXTINDEX[sf0.1 docs] docs={n} build={t_build:.2f}s "
            f"index_kb={idx_bytes / 1024:.0f} probe='{probe}' "
            f"files={nread}/{ntot} rows={n_hit} "
            f"probe_wall={t_probe:.2f}s fullscan_wall={t_full:.2f}s"
        )
        # clustered corpus, rare token: 200k docs / 64 files, the probe
        # token only in docs 0..99 (one range file)
        p2 = os.path.join(base, "big_v")
        big = spark.range(0, 200_000).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("alpha beta gamma delta epsilon zeta eta theta doc "),
                F.col("id").cast("string"),
                F.when(F.col("id") < 100, F.lit(" needleword")).otherwise(
                    F.lit("")
                ),
            ).alias("text"),
        )
        write_version(
            big.repartitionByRange(64, "doc_id"), p2,
            collect_stats=("doc_id",),
        )
        t0 = time.time()
        build_text_index(spark, p2, "text")
        t_build2 = time.time() - t0
        t0 = time.time()
        pruned, nread, ntot = read_version_token_pruned(spark, p2, "needleword")
        n_hit = pruned.count()
        t_probe2 = time.time() - t0
        t0 = time.time()
        n_full = (
            read_version(spark, p2)
            .filter(token_filter_expr("text", "needleword"))
            .count()
        )
        t_full2 = time.time() - t0
        assert n_hit == n_full == 100
        print(
            f"TEXTINDEX[200k clustered] build={t_build2:.2f}s "
            f"probe='needleword' files={nread}/{ntot} rows={n_hit} "
            f"probe_wall={t_probe2:.2f}s fullscan_wall={t_full2:.2f}s"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def bench_ivm(spark, src: str, factor: int) -> None:
    base = tempfile.mkdtemp(prefix="fsr13_ivm_")
    pa = os.path.join(base, "a")
    pb = os.path.join(base, "b")
    st = os.path.join(base, "st")
    try:
        big = scaled_orders(spark, src, factor)
        lines = spark.read.parquet(os.path.join(src, "lineitem.parquet")).select(
            "l_orderkey",
            (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        write_version(
            big.repartitionByRange(64, "o_orderkey"), pa,
            collect_stats=("o_orderkey",),
        )
        write_version(
            lines.repartitionByRange(32, "l_orderkey"), pb,
            collect_stats=("l_orderkey",),
        )
        t0 = time.time()
        maintain_join_agg_from_cdf(
            spark, pa, pb, st, "o_orderkey", "l_orderkey",
            "o_orderstatus", "cents",
        )
        t_init = time.time() - t0
        # the incremental step: one confined 2000-key append on A whose
        # span OVERLAPS B (keys 1..2000), so the counterpart read does
        # real pruned work, not a trivial all-skip
        batch = read_version(spark, pa).filter(
            F.col("o_orderkey").between(1, 2000)
        )
        write_version(
            batch.repartitionByRange(2, "o_orderkey"), pa, mode="append",
            collect_stats=("o_orderkey",),
        )
        t0 = time.time()
        rep = maintain_join_agg_from_cdf(
            spark, pa, pb, st, "o_orderkey", "l_orderkey",
            "o_orderstatus", "cents",
        )
        t_step = time.time() - t0
        t0 = time.time()
        n = (
            read_version(spark, pa)
            .join(
                read_version(spark, pb),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("cents").alias("s"))
            .collect()
        )
        t_batch = time.time() - t0
        state = {
            r["o_orderstatus"]: (r["cnt"], r["s"])
            for r in read_maintained_join_agg(spark, st).collect()
        }
        batch_res = {r["o_orderstatus"]: (r["cnt"], r["s"]) for r in n}
        assert state == batch_res, "IVM diverged from the batch recompute"
        print(
            f"IVM a_rows={read_version(spark, pa).count()} "
            f"init_drain={t_init:.2f}s step_wall={t_step:.2f}s "
            f"(pruned {rep['files_skipped']}/{rep['files_total']} counterpart "
            f"files) batch_recompute={t_batch:.2f}s"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def bench_replicate(spark, src: str, factor: int) -> None:
    """Initial full sync vs delta sync of a ~6 M-row versioned table."""
    from tts_etl_pipeline_spark.sources.replicate import replicate

    base = tempfile.mkdtemp(prefix="fsr13_repl_")
    psrc = os.path.join(base, "src")
    pdst = os.path.join(base, "dst")
    try:
        big = scaled_orders(spark, src, factor)
        write_version(
            big.repartitionByRange(64, "o_orderkey"), psrc,
            collect_stats=("o_orderkey",),
        )
        t0 = time.time()
        r1 = replicate(psrc, pdst)
        t_full = time.time() - t0
        write_version(
            big.filter(F.col("o_orderkey").between(1, 2000)).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10_000_000_000
            ),
            psrc, mode="append", collect_stats=("o_orderkey",),
        )
        t0 = time.time()
        r2 = replicate(psrc, pdst)
        t_delta = time.time() - t0
        print(
            f"REPLICATE full_sync={t_full:.2f}s "
            f"({r1['files_copied']} files, {r1['bytes_copied'] >> 20} MB) "
            f"delta_sync={t_delta:.3f}s ({r2['files_copied']} files, "
            f"{r2['bytes_copied'] >> 10} KB)"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def bench_pyds(spark, src: str, factor: int) -> None:
    """Python DataSource scan of the ~6 M-row table: pushdown-planned
    point-range read vs the full-scan filter through the same source."""
    import json

    from tts_etl_pipeline_spark.sources.pyds_versioned import register

    base = tempfile.mkdtemp(prefix="fsr13_pyds_")
    path = os.path.join(base, "t")
    prior = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    try:
        register(spark)
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        big = scaled_orders(spark, src, factor)
        write_version(
            big.repartitionByRange(64, "o_orderkey"), path,
            collect_stats=("o_orderkey",),
        )
        rpt = os.path.join(base, "rpt.json")
        # full scan FIRST: the initial Python-DataSource job pays worker
        # spin-up + Arrow setup; measuring the pruned scan first would
        # bill that cold-start to the pruning path
        t0 = time.time()
        n_full = (
            spark.read.format("versioned_table")
            .option("path", path)
            .load()
            .count()
        )
        t_full = time.time() - t0
        t0 = time.time()
        n = (
            spark.read.format("versioned_table")
            .option("path", path)
            .option("report", rpt)
            .load()
            .filter(F.col("o_orderkey").between(1, 2000))
            .count()
        )
        t_pruned = time.time() - t0
        rep = json.load(open(rpt))
        print(
            f"PYDS rows={n_full} pushdown_scan={t_pruned:.2f}s "
            f"(planned {rep['files_planned']}/{rep['files_total']} files, "
            f"{n} rows) full_scan={t_full:.2f}s"
        )
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", prior)
        shutil.rmtree(base, ignore_errors=True)


def bench_components(spark, n_nodes: int = 2_000_000) -> None:
    """Incremental components at scale: a 2 M-node chain graph committed
    whole, then ONE small batch (2 000 edges bridging existing chains) —
    the step must cost the batch's label graph, not the node count."""
    from tts_etl_pipeline_spark.sources.ivm import (
        maintain_components_from_cdf,
        read_maintained_components,
    )

    base = tempfile.mkdtemp(prefix="fsr13_cc_")
    pe, st = os.path.join(base, "e"), os.path.join(base, "st")
    try:
        edges = (
            spark.range(1, n_nodes + 1)
            .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
            .filter(F.col("a") % 10 != 0)  # chains of 10
        )
        write_version(edges.repartition(32), pe)
        t0 = time.time()
        maintain_components_from_cdf(spark, pe, st)
        t_init = time.time() - t0
        # the incremental batch: 2 000 bridge edges merging chain pairs
        bridge = (
            spark.range(1, 2001)
            .select(
                (F.col("id") * 20).alias("a"),
                (F.col("id") * 20 + 1).alias("b"),
            )
        )
        write_version(bridge, pe, mode="append")
        t0 = time.time()
        rep = maintain_components_from_cdf(spark, pe, st)
        t_step = time.time() - t0
        n = read_maintained_components(spark, st).count()
        print(
            f"COMPONENTS nodes={n} init_drain={t_init:.2f}s "
            f"step_wall={t_step:.2f}s (label_merges={rep['label_merges']}, "
            f"inserted={rep['inserted']})"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    spark = get_spark("feature_scale_r13", cpus=32)
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    for name, fn in [
        ("merge", lambda: bench_merge(spark, src, factor)),
        ("textindex", lambda: bench_textindex(spark, src)),
        ("ivm", lambda: bench_ivm(spark, src, factor)),
        ("replicate", lambda: bench_replicate(spark, src, factor)),
        ("pyds", lambda: bench_pyds(spark, src, factor)),
        ("components", lambda: bench_components(spark)),
    ]:
        if only is None or name in only:
            fn()


if __name__ == "__main__":
    main()
