#!/usr/bin/env python
"""Benchmark driver: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"cpu_total": ..., "sf": ..., "n_queries": ..., "detail": "bench_detail.json"}.

Per-query wall/cpu detail goes to the SIDECAR file named by "detail"
(bench_detail.json next to this script), NOT to stdout: the round-10
record came back `parsed: null` because the old single line carrying 52
per-query walls + cpus overflowed the 2000-char stdout tail the driver
keeps — the headline line must stay small enough to survive that tail
whatever the query count grows to (r10 verdict task 1).

Each query is materialized with collect() (results are small aggregates /
top-k) or a noop-count for large outputs. Timing includes plan + execution,
excludes session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tts_etl_pipeline_spark.registry import all_queries  # noqa: E402
from tts_etl_pipeline_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402

# Queries timed per-round; grows as operators land. Names must exist in the
# registry. Keep this the "one of each shape" set, not the full inventory.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q9_product_profit",
    "q13_customer_distribution",
    "q18_large_volume_customer",
    "w1_topk_suppliers_per_nation",
    "w2_supplier_monthly_running",
    "g1_rollup_revenue",
    "e2_hourly_event_counts",
    "e3_user_sessions",
    "t2_top_tokens",
    "d1_exact_dedup",
    "d3_jaccard_neardup_pairs",
    "v1_topk_cosine_exact",
    "q17_small_quantity_revenue",
    "t7_bpe_token_counts",
    "q11_important_parts",
    "w5_range_frame_revenue",
    "w6_distribution_ranks",
    "s4_full_outer_reconcile",
    "g6_stat_moments",
    "e5_cohort_retention",
    "h1_time_rollup_hierarchy",
    # r3 additions — new shapes: checkpointed funnel fan-out; bloom-routed
    # incremental anti-join (BASELINE.md "round 3" note has their costs)
    "c6_corpus_curation_funnel",
    "d10_incremental_dedup",
    # r4 additions — new shapes: 8-gram broadcast-semi-join decontamination;
    # regex-heavy per-row scrub (BASELINE.md "round 4" note)
    "d13_benchmark_contamination",
    "t10_pii_redaction",
    # r5 additions — new shapes: fully in-Spark two-level prefix sum;
    # two-phase hot-key top-N; broadcast-rate mixture downsample
    "t12_sequence_packing",
    "c8_source_quota_cap",
    "c9_mixture_downsample",
    # r5 additions, second batch — new shapes: rational bigram-lift ranking
    # (TakeOrdered top-k over vocab-scale joins); explode-replicated mixture
    # upsample; integer-exact drift audit; windowed OHLC picks
    "t15_bigram_lift",
    "c10_mixture_upsample",
    "dq5_distribution_drift",
    "h2_daily_value_bars",
    # r5 additions, fourth batch — new shapes: one-shuffle lead() transition
    # matrix; calendar-bounded sequence-explode gap grid; optimizer-assisted
    # two-phase curriculum interleave (BASELINE.md "round 5" note)
    "e9_event_transitions",
    "h3_hourly_gap_audit",
    "c12_curriculum_interleave",
    # r5 additions, fifth batch — new shapes: chained CEP carry windows;
    # integer dot-product data selection; grid-bucketed interval join
    # (BASELINE.md "round 5" notes)
    "e10_funnel_pattern_match",
    "t20_dsir_target_affinity",
    "r2_interval_overlap_join",
    # r7 additions — new shapes: Misra-Gries candidates + broadcast recount
    # (exact heavy hitters, bounded-state candidate generation); metadata-
    # pre-filtered exact top-k vector search (semi-join prune before
    # ranking). Cross-round totals compare on the pre-r7 41-query set.
    "x7_heavy_hitter_tokens",
    "v7_filtered_ann_topk",
    # r7 additions, second batch — new shapes: native session_window
    # aggregation (single-shuffle sessionization, no Window pass).
    # Cross-round totals compare on the pre-r7 41-query set.
    "e11_native_session_window",
    "x8_kmv_set_ops",
    # r7 additions, fourth batch — new shapes: LATERAL decorrelated to
    # WindowGroupLimit partial top-k; VARIANT parse-once extraction
    # (vs e1's per-path string re-parse). f9/u6 are deliberately NOT
    # headline: their plans are subsets of shapes already measured
    # (broadcast join + bounded agg; single-scan partial agg). st15/j2/j3
    # are also excluded: the streaming family has never been headline
    # (bench measures batch query shapes), and j2/j3 are write-dominated
    # layout rehearsals — their scale rows live in BASELINE.md instead.
    "s6_lateral_topk_per_nation",
    "e12_variant_extract",
    # r7 additions, sixth batch — new shapes: capped-wedge candidate join +
    # pair anti-join (link prediction); distributive local-skyline ->
    # single-merge Pareto pass (mapInPandas reduce); engine-side SQL-
    # scripting bisection (log-many filtered-aggregate probes, no sort).
    # d16/dq10/m5 are deliberately NOT headline: d16 is d3's inverted-index
    # shape with a different final ratio, dq10 is a write-dominated
    # versioned-table rehearsal (j2/j3 precedent), m5 is synthesized-media
    # (m2/m3 precedent) — their scale rows live in BASELINE.md instead.
    "c14_pareto_skyline",
    # r7 additions, seventh batch — new shapes: fact-fact interval-typed
    # latency join (no broadcast hint, AQE-chosen); 9-row histogram +
    # broadcast scalar share pass (Benford). j4/st17/u8/f13/pr5 are
    # deliberately NOT headline: j4 is a write-dominated layout rehearsal
    # (j2/j3 precedent), st17 is streaming (never headline), u8's
    # grouped-map and f13's collated agg are plan subsets of measured
    # shapes, and pr5's strong-graph 3-core is EMPTY at sf>=0.1 (the
    # fixture's weight-floored backbone thins to a forest as the catalog
    # grows — a correct but 0-row answer is no throughput signal). Their
    # scale rows live in BASELINE.md instead.
    "f14_interval_arithmetic",
    "dq11_benford_audit",
    # r7 additions, eighth batch — new shape: native space-saving sketch
    # sized to exactness + bounded re-rank of the exploded sketch rows.
    # u9 (python UDTF pass) and st18 (streaming) follow their families'
    # not-headline precedents; scale rows in BASELINE.md.
    "x10_native_approx_topk",
    # r8 addition — new shape: TPC-H Q21's EXISTS + NOT-EXISTS-on-same-fact
    # rewritten to ONE fact scan + one order-grain aggregation (the join's
    # hash partitioning reused; no window, no second lineitem shuffle).
    # j7 and pr6 are deliberately NOT headline: j7 is a write-dominated
    # layout rehearsal (j2/j3/j4 precedent), pr6 is iterative graph
    # machinery (pr-family precedent) — scale rows live in BASELINE.md.
    "q23_waiting_suppliers",
    # r9 additions j8 (MERGE INTO audit), st21 (CDF-driven IVM), j9
    # (manifest-stats pruned scan) and j10 (SCD2 history) are deliberately
    # NOT headline: all are write-dominated protocol rehearsals (seed
    # commits + merge/fold/maintenance commits dominate the wall — the
    # j2/j3/j4/j7/dq10 precedent, and st* is never headline). j11 (runtime
    # bloom-filter join) follows j4's optimizer-rehearsal precedent: its
    # conf scoping + in-query plan assertion are the subject, not
    # throughput. Scale rows for all five live in BASELINE.md.
    # r10 additions j12 (SCD2 incremental-fold protocol), j13 (time travel
    # AS OF x SCD2 composition), j14 (point-in-time dimension join) and
    # j15 (key-clustered fold range pruning), j16 (row-level
    # DELETE/UPDATE with manifest file pruning), j17 (CHECK
    # constraints), j18 (bloom-sidecar point lookup) and j19 (rename/
    # drop column evolution) are
    # deliberately NOT headline: write-dominated
    # fold/mutation/protocol rehearsals like j8/j10 (same precedent) —
    # each pays its seed commits before its subject (the write contract
    # / AS OF prefix / AS-OF-event-time join / clustered file reuse /
    # pruned mutation / constraint gate) even runs. Scale rows in
    # BASELINE.md.
]

# FIXED-COST heavies (round-8 policy, r7 verdict task 5): queries whose wall
# cost is dominated by iterative scheduling or probe counts — per-level BFS
# joins (pr3), per-round peels, log-many bisection probes (u7) — are
# CONSTANT-ish in data volume, so including them in the headline total makes
# round-over-round totals progressively less comparable (they were ~14.6 s of
# r7's 51.4 s while being measured sub-linear or flat to sf1). Same reason
# pr1/d12/st5 were excluded in r1 (BASELINE.md note). They are still
# benchmarked every round — run `python bench.py --spot-check` to time ONLY
# this list; the per-round numbers live in BASELINE.md's spot-check table,
# NOT in the headline JSON, so the headline total stays dominated by
# throughput-shaped queries.
SPOT_CHECK = [
    "pr2_triangle_clustering",
    "pr3_bfs_hop_distances",
    "pr4_link_prediction",
    "u7_sql_script_bisection",
]


def _cpu_seconds() -> float:
    """Total CPU seconds (utime+stime, /proc) consumed by this process and
    every LIVE descendant — the local[*] JVM and its pyspark/Arrow worker
    daemons. The co-tenant-immune companion to wall time (round-9 verdict
    task 4): host steal and scheduler contention inflate wall but not CPU,
    so a wall band on identical code with a flat CPU band is attributable
    to the host, decidable from one run instead of a quiet-host re-measure.
    Caveat (honest bound): CPU of descendants that EXITED mid-interval is
    lost; the JVM and its daemons live for the whole bench, so per-query
    deltas are tight in practice."""
    me = os.getpid()
    procs: dict[int, tuple[int, int]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat", "rb") as fh:
                # comm may contain spaces/parens: split AFTER the last ')'
                fields = fh.read().rsplit(b")", 1)[-1].split()
            # fields[0]=state, [1]=ppid, [11]=utime, [12]=stime (ticks)
            procs[int(pid)] = (int(fields[1]), int(fields[11]) + int(fields[12]))
        except (OSError, IndexError, ValueError):
            continue  # raced a process exit; fine
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in procs.items():
        children.setdefault(ppid, []).append(pid)
    total, stack, seen = 0, [me], set()
    while stack:
        p = stack.pop()
        if p in seen or p not in procs:
            continue
        seen.add(p)
        total += procs[p][1]
        stack.extend(children.get(p, []))
    return total / os.sysconf("SC_CLK_TCK")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    queries = all_queries()
    pool = SPOT_CHECK if "--spot-check" in sys.argv[1:] else HEADLINE
    names = [n for n in pool if n in queries]

    # warm the JVM: codegen, parquet reader, Arrow, and broadcast machinery
    # all JIT on first use — run the flagship once at the smallest sf so the
    # timed loop measures steady-state execution, not JVM warmup
    spark.range(1).count()
    try:
        queries["q1_pricing_summary"](spark, "/root/testdata/sf0.001").collect()
    except Exception:
        pass
    # warm the shuffle exchange path too (hash partitioner, shuffle
    # writer/reader, AQE stage machinery): the sf0.001 flagship plan has no
    # Exchange to exercise, so without this the FIRST timed query that
    # shuffles pays the one-time init+JIT inside its timed region (measured
    # ~0.5 s on the first shuffling query, r13 optimization round). All
    # synthetic range data — nothing here touches the timed tables or
    # caches their results.
    from pyspark.sql import functions as _F

    try:  # degrade to an unwarmed measurement, never abort the bench (ADVICE r13)
        (
            spark.range(100_000)
            .repartition(8, _F.xxhash64("id"))
            .groupBy((_F.col("id") % 7).alias("g"))
            .count()
            .collect()
        )
    except Exception:
        pass

    # Each query is timed twice back-to-back and the MIN recorded: the
    # shared host shows transient contention spikes (BASELINE.md documents
    # ±20% with occasional 2-3x outliers), and min-of-2 measures the
    # steady-state plan cost rather than the noise. Construction + collect
    # both sit inside the timed region, so eager materialization
    # (checkpoint) costs stay visible.
    # CPU time rides along per query (same min-wall rep): sum of utime+stime
    # across the driver + JVM + worker tree. Wall answers "how long did the
    # user wait"; CPU answers "how much work was it" and is immune to host
    # steal — a round whose wall inflates uniformly while CPU holds flat is
    # a host regime, not a regression (the r7/r9 band dispute, decidable
    # from one run now).
    timings: dict[str, float] = {}
    cpu: dict[str, float] = {}
    for name in names:
        best, best_cpu = float("inf"), 0.0
        for _ in range(2):
            c0 = _cpu_seconds()
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.collect()  # headline queries return aggregates / top-k (small)
            wall = time.perf_counter() - t0
            if wall < best:
                best, best_cpu = wall, _cpu_seconds() - c0
        timings[name] = round(best, 4)
        cpu[name] = round(best_cpu, 4)

    total = round(sum(timings.values()), 4)
    metric = (
        "spot_check_total_wall" if pool is SPOT_CHECK else "headline_total_wall"
    )
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # per-query detail -> sidecar (never stdout: see module docstring)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
    )
    with open(detail_path, "w", encoding="utf-8") as fh:
        json.dump(
            {
                "metric": metric,
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cpu": cpu,
                "cpu_total": round(sum(cpu.values()), 4),
                "sf": sf_val,
            },
            fh,
            indent=1,
        )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": total,
                "unit": "sec",
                "cpu_total": round(sum(cpu.values()), 4),
                "sf": sf_val,
                "n_queries": len(timings),
                "detail": "bench_detail.json",
            }
        )
    )


if __name__ == "__main__":
    main()
