#!/usr/bin/env python
"""Per-query profiling harness for the optimization rounds (guide §1).

Runs selected headline queries with the Spark UI enabled and attributes
wall time to Spark JOBS via the UI REST API: per query it reports
construction time (Python + analysis), number of jobs, number of stages,
number of tasks, total task time, and per-job wall. This separates
"Spark is executing work" from "the driver is scheduling/planning" —
the decision input for §1.2's order of operations.

Usage: python scripts/profile_bench.py [query ...]   (default: a slow set)
Writes JSON lines to stdout; human summary to stderr.
"""

from __future__ import annotations

import calendar
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tts_etl_pipeline_spark.registry import all_queries
from tts_etl_pipeline_spark.session import DEFAULT_SF_DIR, get_spark

DEFAULT_SET = [
    "c14_pareto_skyline",
    "d3_jaccard_neardup_pairs",
    "q11_important_parts",
    "g6_stat_moments",
    "q23_waiting_suppliers",
    "r2_interval_overlap_join",
    "d13_benchmark_contamination",
    "e11_native_session_window",
    "h1_time_rollup_hierarchy",
    "w2_supplier_monthly_running",
    "q1_pricing_summary",
    "v1_topk_cosine_exact",
    "d10_incremental_dedup",
    "t2_top_tokens",
]


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    names = sys.argv[1:] or DEFAULT_SET
    spark = get_spark("profile", ui=True)
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    queries = all_queries()

    # warm JVM
    spark.range(1).count()
    try:
        queries["q1_pricing_summary"](spark, "/root/testdata/sf0.001").collect()
    except Exception:
        pass

    for name in names:
        if name not in queries:
            print(f"skip {name}", file=sys.stderr)
            continue
        # second rep is the recorded one (bench takes min-of-2)
        for rep in range(2):
            jobs_before = {j["jobId"] for j in _api(base, f"applications/{app_id}/jobs")}
            spark.sparkContext.setJobGroup(f"prof-{name}-{rep}", name)
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            t_build = time.perf_counter() - t0
            df.collect()
            t_total = time.perf_counter() - t0
            spark.sparkContext.setJobGroup(None, None)
        jobs = [
            j
            for j in _api(base, f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        n_stages = sum(len(j["stageIds"]) for j in jobs)
        n_tasks = sum(j["numTasks"] for j in jobs)
        job_wall = 0.0
        for j in jobs:
            try:
                st = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                ct = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                # sub-second precision from the GMT strings' millis field
                sms = float(j["submissionTime"][20:23] or 0) / 1e3
                cms = float(j["completionTime"][20:23] or 0) / 1e3
                # timegm, not mktime: the strings are GMT, and mktime's
                # local-time reading would skew across a DST edge (ADVICE r13)
                job_wall += (calendar.timegm(ct) + cms) - (calendar.timegm(st) + sms)
            except Exception:
                pass
        # per-stage attribution: stages with FEW tasks but LARGE run time are
        # the under-parallelized ones (guide §2.5 input skew / 1-file scans)
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                infos = _api(base, f"applications/{app_id}/stages/{sid}")
            except Exception:
                continue
            for si in infos:
                stages.append(
                    {
                        "id": sid,
                        "tasks": si.get("numCompleteTasks", 0),
                        "run_ms": si.get("executorRunTime", 0),
                        "cpu_ms": round(si.get("executorCpuTime", 0) / 1e6),
                        "name": (si.get("name") or "")[:40],
                    }
                )
        stages.sort(key=lambda s: -s["run_ms"])
        rec = {
            "query": name,
            "wall": round(t_total, 4),
            "build": round(t_build, 4),
            "n_jobs": len(jobs),
            "n_stages": n_stages,
            "n_tasks": n_tasks,
            "job_wall_sum": round(job_wall, 4),
            "gap": round(t_total - t_build - job_wall, 4),
            "top_stages": stages[:6],
        }
        print(json.dumps(rec))
        print(
            f"{name:32s} wall={t_total:6.3f} build={t_build:6.3f} "
            f"jobs={len(jobs):3d} stages={n_stages:3d} tasks={n_tasks:5d} "
            f"jobwall={job_wall:6.3f} gap={rec['gap']:6.3f}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
