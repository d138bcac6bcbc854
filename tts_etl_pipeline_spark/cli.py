"""CLI — the reference's __main__ surface (process_audio.py:428-432, O2)
re-expressed: `python -m tts_etl_pipeline_spark process-audio ...` runs the
full pipeline; `run-query` executes any registered query by name.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="tts_etl_pipeline_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    pa = sub.add_parser("process-audio", help="run the full audio ETL pipeline")
    pa.add_argument("--wav-dir", required=True)
    pa.add_argument("--out-dir", required=True)
    pa.add_argument("--table", required=True, help="metadata parquet table path")
    pa.add_argument("--asr-model", default="fake", choices=["fake", "whisper"])
    pa.add_argument("--no-refresh", action="store_true")

    rq = sub.add_parser("run-query", help="run a registered query")
    rq.add_argument("name")
    rq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    rq.add_argument("--limit", type=int, default=20)

    lq = sub.add_parser("list-queries", help="list registered queries")  # noqa: F841

    ex = sub.add_parser(
        "explain", help="print the physical plan + scan summary for a query"
    )
    ex.add_argument("name")
    ex.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    args = parser.parse_args(argv)

    from tts_etl_pipeline_spark.registry import all_oracles, all_queries

    if args.cmd == "list-queries":
        oracles = all_oracles()
        for name in sorted(all_queries()):
            print(f"{name}\t{'oracle' if name in oracles else 'rows-only'}")
        return 0

    from tts_etl_pipeline_spark.session import get_spark

    spark = get_spark("cli")
    if args.cmd == "process-audio":
        from tts_etl_pipeline_spark.audio.pipeline import run_pipeline

        n = run_pipeline(
            spark,
            args.wav_dir,
            args.out_dir,
            args.table,
            asr_model=args.asr_model,
            refresh=not args.no_refresh,
        )
        print(json.dumps({"rows_written": n, "table": args.table}))
        return 0

    if args.cmd in ("run-query", "explain"):
        queries = all_queries()
        if args.name not in queries:
            print(f"unknown query {args.name!r}; see list-queries", file=sys.stderr)
            return 2
        df = queries[args.name](spark, args.sf_dir)
        if args.cmd == "explain":
            from tts_etl_pipeline_spark.plans.inspect import (
                count_shuffles,
                physical_plan,
                scans_by_table,
            )

            print(physical_plan(df))
            print(
                json.dumps(
                    {
                        "scans_by_table": scans_by_table(df),
                        "exchanges": count_shuffles(df),
                    }
                )
            )
        else:
            df.show(args.limit, truncate=False)
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
