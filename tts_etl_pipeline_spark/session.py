"""SparkSession factory tuned for the local[32] test harness.

All knobs default to values that behave identically on a real cluster:
AQE handles runtime partition coalescing and skew joins, shuffle
partitions default to the local core count (on a cluster you would size
this to ~2-3x total cores or leave it to AQE), and Arrow is enabled for
every pandas-UDF exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "tts_etl_pipeline_spark",
    cpus: int | None = None,
    ui: bool = False,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with scale-aware defaults.

    `ui=True` enables the Spark UI (REST status API) for profiling
    sessions (scripts/profile_bench.py) — everything else stays the
    bench/driver configuration, so profiled plans match benched plans."""
    n = cpus or cpu_count()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        # match partitions to parallelism; AQE coalesces small ones at runtime
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true" if ui else "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _quiet_bounded_window_warnings(spark)
    return spark


def _quiet_bounded_window_warnings(spark: SparkSession) -> None:
    """Silence WindowExec's "No Partition Defined" warning for this JVM.

    Every unpartitioned window in this repo runs over a relation whose row
    count is bounded by CONSTRUCTION (a bottom-k sample, a superbucket
    rollup, a capped curriculum head, a calendar-grain rollup) — correct
    at any data scale, but each one re-triggers the warning, and the noise
    means a REAL regression (a window dragging a fact-scale relation
    through one task) could hide in it. A constant partition key cannot
    suppress it either: Spark 4's EliminateWindowPartitions folds lit(0) /
    col*0 / projected-literal partition keys back to the empty spec
    (verified empirically).

    So the warning is demoted to log-level ERROR here, and the guard moves
    to a TEST: tests/test_plans.py::test_unpartitioned_windows_annotated
    fails on any `Window.orderBy` in the package without an adjacent
    `bounded:` comment stating the relation's size bound — a failing test
    is visible where a drowned warning is not."""
    try:
        jvm = spark.sparkContext._jvm
        logger = jvm.org.apache.logging.log4j.LogManager.getLogger(
            "org.apache.spark.sql.execution.window.WindowExec"
        )
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            logger.getName(), jvm.org.apache.logging.log4j.Level.ERROR
        )
    except Exception:
        pass  # non-log4j2 runtime: warnings stay, correctness unaffected
