from tts_etl_pipeline_spark.plans.inspect import (
    count_shuffles,
    has_broadcast_join,
    physical_plan,
    pushed_filters,
    scan_columns,
    unpartitioned_windows,
)

__all__ = [
    "count_shuffles",
    "has_broadcast_join",
    "physical_plan",
    "pushed_filters",
    "scan_columns",
    "unpartitioned_windows",
]
