"""Sort-free exact quantiles (functions/exact_median.py): equality vs the
sort-based order statistic, probe-count bound, edge cases."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from tts_etl_pipeline_spark.functions.exact_median import (
    exact_kth_by_counting,
    exact_median_by_counting,
)
from tts_etl_pipeline_spark.sources.tables import table


def test_matches_numpy_on_random_integers(spark):
    rng = np.random.default_rng(17)
    vals = rng.integers(-10_000, 10_000, size=5001).tolist()
    df = spark.createDataFrame([(int(v),) for v in vals], "x long")
    arr = np.sort(vals)
    for k in (1, 2, 2500, 2501, 5000, 5001):
        assert exact_kth_by_counting(df, "x", k) == int(arr[k - 1]), k
    assert exact_median_by_counting(df, "x") == int(arr[(5001 + 1) // 2 - 1])


def test_matches_spark_median_on_cents(spark, sf_dir):
    """Lower-median of integer cents equals the sort-based k-th value."""
    orders = table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").alias("cents")
    )
    n = orders.count()
    k = (n + 1) // 2
    expect = (
        orders.orderBy("cents").limit(k).agg(F.max("cents")).collect()[0][0]
    )
    assert exact_median_by_counting(orders, "cents") == expect


def test_duplicates_and_errors(spark):
    df = spark.createDataFrame([(5,), (5,), (5,), (7,)], "x long")
    assert exact_kth_by_counting(df, "x", 1) == 5
    assert exact_kth_by_counting(df, "x", 3) == 5
    assert exact_kth_by_counting(df, "x", 4) == 7
    with pytest.raises(ValueError):
        exact_kth_by_counting(df, "x", 5)
    with pytest.raises(ValueError):
        exact_kth_by_counting(df, "x", 0)
    with pytest.raises(ValueError):
        exact_median_by_counting(spark.createDataFrame([], "x long"), "x")
