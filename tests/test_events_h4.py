"""h4 LTTB downsampling query: parity vs a driver-side replay."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from tts_etl_pipeline_spark.functions.lttb import lttb
from tts_etl_pipeline_spark.operators.events import H4_POINTS, h4_lttb_downsample
from tts_etl_pipeline_spark.sources.tables import table


def test_h4_matches_driver_side_replay(spark, sf_dir):
    got = {}
    for r in h4_lttb_downsample(spark, sf_dir).collect():
        got.setdefault(r["event_type"], []).append((r["point_idx"], r["hour"], r["avg_value"]))
    hourly = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.round(F.avg("value"), 6).alias("avg_value"))
        .collect()
    )
    series: dict = {}
    for r in hourly:
        series.setdefault(r["event_type"], []).append((r["hour"], r["avg_value"]))
    assert set(got) == set(series)
    for et, pts in series.items():
        pts.sort()
        x = np.array([p[0].timestamp() for p in pts])
        y = np.array([p[1] for p in pts])
        idx = lttb(x * 1e6, y, H4_POINTS)  # micros, matching the int64 cast
        expect = [
            (i, pts[j][0].strftime("%Y-%m-%d %H:%M:%S"), pts[j][1])
            for i, j in enumerate(idx)
        ]
        assert got[et] == expect, et
    # each series reduced to exactly H4_POINTS (fixtures have > 24 hours)
    assert all(len(v) == H4_POINTS for v in got.values())
