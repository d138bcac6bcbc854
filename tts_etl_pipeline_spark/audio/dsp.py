"""P4-P7 — per-segment signal metrics as one Arrow-batched pandas UDF
(pa.py:167-238 computes metrics and filters in a single fused pass; here the
metrics come back as one struct column and the F2 gate in filters.py is a
plain Catalyst filter, which whole-stage codegen fuses for free —
SURVEY §4 'fused metric-compute + filter').
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tts_etl_pipeline_spark.audio import kernels
from tts_etl_pipeline_spark.audio.schema import METRICS_TYPE


@F.pandas_udf(METRICS_TYPE)
def _metrics(samples: pd.Series, frame_rate: pd.Series) -> pd.DataFrame:
    rms, clip, music = [], [], []
    for x, rate in zip(samples, frame_rate):
        arr = np.asarray(x, dtype=np.float32)
        rms.append(kernels.rms_int_scale(arr))
        clip.append(kernels.clipping_percent(arr))
        music.append(kernels.music_ratio(arr, int(rate)))
    return pd.DataFrame(
        {"rms": rms, "clipping_percent": clip, "music_ratio": music}
    )


def with_metrics(segments_df: DataFrame) -> DataFrame:
    """Add rms / clipping_percent / music_ratio columns (one Python hop)."""
    return (
        segments_df.withColumn("m", _metrics("samples", "frame_rate"))
        .withColumn("rms", F.col("m.rms"))
        .withColumn("clipping_percent", F.col("m.clipping_percent"))
        .withColumn("music_ratio", F.col("m.music_ratio"))
        .drop("m")
    )
