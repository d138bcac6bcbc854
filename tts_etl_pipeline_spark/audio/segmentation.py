"""T1 — silence-based segmentation as a Spark operator (pa.py:95-164).

The interval algebra (detect -> split -> merge -> pad) is sequential within
one file, so it runs in a pandas UDF per file row; cross-file parallelism is
free (SURVEY §2.1-T1). The UDF returns an array of bound-structs which is
exploded into one row per segment, then the padded sample slice is taken
with JVM-side `slice()` on the samples array — no second Python hop.

Straggler note (SURVEY §7 hard-part 4): one giant file serializes inside its
UDF call; at 100 TB pre-chunk such files upstream at pass-1 boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tts_etl_pipeline_spark.audio import kernels
from tts_etl_pipeline_spark.audio.schema import SEGMENT_BOUNDS_TYPE


@F.pandas_udf(SEGMENT_BOUNDS_TYPE)
def _segment_bounds(samples: pd.Series, frame_rate: pd.Series) -> pd.Series:
    out = []
    for x, rate in zip(samples, frame_rate):
        arr = np.asarray(x, dtype=np.float32)
        rate = int(rate)
        total_ms = int(arr.size * 1000 / rate)
        nonsilent = kernels.detect_nonsilent(arr, rate)
        bounds = kernels.segment_intervals(nonsilent, total_ms)
        out.append(
            [
                {
                    "start_ms": s,
                    "end_ms": e,
                    "pad_start_ms": ps,
                    "pad_end_ms": pe,
                }
                for s, e, ps, pe in bounds
            ]
        )
    return pd.Series(out)


def segment(files_df: DataFrame) -> DataFrame:
    """file rows -> segment rows (the reference's flat-map, pa.py:150-164).

    start_ms/end_ms are the unpadded bounds (pa.py:159-160); `samples` holds
    the padded slice (pa.py:155), cut with the built-in slice() so the array
    copy happens in the JVM.
    """
    spm = F.col("frame_rate") / 1000.0  # samples per ms
    seg = (
        files_df.withColumn("seg", F.explode(_segment_bounds("samples", "frame_rate")))
        .select(
            "original_name",
            F.col("seg.start_ms").alias("start_ms"),
            F.col("seg.end_ms").alias("end_ms"),
            F.slice(
                "samples",
                (F.col("seg.pad_start_ms") * spm).cast("int") + 1,
                ((F.col("seg.pad_end_ms") - F.col("seg.pad_start_ms")) * spm).cast("int"),
            ).alias("samples"),
            "frame_rate",
        )
    )
    return seg
