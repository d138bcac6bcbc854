"""O1 — the full reference pipeline as ONE lazy DataFrame DAG
(pa.py:393-426). The per-file for-loop disappears: Spark parallelizes
across files, and the stage order encodes the reference's cost-based
filter placement (cheap audio gates before ASR, text gates after —
README.md:33, SURVEY §4).

    read binaryFile -> decode+normalize+resample -> segment (T1, explode)
      -> metrics (P4-P7) -> F2 gate -> F3 ASR guard -> ASR (M1)
      -> F4-F6 text gates -> W1 overlap window -> S5 wav export -> F7
      -> S4 insert-or-ignore metadata sink
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tts_etl_pipeline_spark.audio import filters
from tts_etl_pipeline_spark.audio.asr import transcribe
from tts_etl_pipeline_spark.audio.decode import decode_files, read_wav_dir
from tts_etl_pipeline_spark.audio.dsp import with_metrics
from tts_etl_pipeline_spark.audio.overlap import with_overlap_flag
from tts_etl_pipeline_spark.audio.segmentation import segment
from tts_etl_pipeline_spark.sources.sink import create_table, export_wavs, insert_or_ignore


def build_segments(spark: SparkSession, wav_dir: str, asr_model: str = "fake") -> DataFrame:
    """The lazy DAG up to the final projection (no side effects yet)."""
    files = decode_files(read_wav_dir(spark, wav_dir))
    segs = segment(files)
    scored = with_metrics(segs)
    gated = scored.filter(filters.audio_quality_gate()).filter(filters.asr_length_guard())
    with_text = transcribe(gated, model=asr_model)
    clean = with_text.filter(filters.text_quality_gate())
    return with_overlap_flag(clean)


def run_pipeline(
    spark: SparkSession,
    wav_dir: str,
    out_dir: str,
    table_path: str,
    asr_model: str = "fake",
    refresh: bool = True,
) -> int:
    """Execute end-to-end; returns rows written to the metadata table."""
    create_table(spark, table_path, refresh=refresh)
    flagged = build_segments(spark, wav_dir, asr_model)
    saved = export_wavs(flagged, out_dir).filter(filters.saved_ok())
    final = saved.select(
        "original_name",
        "wav_path",
        "text",
        "rms",
        "clipping_percent",
        "music_ratio",
        F.coalesce("overlap_flag", F.lit(False)).alias("overlap_flag"),
        "start_ms",
        "end_ms",
    )
    return insert_or_ignore(final, table_path, key="wav_path")
