"""S1/S2 — audio source: directory scan + WAV decode (pa.py:79-92,396).

Spark-first design: `binaryFile` gives one row per file with the raw bytes
(path, modificationTime, length, content); decode happens executor-side in
mapInPandas, so a 100 TB corpus decodes in parallel with no driver
involvement and bounded memory per task (the reference's lazy one-file
generator, pa.py:79-92, is exactly Spark's partition iterator).

The reference's sorted() over the glob (pa.py:396) existed only to make the
one-process loop deterministic; order is irrelevant here because downstream
adjacency (W1) is expressed as a window over (original_name, start_ms).
"""

from __future__ import annotations

import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from tts_etl_pipeline_spark.audio import kernels
from tts_etl_pipeline_spark.audio import params as P
from tts_etl_pipeline_spark.audio.schema import AUDIO_FILE_SCHEMA


def read_wav_dir(spark: SparkSession, wav_dir: str) -> DataFrame:
    """Scan *.wav files as binary rows (pa.py:396's glob, distributed)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .load(wav_dir)
    )


def decode_wav_bytes(content: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes -> (float32 samples in [-1,1], frame_rate, channels).

    stdlib-wave based for PCM (pydub/ffmpeg are not in the runtime);
    supports 16-bit and 8/32-bit PCM. Non-PCM tags the stdlib refuses —
    G.711 mu-law/A-law and mono IMA ADPCM — fall back to the manual RIFF
    path in audio/codecs.py (r5; the reference's scope was PCM-only).
    Normalization divides by the int type's max, exactly like
    pa.py:186-188.
    """
    try:
        with wave.open(io.BytesIO(content), "rb") as w:
            rate = w.getframerate()
            channels = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except wave.Error:
        from tts_etl_pipeline_spark.audio import codecs

        fmt = codecs.parse_riff(content)
        tag, raw = fmt["fmt_tag"], fmt["data"]
        if tag == codecs.WAVE_FORMAT_MULAW:
            pcm = codecs.decode_mulaw(raw)
        elif tag == codecs.WAVE_FORMAT_ALAW:
            pcm = codecs.decode_alaw(raw)
        elif tag == codecs.WAVE_FORMAT_IMA_ADPCM and fmt["channels"] == 1:
            pcm = codecs.decode_ima_adpcm(raw, fmt["block_align"])
        else:
            raise ValueError(f"unsupported WAV format tag 0x{tag:04x}")
        x = pcm.astype(np.float32) / 32767.0
        return x, fmt["rate"], fmt["channels"]
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32767.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483647.0
    elif width == 1:  # unsigned 8-bit PCM
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 127.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    return x, rate, channels


def decode_files(binary_df: DataFrame, normalize: bool = True) -> DataFrame:
    """mapInPandas decode + P1 peak-normalize + P2 downmix + P3 resample.

    Per-file decode failures are skipped with a warning row dropped, matching
    the reference's skip-and-continue (pa.py:91-92) but without losing the
    whole batch.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            names, samples_col, rates, chans = [], [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    x, rate, channels = decode_wav_bytes(content)
                    x = kernels.downmix_mono(x, channels)
                    if normalize:
                        x = kernels.peak_normalize(x)
                    x = kernels.resample_linear(x, rate, P.TARGET_FRAME_RATE)
                except Exception:
                    continue  # pa.py:91-92 — skip undecodable file
                names.append(path.rsplit("/", 1)[-1])
                samples_col.append(x)
                rates.append(P.TARGET_FRAME_RATE)
                chans.append(1)
            yield pd.DataFrame(
                {
                    "original_name": names,
                    "samples": samples_col,
                    "frame_rate": rates,
                    "channels": chans,
                }
            )

    return binary_df.select("path", "content").mapInPandas(gen, AUDIO_FILE_SCHEMA)
