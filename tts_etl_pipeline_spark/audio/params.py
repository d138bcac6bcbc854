"""The reference's semantic contract — constants from process_audio.py
(SURVEY.md Appendix B). Values must not drift: the filters' pass/reject
behavior at these exact thresholds IS the pipeline's specification.
"""

MIN_DURATION_MS = 3_000  # pa.py:17 — minimum emitted segment length (F1)
MAX_DURATION_MS = 15_000  # pa.py:18 — split/merge budget (T1)
SILENCE_THRESHOLD_DB = -35.0  # pa.py:19 — dBFS below which audio is silence
MIN_SILENCE_LEN_MS = 300  # pa.py:20 — minimum silence run that splits speech
SEGMENT_PADDING_MS = 200  # pa.py:21 — slice padding (start/end, clamped)

MIN_RMS = 250.0  # pa.py:25 — integer-sample-scale RMS floor (F2)
MAX_CLIPPING_PERCENT = 1.0  # pa.py:26 — max % of near-full-scale samples (F2)
MUSIC_BASS_HZ = 80.0  # pa.py:29 — bass band upper edge (P7)
MUSIC_TREBLE_HZ = 8_000.0  # pa.py:30 — treble band lower edge (P7)
MUSIC_ENERGY_RATIO = 2.0  # pa.py:31 — max (bass+treble)/speech ratio (F2)
MUSIC_ERROR_SENTINEL = -1.0  # pa.py:208-210 — music_ratio on computation error

MUSIC_BAND_LOW_HZ = 100.0  # pa.py:193 — band-limit used for "total" energy
MUSIC_BAND_HIGH_HZ = 7_500.0  # pa.py:193

MAX_ASR_INPUT_MS = 29_500  # pa.py:34 — Whisper 30 s window guard (F3)
CLIPPING_THRESHOLD = 0.98  # pa.py:189 — |x| >= 0.98 counts as clipped
INT16_FULL_SCALE = 32_767.0  # pa.py:186-188 — int16 normalization divisor

TARGET_FRAME_RATE = 16_000  # pa.py:89 — ASR input rate
TARGET_CHANNELS = 1  # pa.py:88

MIN_WORDS = 2  # pa.py:302 — keep only if word count > 2 (F4)
HALLUCINATION_RE = (  # pa.py:291-294 — case-insensitive (F6)
    r"\[.*?\]|\(.*?\)|thanks for watching|thank you for watching"
)

OUTPUT_NAME_FORMAT = "%s_%04ds_%04ds.wav"  # pa.py:339-343 (P9/S5)
