"""Property-based tests (hypothesis) — SURVEY.md §5.2:

- T1 invariants: every emitted segment is within [3s, 15s]; segments are
  ordered and non-overlapping in their unpadded bounds; emitted spans stay
  inside the union of input nonsilent intervals; padding clamps to the file.
- W1 symmetry: the overlap flag is set on both members of a matching
  adjacent pair or on neither.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tts_etl_pipeline_spark.audio import kernels
from tts_etl_pipeline_spark.audio.params import (
    MAX_DURATION_MS,
    MIN_DURATION_MS,
    SEGMENT_PADDING_MS,
)


@st.composite
def nonsilent_intervals(draw):
    """Random ordered, disjoint (start, end) interval lists like
    detect_nonsilent would produce."""
    n = draw(st.integers(0, 8))
    gaps = draw(st.lists(st.integers(300, 2000), min_size=n, max_size=n))
    lens = draw(st.lists(st.integers(50, 40_000), min_size=n, max_size=n))
    out, cur = [], 0
    for g, ln in zip(gaps, lens):
        start = cur + g
        out.append((start, start + ln))
        cur = start + ln
    total = cur + draw(st.integers(0, 1000))
    return out, total


@given(nonsilent_intervals())
@settings(max_examples=200, deadline=None)
def test_segment_invariants(iv_total):
    intervals, total_ms = iv_total
    segs = kernels.segment_intervals(intervals, total_ms)
    prev_end = -1
    for s, e, ps, pe in segs:
        dur = e - s
        assert MIN_DURATION_MS <= dur <= MAX_DURATION_MS
        # ordered, non-overlapping unpadded bounds; pass-1 split pieces of
        # one long interval legitimately touch (e_prev == s_next at 15s cuts)
        assert s >= prev_end
        prev_end = e
        assert 0 <= ps <= s and e <= pe <= total_ms
        assert s - ps <= SEGMENT_PADDING_MS and pe - e <= SEGMENT_PADDING_MS
        # every segment lies inside the span of the input intervals
        assert intervals and s >= intervals[0][0] and e <= intervals[-1][1]


@given(nonsilent_intervals())
@settings(max_examples=200, deadline=None)
def test_segment_coverage_only_splits_and_merges(iv_total):
    """Each emitted segment's endpoints coincide with pass-1 piece
    boundaries: starts/ends are either interval edges or 15s split points."""
    intervals, total_ms = iv_total
    split_points = set()
    for s, e in intervals:
        split_points.add(s)
        split_points.add(e)
        cur = s
        while e - cur > MAX_DURATION_MS:
            cur += MAX_DURATION_MS
            split_points.add(cur)
    for s, e, *_ in kernels.segment_intervals(intervals, total_ms):
        assert s in split_points and e in split_points


WORDS = st.sampled_from(["alpha", "beta", "gamma", "delta", "echo"])


@st.composite
def transcripts(draw):
    n = draw(st.integers(1, 6))
    rows = []
    for i in range(n):
        k = draw(st.integers(3, 6))
        text = " ".join(draw(st.lists(WORDS, min_size=k, max_size=k)))
        rows.append(("f.wav", i * 4000, i * 4000 + 3000, text))
    return rows


@given(rows=transcripts())
@settings(max_examples=20, deadline=None)
def test_overlap_flag_pairwise_symmetry(spark_module, rows):
    from tts_etl_pipeline_spark.audio.overlap import with_overlap_flag

    df = spark_module.createDataFrame(
        rows, "original_name string, start_ms long, end_ms long, text string"
    )
    got = sorted(with_overlap_flag(df).collect(), key=lambda r: r["start_ms"])
    # recompute expected flags in plain python (pa.py:311-330 semantics)
    texts = [r["text"].lower().split() for r in got]
    expected = [False] * len(got)
    for i in range(1, len(got)):
        if texts[i - 1][-1] == texts[i][0]:
            expected[i - 1] = True
            expected[i] = True
    assert [r["overlap_flag"] for r in got] == expected


# hypothesis is incompatible with function-scoped pytest fixtures that carry
# session state; expose the session spark fixture under a different name.
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark_module(spark):
    return spark
