"""LTTB downsampling kernel (functions/lttb.py): parity vs an independent
loop reference, shape-preservation, and invariants."""

from __future__ import annotations

import numpy as np

from tts_etl_pipeline_spark.functions.lttb import lttb, lttb_reference


def test_lttb_matches_loop_reference():
    rng = np.random.default_rng(13)
    x = np.cumsum(rng.uniform(0.5, 1.5, size=500))
    y = np.sin(x / 7.0) * 10 + rng.normal(0, 1, size=500)
    for n_out in (3, 10, 50, 200, 499):
        got = list(lttb(x, y, n_out))
        ref = lttb_reference(list(x), list(y), n_out)
        assert got == ref, n_out


def test_lttb_invariants_and_peak_preservation():
    rng = np.random.default_rng(5)
    n = 1000
    x = np.arange(n, dtype=float)
    y = rng.normal(0, 1, size=n)
    spike = 617
    y[spike] = 80.0  # a peak every downsample must keep
    idx = lttb(x, y, 40)
    assert len(idx) == 40
    assert idx[0] == 0 and idx[-1] == n - 1
    assert (np.diff(idx) > 0).all()  # strictly increasing
    assert spike in set(idx.tolist())


def test_lttb_short_series_passthrough():
    x = np.arange(5, dtype=float)
    y = x * 2
    assert list(lttb(x, y, 10)) == [0, 1, 2, 3, 4]
