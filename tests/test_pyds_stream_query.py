"""st11: the custom-Python-DataSource streaming rollup equals the pure
generator's closed-form recount."""

from __future__ import annotations


def test_st11_matches_generator_recount(spark, sf_dir):
    from tts_etl_pipeline_spark.operators.streaming_queries import (
        st11_pyds_stream_counts,
    )
    from tts_etl_pipeline_spark.sources.pyds import _synth_row

    got = {
        r["event_type"]: (r["n_events"], r["min_id"], r["max_id"], round(r["total_value"], 2))
        for r in st11_pyds_stream_counts(spark, sf_dir).collect()
    }
    agg: dict = {}
    for i in range(2000):
        eid, _user, et, val = _synth_row(i, 11)
        n, lo, hi, cents = agg.get(et, (0, eid, eid, 0))
        agg[et] = (n + 1, min(lo, eid), max(hi, eid), cents + int(val * 100))
    expect = {
        et: (n, lo, hi, round(cents / 100, 2))
        for et, (n, lo, hi, cents) in agg.items()
    }
    assert got == expect
