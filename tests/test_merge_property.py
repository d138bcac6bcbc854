"""Property test: the full-clause-matrix merge() against a pure-Python
reference of the Delta clause semantics, over hypothesis-generated
tables, sources, and clause lists — first-satisfied-wins ordering,
condition NULL-handling, and default fall-throughs all covered by
construction rather than by hand-picked cases."""

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tts_etl_pipeline_spark.sources.versioned import (
    merge,
    read_version,
    write_version,
)

# (SQL condition over t./s. aliases, python evaluator over (tv, sv));
# SQL NULL coalesces to False in merge(), mirrored here
CONDS = [
    (None, lambda tv, sv: True),
    ("s.v < 0", lambda tv, sv: sv is not None and sv < 0),
    ("t.v % 2 = 0", lambda tv, sv: tv is not None and tv % 2 == 0),
    ("s.v > t.v", lambda tv, sv: tv is not None and sv is not None and sv > tv),
]

cond_ix = st.integers(min_value=0, max_value=len(CONDS) - 1)
matched_clauses = st.lists(
    st.tuples(st.sampled_from(["update", "delete"]), cond_ix),
    max_size=2,
)
insert_clauses = st.lists(
    st.tuples(st.just("insert"), st.sampled_from([0, 1])), max_size=1
)
nmbs_clauses = st.lists(
    st.tuples(st.sampled_from(["delete", "update"]), st.sampled_from([0, 2])),
    max_size=1,
)
rows = st.dictionaries(
    st.integers(min_value=0, max_value=14),
    st.integers(min_value=-5, max_value=5),
    max_size=10,
)
src_rows = st.dictionaries(
    st.integers(min_value=0, max_value=19),
    st.integers(min_value=-5, max_value=5),
    max_size=10,
)


def _ref_merge(target, source, matched, not_matched, nmbs):
    out = {}
    for k, tv in target.items():
        if k in source:
            sv = source[k]
            act = None
            for a, ci in matched:
                if CONDS[ci][1](tv, sv):
                    act = a
                    break
            if act == "update":
                out[k] = sv
            elif act is None:
                out[k] = tv
        else:
            act = None
            for a, ci in nmbs:
                if CONDS[ci][1](tv, None):
                    act = a
                    break
            if act is None:
                out[k] = tv
            elif act == "update":
                out[k] = tv + 100
    for k, sv in source.items():
        if k in target:
            continue
        for _a, ci in not_matched:
            if CONDS[ci][1](None, sv):
                out[k] = sv
                break
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    target=rows,
    source=src_rows,
    matched=matched_clauses,
    not_matched=insert_clauses,
    nmbs=nmbs_clauses,
)
def test_merge_matches_reference_semantics(
    spark, target, source, matched, not_matched, nmbs
):
    if not target:
        return  # merge needs a committed table; empty-table arm is j35's
    base = tempfile.mkdtemp(prefix="mgprop_")
    path = f"{base}/t"
    try:
        write_version(
            spark.createDataFrame(
                sorted(target.items()), "k long, v long"
            ),
            path,
            collect_stats=("k",),
        )
        sdf = spark.createDataFrame(
            sorted(source.items()) or [(None, None)], "k long, v long"
        )
        if not source:
            sdf = sdf.limit(0)
        m = tuple((a, CONDS[ci][0]) for a, ci in matched)
        nm = tuple((a, CONDS[ci][0]) for a, ci in not_matched)
        nb = tuple(
            (a, CONDS[ci][0]) if a == "delete"
            else (a, CONDS[ci][0], {"v": "t.v + 100"})
            for a, ci in nmbs
        )
        v = merge(
            spark, path, sdf, "k",
            matched=m, not_matched=nm, not_matched_by_source=nb,
        )
        if v is None:
            got = target  # provably-nothing-to-do: table untouched
        else:
            got = {
                r["k"]: r["v"] for r in read_version(spark, path).collect()
            }
        assert got == _ref_merge(target, source, matched, not_matched, nmbs)
    finally:
        shutil.rmtree(base, ignore_errors=True)
