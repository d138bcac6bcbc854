"""Inverted token index (sources/textindex.py, driver query j36):
soundness (pruned read == full-scan token filter) on real testdata,
pruning EFFECTIVENESS on a corpus where token placement is controlled,
and the sidecar lifecycle (per-version immutability, DV interplay,
typed refusals)."""

import os
import re
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tts_etl_pipeline_spark.sources.textindex import (
    TOKEN_RE,
    build_text_index,
    read_version_token_pruned,
    token_filter_expr,
)
from tts_etl_pipeline_spark.sources.versioned import (
    delete_where_dv,
    write_version,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """1000 docs over 8 range files; 'needleword' ONLY in docs 0..49
    (first file), 'everyword' in all docs."""
    base = tempfile.mkdtemp(prefix="tix_")
    path = f"{base}/docs"
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("everyword alpha beta gamma doc "),
            F.col("id").cast("string"),
            F.when(F.col("id") < 50, F.lit(" needleword")).otherwise(F.lit("")),
        ).alias("text"),
    )
    write_version(
        df.repartitionByRange(8, "doc_id"), path, collect_stats=("doc_id",)
    )
    build_text_index(spark, path, "text")
    yield path, df
    shutil.rmtree(base, ignore_errors=True)


def test_index_prunes_clustered_token(spark, corpus):
    path, df = corpus
    pruned, nread, ntot = read_version_token_pruned(spark, path, "needleword")
    assert ntot == 8
    assert nread == 1  # the token lives in ONE range file
    assert pruned.count() == 50
    assert {r["doc_id"] for r in pruned.collect()} == set(range(50))


def test_index_soundness_everyword(spark, corpus):
    path, df = corpus
    pruned, nread, ntot = read_version_token_pruned(spark, path, "everyword")
    assert nread == ntot == 8
    assert pruned.count() == 1000


def test_index_miss_reads_zero_files(spark, corpus):
    path, _ = corpus
    dfm, nread, _ = read_version_token_pruned(spark, path, "absentword")
    assert nread == 0
    assert dfm.count() == 0
    assert dfm.columns == ["doc_id", "text"]  # schema intact, zero IO


def test_index_numeric_and_case_tokens(spark, corpus):
    path, df = corpus
    # doc ids are tokens too ([0-9]+ runs); probe normalization lowercases
    pruned, nread, ntot = read_version_token_pruned(spark, path, "777")
    assert pruned.count() == 1
    assert nread < ntot  # a unique numeric token prunes hard
    up, _, _ = read_version_token_pruned(spark, path, "NEEDLEWORD")
    assert up.count() == 50  # probe normalized like the corpus


def test_index_soundness_on_testdata(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="tix_real_")
    path = f"{base}/docs"
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        write_version(
            docs.repartitionByRange(4, "doc_id"), path,
            collect_stats=("doc_id",),
        )
        build_text_index(spark, path, "text")
        sample = docs.orderBy("doc_id").limit(3).collect()
        probes = set()
        for r in sample:
            probes.update(re.findall(r"[a-z0-9]+", r["text"].lower())[:4])
        for t in sorted(probes)[:6]:
            pruned, _, _ = read_version_token_pruned(spark, path, t)
            full = docs.filter(token_filter_expr("text", t)).count()
            assert pruned.count() == full, t
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_index_is_per_version_and_immutable(spark, corpus):
    path, df = corpus
    # a new commit does NOT invalidate v1's index, but v2 has none yet
    extra = spark.createDataFrame(
        [(5000, "freshword only here")], "doc_id long, text string"
    )
    write_version(extra, path, mode="append")
    with pytest.raises(ValueError, match="no text index"):
        read_version_token_pruned(spark, path, "freshword")  # head = v2
    # v1's sidecar still serves v1 exactly
    pruned, _, _ = read_version_token_pruned(
        spark, path, "needleword", version=1
    )
    assert pruned.count() == 50
    # building v2's index picks up the new file; build is idempotent
    d2 = build_text_index(spark, path, "text")
    assert d2 == build_text_index(spark, path, "text")
    fresh, nread, _ = read_version_token_pruned(spark, path, "freshword")
    assert fresh.count() == 1 and nread == 1


def test_index_overapproximates_past_dvs_but_filters_exactly(spark):
    base = tempfile.mkdtemp(prefix="tix_dv_")
    path = f"{base}/docs"
    try:
        df = spark.range(0, 100).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") == 7, F.lit("ghostword here"))
            .otherwise(F.lit("plain text"))
            .alias("text"),
        )
        write_version(
            df.repartitionByRange(4, "doc_id"), path,
            collect_stats=("doc_id",),
        )
        delete_where_dv(spark, path, "doc_id", 7, 7)
        build_text_index(spark, path, "text")
        # the dead row's tokens still point at its file (sound
        # over-approximation) — but the READ applies the DV, so the row
        # never comes back
        pruned, nread, _ = read_version_token_pruned(spark, path, "ghostword")
        assert nread == 1
        assert pruned.count() == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_index_typed_refusals(spark, corpus):
    path, _ = corpus
    with pytest.raises(ValueError, match="not a single token"):
        read_version_token_pruned(spark, path, "two words", version=1)
    with pytest.raises(ValueError, match="not a single token"):
        read_version_token_pruned(spark, path, "", version=1)
    with pytest.raises(ValueError, match="no text index"):
        read_version_token_pruned(spark, path, "needleword", col="nope",
                                  version=1)
    with pytest.raises(ValueError, match="is not a column"):
        build_text_index(spark, path, "nope")


def test_tokenizer_matches_read_side_split():
    """The build-side regex and the read-side split pattern must agree:
    every TOKEN_RE token of a string appears in its split-array and vice
    versa (soundness hinges on this equivalence)."""
    cases = [
        "Hello, World! 42 foo_bar",
        "a--b  c\t1x2",
        "ALLCAPS mixed123CASE",
        "",
        "!!!",
    ]
    for s in cases:
        toks = set(TOKEN_RE.findall(s.lower()))
        split = {t for t in re.split(r"[^a-z0-9]+", s.lower()) if t}
        assert toks == split, s


def test_index_refuses_pending_initial_default(spark):
    """A column with a pending add_column initial-default serves default
    text through read_version that the raw files don't carry — indexing
    would MISS those files' tokens, so the build refuses typed until
    compact() materializes the default."""
    from tts_etl_pipeline_spark.sources.versioned import (
        add_column,
        compact,
    )

    base = tempfile.mkdtemp(prefix="tix_def_")
    path = f"{base}/t"
    try:
        write_version(
            spark.createDataFrame([(1,), (2,)], "doc_id long"), path
        )
        add_column(path, "text", "string", default="hello world")
        with pytest.raises(ValueError, match="initial-default"):
            build_text_index(spark, path, "text")
        compact(spark, path)  # materializes the default into real bytes
        build_text_index(spark, path, "text")
        hit, nread, _ = read_version_token_pruned(spark, path, "hello")
        assert hit.count() == 2 and nread >= 1
    finally:
        shutil.rmtree(base, ignore_errors=True)
