"""The completed WAP staging matrix: COPY-ON-WRITE mutations
(delete_where / update_where / replace_where) staged on a branch — the
r13 completion of the r12 equality-delete and DV arms. Each stages on
the BRANCH snapshot, leaves main byte-identical until fast_forward, and
publishes exactly the staged lineage."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from tts_etl_pipeline_spark.sources.versioned import (
    create_branch,
    current_version,
    delete_where,
    fast_forward,
    manifest,
    read_branch,
    read_version,
    replace_where,
    update_where,
    write_version,
)


def test_cow_mutations_stage_on_wap_branch(spark):
    base = tempfile.mkdtemp(prefix="wapm_")
    path = f"{base}/t"
    try:
        df = spark.range(1, 201).select(
            F.col("id").alias("k"), (F.col("id") * 10.0).alias("p")
        )
        write_version(
            df.repartitionByRange(4, "k"), path, collect_stats=("k",)
        )
        m1 = manifest(path, 1)
        sig = {
            f: os.stat(os.path.join(path, f)).st_mtime_ns for f in m1["files"]
        }
        create_branch(path, "audit")
        # stage all three copy-on-write mutations on the branch
        v2 = delete_where(spark, path, "k", 1, 10, branch="audit")
        v3 = update_where(
            spark, path, "k", 11, 20, {"p": "p + 1"}, branch="audit"
        )
        repl = spark.createDataFrame(
            [(21, 7.0), (22, 8.0)], "k long, p double"
        )
        v4 = replace_where(repl, path, "k", 21, 30, branch="audit")
        assert (v2, v3, v4) == (2, 3, 4)
        # the SECOND and THIRD mutations saw the BRANCH snapshot: k<=10
        # stayed deleted through them
        staged = {
            r["k"]: r["p"] for r in read_branch(spark, path, "audit").collect()
        }
        exp = {}
        for i in range(11, 201):
            if 21 <= i <= 30:
                continue  # replaced slice
            exp[i] = i * 10.0 + (1 if i <= 20 else 0)
        exp[21], exp[22] = 7.0, 8.0
        assert staged == exp
        # main: byte-identical until publish
        assert current_version(path) == 1
        assert manifest(path, 1)["files"] == m1["files"]
        assert {
            f: os.stat(os.path.join(path, f)).st_mtime_ns
            for f in m1["files"]
        } == sig
        assert read_version(spark, path).count() == 200
        # publish delivers exactly the staged lineage
        assert fast_forward(path, "audit") == 4
        final = {r["k"]: r["p"] for r in read_version(spark, path).collect()}
        assert final == exp
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_branch_mutation_pruning_still_rides_by_reference(spark):
    """Staged copy-on-write mutations keep the manifest-pruning shape on
    the branch: files disjoint from the mutated range carry with their
    mtimes intact into the staged version."""
    base = tempfile.mkdtemp(prefix="wapm_")
    path = f"{base}/t"
    try:
        df = spark.range(1, 2001).select(
            F.col("id").alias("k"), (F.col("id") * 10.0).alias("p")
        )
        write_version(
            df.repartitionByRange(8, "k"), path, collect_stats=("k",)
        )
        m1 = manifest(path, 1)
        sig = {
            f: os.stat(os.path.join(path, f)).st_mtime_ns for f in m1["files"]
        }
        create_branch(path, "audit")
        delete_where(spark, path, "k", 1, 40, branch="audit")
        import json

        with open(
            os.path.join(path, "_versions", "v00000002-audit.json")
        ) as fh:
            m2 = json.load(fh)
        carried = 0
        for f in m1["files"]:
            r = m1["stats"].get(f, {}).get("k")
            if r and (r[1] < 1 or r[0] > 40):
                assert f in m2["files"]
                assert os.stat(os.path.join(path, f)).st_mtime_ns == sig[f]
                carried += 1
        assert carried >= 6
    finally:
        shutil.rmtree(base, ignore_errors=True)
