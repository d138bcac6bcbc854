#!/usr/bin/env python
"""Build a 10x-scaled copy of a testdata sf directory (the sf0.1 -> sf1
scale-proof fixture, round-6 verdict task 7).

Usage: python scripts/make_scaled_sf.py [SRC_SF_DIR] [DST_DIR] [FACTOR]
       (defaults: /root/testdata/sf0.1 -> /tmp/sfscale/sf1, factor 10)

Also writes an EQUAL-LAYOUT copy of the source next to DST_DIR (default
/tmp/sfscale/sf0.1): both ends of a scale ratio must read the same
multi-part parquet layout, or the single-file driver fixture serializes
some scans into one task and the ratio measures layout, not the engine
(round-7 verdict task 4). Sweep with SPARK_GRAFT_SF_DIR=/tmp/sfscale/sf0.1
vs /tmp/sfscale/sf1 — never the raw fixture dir against sf1.

Each table is replicated FACTOR times with per-copy key offsets so the
scaled data keeps the source's per-key densities and join fanouts (the
thing that makes runtime scaling measurements honest):

- every foreign-key family shares one offset base (orders.o_orderkey and
  lineitem.l_orderkey shift together, etc.), so joins match exactly as
  often per row as at the source scale;
- nation/region stay fixed (they are fixed-size dimensions in TPC-H);
- events shift user_id by the CUSTOMER base (events join customers on
  user_id = c_custkey in st6/e-family);
- documents get per-copy token suffixes (word w -> w_<copy>) and a
  recomputed n_chars: copy 0 is the original corpus, later copies are
  vocabulary-disjoint clones. This keeps WITHIN-copy duplicate/near-dup
  structure identical to the source (dedup work scales linearly) while
  making copies mutually dissimilar — naive replication would turn every
  doc into a 10-clone near-dup cluster and inflate pair outputs
  quadratically, measuring an artifact instead of the engine. The
  vocabulary-disjoint growth is deliberately ADVERSARIAL to
  relative-frequency thresholds (per-copy dfs stay flat while n_docs
  grows): it exposed d3's relative-df-cap quadratic blowup in round 6,
  now fixed with an absolute posting-list bound (operators/dedup.py
  MAX_DF_ABSOLUTE, BASELINE.md round-6 notes);
- embeddings replicate with offset ids (identical vectors across copies —
  ANN cost is corpus-size-driven, not value-driven).

All transforms are JVM-side expressions; one pass per table.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tts_etl_pipeline_spark.session import get_spark  # noqa: E402
from tts_etl_pipeline_spark.sources.tables import TABLE_NAMES  # noqa: E402


def _copies(df, factor: int):
    return df.withColumn(
        "copy", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )


def _base(df, col: str) -> int:
    return int(df.agg(F.max(col)).collect()[0][0]) + 1


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make_scaled_sf")
    os.makedirs(dst, exist_ok=True)

    def rd(t):
        return spark.read.parquet(os.path.join(src, f"{t}.parquet"))

    # Both ends of every scale ratio must read the SAME multi-part layout:
    # the driver's sf0.1 fixtures are single parquet files, which serialize
    # some scans/writes into one task and polluted several sf0.1->sf1
    # ratios below 1x (round-7 verdict task 4). repartition — never
    # coalesce: coalesce cannot INCREASE the partition count, so a
    # single-file source would stay single-part straight through the
    # explode and the "scaled" fixture would single-task too.
    parts = max(2, factor // 2)

    def wr(df, t, where=dst):
        df.repartition(parts).write.mode("overwrite").parquet(
            os.path.join(where, f"{t}.parquet")
        )
        print("wrote", os.path.join(where, f"{t}.parquet"), df.count())

    # equal-layout copy of the SOURCE scale: the sweep's small end reads
    # this, not the raw single-file fixture dir
    src_copy = os.path.join(
        os.path.dirname(dst.rstrip("/")) or ".",
        os.path.basename(src.rstrip("/")),
    )
    if os.path.abspath(src_copy) == os.path.abspath(dst):
        raise ValueError(
            f"source copy {src_copy} collides with DST_DIR — give src and "
            "dst distinct basenames or the scaled tables would silently "
            "overwrite the equal-layout source copy"
        )
    if os.path.abspath(src_copy) != os.path.abspath(src):
        os.makedirs(src_copy, exist_ok=True)
        for t in TABLE_NAMES:
            wr(rd(t), t, where=src_copy)

    # fixed-size dimensions: copy through
    for t in ("region", "nation"):
        wr(rd(t), t)

    cust, supp, part = rd("customer"), rd("supplier"), rd("part")
    orders, lineitem = rd("orders"), rd("lineitem")
    events, docs, emb = rd("events"), rd("documents"), rd("embeddings")

    C, S, P, O = _base(cust, "c_custkey"), _base(supp, "s_suppkey"), _base(part, "p_partkey"), _base(orders, "o_orderkey")
    E = _base(events, "event_id")
    D = max(_base(docs, "doc_id"), _base(emb, "vec_id"))

    off = lambda b: F.col("copy").cast("bigint") * b  # noqa: E731

    wr(
        _copies(cust, factor)
        .withColumn("c_custkey", F.col("c_custkey") + off(C))
        .drop("copy"),
        "customer",
    )
    wr(
        _copies(supp, factor)
        .withColumn("s_suppkey", F.col("s_suppkey") + off(S))
        .drop("copy"),
        "supplier",
    )
    wr(
        _copies(part, factor)
        .withColumn("p_partkey", F.col("p_partkey") + off(P))
        .drop("copy"),
        "part",
    )
    wr(
        _copies(orders, factor)
        .withColumn("o_orderkey", F.col("o_orderkey") + off(O))
        .withColumn("o_custkey", F.col("o_custkey") + off(C))
        .drop("copy"),
        "orders",
    )
    wr(
        _copies(lineitem, factor)
        .withColumn("l_orderkey", F.col("l_orderkey") + off(O))
        .withColumn("l_partkey", F.col("l_partkey") + off(P))
        .withColumn("l_suppkey", F.col("l_suppkey") + off(S))
        .drop("copy"),
        "lineitem",
    )
    wr(
        _copies(events, factor)
        .withColumn("event_id", F.col("event_id") + off(E))
        .withColumn("user_id", F.col("user_id") + off(C))
        .drop("copy"),
        "events",
    )
    perturbed = F.when(F.col("copy") == 0, F.col("text")).otherwise(
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.lit("_"), F.col("copy").cast("string")),
            ),
            " ",
        )
    )
    wr(
        _copies(docs, factor)
        .withColumn("doc_id", F.col("doc_id") + off(D))
        .withColumn("text", perturbed)
        .withColumn("n_chars", F.length(F.coalesce("text", F.lit(""))).cast(
            docs.schema["n_chars"].dataType.simpleString()
        ))
        .drop("copy"),
        "documents",
    )
    wr(
        _copies(emb, factor)
        .withColumn("vec_id", F.col("vec_id") + off(D))
        .drop("copy"),
        "embeddings",
    )
    print("done ->", dst)


if __name__ == "__main__":
    main()
