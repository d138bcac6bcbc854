"""Product quantization (PQ) for memory-bounded similarity search — the
FAISS-style scale path (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).

Why this exists at 100 TB: the exact kernels (v1/v2) and the partition
routers (v3 IVF, v4 LSH, v5 graph) all still touch full float vectors —
64 dims × 4 bytes = 256 B/vector. PQ compresses each vector to M uint8
codes (here 16 B — 16×) by quantizing each of M subspaces against its own
K-centroid codebook, and scores queries WITHOUT decompressing: a per-query
M×K table of subspace dot products turns each candidate's score into M
table lookups + a sum (asymmetric distance computation, ADC). The corpus
scan becomes a 16-byte-per-row table walk; the float vectors are needed
only for the final exact re-rank of a small candidate pool.

Design decisions mirroring production systems:
- Codebooks are trained DRIVER-SIDE on a bounded hash-sample (FAISS trains
  on ~100k sampled vectors regardless of corpus size) — control-plane, the
  broadcast is M×K×(dim/M) floats = one codebook page.
- Training is a seeded, fixed-iteration Lloyd's k-means with hash-ordered
  deterministic init, so the index is reproducible run-to-run (same
  discipline as v3's seeded KMeans / v5's hash-seeded graph).
- Encoding + ADC scoring run in Arrow-batched mapInPandas: no shuffle —
  the only shuffled relation is the per-partition candidate pool,
  O(n_queries × pool × n_partitions) rows.

Approximate ⇒ rows-only driver check; recall and compression floors are
pinned in tests/test_ann_recall.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PQ_M = 16         # subspaces (4 dims each on the 64-d fixture)
PQ_K = 16         # centroids per subspace codebook (codes fit uint8)
PQ_TRAIN_MAX = 4096   # codebook training-sample cap (driver-side, bounded)
PQ_ITERS = 10     # Lloyd iterations (fixed => deterministic)


def _hash_sample_rows(emb: DataFrame, cap: int) -> np.ndarray:
    """Deterministic bounded training sample: the `cap` corpus vectors with
    the smallest md5(vec_id) — the same bottom-k idiom as x3, so the sample
    is reproducible across runs, engines, and partitionings. Control-plane:
    at most `cap` rows ever reach the driver, regardless of corpus size."""
    h = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    rows = (
        emb.select("vec_id", "embedding")
        .withColumn("h", h)
        .orderBy("h", "vec_id")
        .limit(cap)
        .collect()
    )
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def train_codebooks(emb: DataFrame, m: int = PQ_M, k: int = PQ_K) -> np.ndarray:
    """Train m codebooks of k centroids each on a bounded hash-sample.
    Returns float64 array (m, k, dim//m). Deterministic: hash-ordered init
    over the first k DISTINCT subvectors, fixed Lloyd iterations, empty
    clusters re-seeded from distinct farthest points."""
    x = _hash_sample_rows(emb, PQ_TRAIN_MAX)
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    books = np.empty((m, k, sub), dtype=np.float64)
    for mi in range(m):
        xs = x[:, mi * sub : (mi + 1) * sub]
        # init from the first k DISTINCT subvectors in hash order —
        # duplicate init points would start (and with a shared reseed,
        # stay) coincident, wasting codebook capacity
        _, first_idx = np.unique(xs, axis=0, return_index=True)
        order = np.sort(first_idx)[:k]
        cents = xs[order].copy()
        if len(cents) < k:  # fewer distinct subvectors than centroids:
            # cycle the sample so the codebook is exactly k rows (the
            # duplicates are harmless — every distinct point is covered)
            reps = np.arange(k - len(cents)) % len(xs)
            cents = np.concatenate([cents, xs[reps]])
        for _ in range(PQ_ITERS):
            # (n, k) squared L2 via expansion; argmin ties -> lowest index
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            empties = [ci for ci in range(k) if not (assign == ci).any()]
            for ci in range(k):
                mask = assign == ci
                if mask.any():
                    cents[ci] = xs[mask].mean(axis=0)
            # re-seed each empty cluster with a farthest point DISTINCT BY
            # VALUE (ranking indices alone could hand two empties the same
            # duplicated outlier row), so simultaneous empties never
            # collapse onto one coordinate
            if empties:
                far_order = np.argsort(-d2.min(axis=1))
                uniq_far = []
                seen_rows = set()
                for idx in far_order:
                    key = xs[idx].tobytes()
                    if key not in seen_rows:
                        seen_rows.add(key)
                        uniq_far.append(idx)
                for i, ci in enumerate(empties):
                    cents[ci] = xs[uniq_far[i % len(uniq_far)]]
        books[mi] = cents
    return books


def encode(emb: DataFrame, books: np.ndarray) -> DataFrame:
    """Encode each corpus vector to M uint8 codes (stored as a small int
    array column) plus the reconstructed squared norm (needed for cosine
    ADC). One Arrow-batched pass, no shuffle."""
    spark = emb.sparkSession
    bbooks = spark.sparkContext.broadcast(books)
    m, k, sub = books.shape

    def enc(batches: Iterator) -> Iterator:
        import pandas as pd

        bk = bbooks.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            codes = np.empty((len(x), m), dtype=np.int64)
            sqn = np.zeros(len(x), dtype=np.float64)
            for mi in range(m):
                xs = x[:, mi * sub : (mi + 1) * sub]
                d2 = ((xs[:, None, :] - bk[mi][None, :, :]) ** 2).sum(axis=2)
                codes[:, mi] = d2.argmin(axis=1)
                sqn += (bk[mi][codes[:, mi]] ** 2).sum(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "codes": list(codes),
                    "recon_sqnorm": sqn,
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        enc, "vec_id long, codes array<long>, recon_sqnorm double"
    )


def adc_topk(
    emb: DataFrame,
    codes: DataFrame,
    books: np.ndarray,
    query_ids: list[int],
    k_final: int,
    pool_per_partition: int,
) -> DataFrame:
    """Asymmetric-distance search + exact re-rank.

    1. Collect the query vectors (control-plane: a handful of rows) and
       build per-query M×K dot-product tables against the codebooks.
    2. One mapInPandas pass over the CODES relation scores every corpus
       vector for every query with M table lookups + a sum (never touching
       the float corpus), keeping the per-partition top pool.
    3. The pooled candidates (n_queries × pool × n_partitions rows) join
       back to the float vectors for an exact-cosine re-rank; final top-k
       per query by exact score.
    Returns (q_id, n_id, cosine, rn) — same shape as v1.
    """
    import pandas as pd

    from pyspark.sql.window import Window as W

    spark = emb.sparkSession
    m, k, sub = books.shape
    q_rows = (
        emb.filter(F.col("vec_id").isin(query_ids)).select("vec_id", "embedding").collect()
    )
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_vecs = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    q_norms = np.sqrt((q_vecs**2).sum(axis=1))
    # tables[qi, mi, ki] = dot(query_sub, centroid)
    tables = np.einsum(
        "qms,mks->qmk", q_vecs.reshape(len(q_ids), m, sub), books
    )
    bt = spark.sparkContext.broadcast((q_ids, q_norms, tables))

    def score(batches: Iterator) -> Iterator:
        # accumulate ONE top-pool per query across every Arrow batch of the
        # partition, and yield once at the end — pooling per batch would
        # make candidate volume scale with rows-per-partition/batch-size
        # (corpus-proportional), breaking the documented
        # O(n_queries x pool x n_partitions) shuffle bound
        qids, qnorms, tabs = bt.value
        best_ids = [np.empty(0, dtype=np.int64) for _ in qids]
        best_cos = [np.empty(0, dtype=np.float64) for _ in qids]
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
            n_ids = pdf["vec_id"].to_numpy()
            rnorm = np.sqrt(pdf["recon_sqnorm"].to_numpy())
            for qi in range(len(qids)):
                # approx dot = sum over subspaces of table[m, code_m]
                approx = tabs[qi][np.arange(m)[None, :], c].sum(axis=1)
                approx_cos = approx / np.maximum(qnorms[qi] * rnorm, 1e-300)
                cand_ids = np.concatenate([best_ids[qi], n_ids])
                cand_cos = np.concatenate([best_cos[qi], approx_cos])
                take = min(pool_per_partition, len(cand_ids))
                idx = np.argpartition(-cand_cos, take - 1)[:take]
                best_ids[qi], best_cos[qi] = cand_ids[idx], cand_cos[idx]
        out = [
            pd.DataFrame({"q_id": qids[qi], "n_id": best_ids[qi], "approx": best_cos[qi]})
            for qi in range(len(qids))
            if len(best_ids[qi])
        ]
        if out:
            yield pd.concat(out)

    cands = codes.mapInPandas(score, "q_id long, n_id long, approx double")
    # exact re-rank: join the small candidate pool back to the float vectors
    from tts_etl_pipeline_spark.operators.similarity import dot, norm

    cand_vec = cands.join(
        emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("emb_n")),
        "n_id",
    )
    qdf = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("emb_q")
    )
    scored = (
        cand_vec.join(F.broadcast(qdf), "q_id")
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("cosine", dot("emb_q", "emb_n") / (norm("emb_q") * norm("emb_n")))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), "n_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k_final)
        .select("q_id", "n_id", F.round("cosine", 9).alias("cosine"), "rn")
        .orderBy("q_id", "rn")
    )
