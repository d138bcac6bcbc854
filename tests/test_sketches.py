"""Sketch operators: error bounds vs exact twins, merge associativity."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import record_floor

from pyspark.sql import functions as F

from tts_etl_pipeline_spark.functions.cms import CountMinSketch
from tts_etl_pipeline_spark.operators.sketches import (
    build_token_cms,
    x1_approx_distinct_stats,
    x2_cms_heavy_hitters,
)
from tts_etl_pipeline_spark.sources.tables import table


def test_cms_never_underestimates_and_bounds_overestimate():
    rng = np.random.default_rng(7)
    items = [f"tok{i}" for i in rng.integers(0, 200, size=5000)]
    sk = CountMinSketch(eps=0.01, delta=0.01)
    truth: dict[str, int] = {}
    for it in items:
        sk.add(it)
        truth[it] = truth.get(it, 0) + 1
    n = len(items)
    for it, cnt in truth.items():
        est = sk.estimate(it)
        assert est >= cnt  # CMS never underestimates
        assert est <= cnt + 0.01 * n + 1  # eps*N bound (whp)


def test_cms_merge_equals_single_build():
    a, b, whole = CountMinSketch(), CountMinSketch(), CountMinSketch()
    for i in range(100):
        a.add(f"x{i % 7}")
        whole.add(f"x{i % 7}")
    for i in range(50):
        b.add(f"y{i % 3}")
        whole.add(f"y{i % 3}")
    a_before, b_before = a.table.copy(), b.table.copy()
    merged = a.merge(b)
    assert np.array_equal(merged.table, whole.table)
    # merge must not mutate its inputs (callers may keep probing them)
    assert np.array_equal(a.table, a_before)
    assert np.array_equal(b.table, b_before)


def test_cms_heavy_hitters_match_exact_topk(spark, sf_dir):
    from tts_etl_pipeline_spark.operators.textstats import t2_top_tokens

    approx = {r["token"]: r["est_freq"] for r in x2_cms_heavy_hitters(spark, sf_dir).collect()}
    exact = {r["token"]: r["freq"] for r in t2_top_tokens(spark, sf_dir).collect()}
    # with eps=0.001 and this vocab the sketch is effectively exact:
    # same top-20 membership, estimates >= truth within eps*N
    n_tokens = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.trim("text")), " ")))
        .count()
    )
    assert set(approx) == set(exact)
    record_floor(
        "x2_cms_heavy_hitters",
        "max_overcount_of_epsN_bound",
        max(approx[t] - f for t, f in exact.items()) / (0.001 * n_tokens + 1),
        1.0,
    )
    for tok, freq in exact.items():
        assert freq <= approx[tok] <= freq + 0.001 * n_tokens + 1


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = {r["o_orderpriority"]: r for r in x1_approx_distinct_stats(spark, sf_dir).collect()}
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    exact_pcts = {
        r["o_orderpriority"]: (r["p50"], r["p90"])
        for r in table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        )
        .collect()
    }
    record_floor(
        "x1_approx_distinct_stats",
        "max_rel_err_distinct",
        max(
            abs(rows[p]["approx_customers"] - n) / n for p, n in exact.items()
        ),
        0.1,
    )
    record_floor(
        "x1_approx_distinct_stats",
        "max_rel_err_p50_p90",
        max(
            abs(rows[p][f"approx_{c}"] - exact_pcts[p][i]) / exact_pcts[p][i]
            for p in exact
            for i, c in ((0, "p50"), (1, "p90"))
        ),
        0.05,
    )
    for prio, true_n in exact.items():
        approx_n = rows[prio]["approx_customers"]
        assert approx_n == pytest.approx(true_n, rel=0.1)
        p50, p90 = rows[prio]["approx_p50"], rows[prio]["approx_p90"]
        assert 0 < p50 < p90
        # x1 output must stay scalar-typed (the driver canonicalizer cannot
        # hash array cells) and within tolerance of the exact percentiles
        assert isinstance(p50, float) and isinstance(p90, float)
        assert p50 == pytest.approx(exact_pcts[prio][0], rel=0.05)
        assert p90 == pytest.approx(exact_pcts[prio][1], rel=0.05)


def test_bloom_no_false_negatives_and_bounded_fpp():
    from tts_etl_pipeline_spark.functions.bloom import BloomFilter

    bf = BloomFilter(n_items=2000, fpp=0.01)
    members = [f"fp{i}" for i in range(2000)]
    for m in members:
        bf.add(m)
    # Bloom invariant: zero false negatives, ever
    assert all(bf.might_contain(m) for m in members)
    # false-positive rate near the design point (generous 3x headroom)
    fps = sum(bf.might_contain(f"absent{i}") for i in range(10_000))
    assert fps / 10_000 < 0.03


def test_bloom_merge_equals_single_build_and_roundtrip():
    from tts_etl_pipeline_spark.functions.bloom import BloomFilter

    a, b, whole = BloomFilter(), BloomFilter(), BloomFilter()
    for i in range(500):
        a.add(f"x{i}")
        whole.add(f"x{i}")
    for i in range(500):
        b.add(f"y{i}")
        whole.add(f"y{i}")
    merged = a.merge(b)
    assert (merged.bits == whole.bits).all()
    rt = BloomFilter.from_bytes(merged.to_bytes())
    assert (rt.bits == merged.bits).all()
    with pytest.raises(ValueError):
        a.merge(BloomFilter(n_items=10))


def test_d10_matches_plain_antijoin(spark, sf_dir):
    """The bloom routing must be invisible in the results: identical rows to
    a direct left_anti join of batch fingerprints against the corpus."""
    from pyspark.sql import functions as F  # noqa: F811

    from tts_etl_pipeline_spark.operators.dedup import d10_incremental_dedup
    from tts_etl_pipeline_spark.sources.tables import table as _table

    docs = _table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim("text")))
    corpus = docs.filter(F.col("doc_id") % 5 != 0).select(fp.alias("fp"))
    batch = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", "lang", "n_chars", fp.alias("fp")
    )
    plain = batch.join(corpus, "fp", "left_anti").select("doc_id", "lang", "n_chars")
    expected = sorted(map(tuple, plain.collect()))
    got = sorted(map(tuple, d10_incremental_dedup(spark, sf_dir).collect()))
    assert got == expected and len(got) > 0


def test_bloom_sized_from_count_keeps_fpr_at_10x_default_load():
    """d10 sizes the filter from a corpus count() instead of a fixed
    n_items: at 10x an undersized design load the fixed filter saturates
    (FPR explodes), while count-based sizing holds the design FPR. The
    magnitudes are scaled down 50x so the test runs in milliseconds — the
    ratio (items = 10 x n_items vs items = n_items) is what matters."""
    from tts_etl_pipeline_spark.functions.bloom import BloomFilter

    items = [f"fp{i}" for i in range(20_000)]
    undersized = BloomFilter(n_items=2_000, fpp=0.01)  # fixed sizing, 10x load
    sized = BloomFilter(n_items=20_000, fpp=0.01)  # sized from count
    for it in items:
        undersized.add(it)
        sized.add(it)
    probes = [f"absent{i}" for i in range(10_000)]
    fpr_under = sum(undersized.might_contain(p) for p in probes) / len(probes)
    fpr_sized = sum(sized.might_contain(p) for p in probes) / len(probes)
    assert fpr_under > 0.20  # saturated: the silent failure mode d10 avoids
    assert fpr_sized < 0.05  # the verdict's bound for count-based sizing


# --------------------------------------------------------------------------
# t-digest (functions/tdigest.py, x4)
# --------------------------------------------------------------------------
def test_tdigest_quantiles_close_on_known_distribution():
    from tts_etl_pipeline_spark.functions.tdigest import TDigest

    rng = np.random.default_rng(11)
    vals = rng.uniform(0.0, 1000.0, size=50_000)
    d = TDigest(100.0)
    for chunk in np.array_split(vals, 23):
        d.add_batch(chunk)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        exact = float(np.quantile(vals, q))
        assert abs(d.quantile(q) - exact) <= 0.01 * 1000.0, (q, d.quantile(q), exact)
    # tails are the digest's strength: near-exact extremes
    assert abs(d.quantile(0.999) - float(np.quantile(vals, 0.999))) <= 2.0


def test_tdigest_merge_matches_single_build_and_is_fixed_size():
    from tts_etl_pipeline_spark.functions.tdigest import TDigest

    rng = np.random.default_rng(5)
    vals = rng.lognormal(3.0, 1.0, size=40_000)
    whole = TDigest(100.0)
    whole.add_batch(vals)
    parts = [TDigest(100.0) for _ in range(16)]
    for i, chunk in enumerate(np.array_split(vals, 16)):
        parts[i].add_batch(chunk)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert abs(merged.n - 40_000) < 1e-6
    # fixed size: centroid count bounded by ~2*compression however built
    assert merged.means.size <= 220 and whole.means.size <= 220
    for q in (0.1, 0.5, 0.9):
        exact = float(np.quantile(vals, q))
        tol = 0.02 * exact  # 2% relative on a heavy-tailed distribution
        assert abs(merged.quantile(q) - exact) <= tol
        assert abs(whole.quantile(q) - exact) <= tol
    # serialization round-trip preserves the estimator exactly
    back = TDigest.from_bytes(merged.to_bytes())
    assert back.quantile(0.5) == merged.quantile(0.5)


def test_x4_tdigest_matches_exact_percentiles(spark, sf_dir):
    """t-digest's guarantee is in RANK space (|q_est − q| small), not value
    space — on a sparse group a tiny rank slip can be a visible value gap,
    so the assertion checks the rank of each estimate within its group."""
    from tts_etl_pipeline_spark.operators.sketches import x4_tdigest_quantiles

    got = {r["o_orderpriority"]: r for r in x4_tdigest_quantiles(spark, sf_dir).collect()}
    groups: dict[str, np.ndarray] = {
        r["o_orderpriority"]: np.array(r["vals"])
        for r in table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.collect_list("o_totalprice").alias("vals"))
        .collect()
    }
    assert set(got) == set(groups)
    worst = 0.0
    for prio, row in got.items():
        vals = np.sort(groups[prio])
        assert row["n"] == vals.size  # weights sum exactly — counts are exact
        for est_col, q in (("est_p10", 0.10), ("est_p50", 0.50), ("est_p90", 0.90)):
            q_est = np.searchsorted(vals, row[est_col]) / vals.size
            worst = max(worst, abs(q_est - q))
            assert abs(q_est - q) <= 0.03, (prio, est_col, q_est, q)
    record_floor("x4_tdigest_quantiles", "max_rank_err", worst, 0.03)


def test_x7_mg_candidates_survive_adversarial_churn(spark, tmp_path):
    """x7's guarantee, stress-tested: a filler vocabulary far larger than
    the MG counter budget churns the summaries (constant decrements), yet
    the true heavy hitter must survive candidate generation and the exact
    recount must equal a plain groupBy — on a corpus engineered so any
    'keep the current top-k' heuristic without decrements would evict it."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    # 600 x 'hot' interleaved through 3000 distinct fillers: n=3600,
    # threshold n/200 = 18 -> only 'hot' qualifies
    words = []
    for i in range(3000):
        words.append(f"filler{i:04d}")
        if i % 5 == 0:
            words.append("hot")
    # pack into documents rows (24 tokens per doc) with the fixture schema
    docs = [
        (i, " ".join(words[i * 24 : (i + 1) * 24]))
        for i in range((len(words) + 23) // 24)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    got = {
        r["tok"]: r["n_tok"]
        for r in e.queries()["x7_heavy_hitter_tokens"](spark, sf_dir).collect()
    }
    # exact reference
    toks = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.explode(F.split(F.lower(F.trim(F.coalesce("text", F.lit("")))), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    n = toks.count()
    exact = {
        r["tok"]: r["cnt"]
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")).collect()
        if r["cnt"] * 200 > n
    }
    assert exact  # the fixture really has a heavy hitter
    assert got == exact


def test_x8_exact_branch_on_small_cohorts(spark, tmp_path):
    """Under-filled sketches (< k distinct users per cohort) must collapse to
    EXACT set algebra: est_* equal true distinct counts and est_jaccard the
    true Jaccard. Users 1-10 click, 6-15 purchase -> |A|=10, |B|=10,
    |A∪B|=15, |A∩B|=5."""
    from tts_etl_pipeline_spark.operators.sketches import x8_kmv_set_ops

    rows = []
    eid = 0
    for u in range(1, 11):
        for _ in range(3):  # repeated events must not inflate DISTINCT users
            rows.append((eid, "2024-01-01 10:00:00", u, "click", 1.0, "{}"))
            eid += 1
    for u in range(6, 16):
        rows.append((eid, "2024-01-02 10:00:00", u, "purchase", 1.0, "{}"))
        eid += 1
    rows.append((eid, "2024-01-03 10:00:00", 99, "view", 1.0, "{}"))  # ignored
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props"
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = x8_kmv_set_ops(spark, str(tmp_path)).collect()[0]
    assert (r["ka_filled"], r["kb_filled"], r["ku_filled"]) == (10, 10, 15)
    assert r["n_common"] == 5
    assert (r["est_click_users"], r["est_purchase_users"]) == (10.0, 10.0)
    assert r["est_union_users"] == 15.0
    assert r["est_jaccard"] == 5.0 / 15.0
    assert r["est_common_users"] == (5.0 / 15.0) * 15.0


def test_x8_merge_equals_bruteforce_union_sketch(spark, sf_dir):
    """The query's union sketch is built by merging the two k-row cohort
    sketches; rebuild it brute-force from the full hashed union and compare
    — the KMV merge property, checked at the fixture where sketches
    actually saturate (k_filled == k) or not, whichever the SF gives."""
    from tts_etl_pipeline_spark.operators.sketches import KMV_K, x8_kmv_set_ops
    from tts_etl_pipeline_spark.sources.tables import table
    from pyspark.sql import functions as F

    r = x8_kmv_set_ops(spark, sf_dir).collect()[0]
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    brute = [
        row["h"]
        for row in ev.select(h.alias("h"))
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
        .collect()
    ]
    assert r["ku_filled"] == len(brute)
    expect_est = (
        float(len(brute))
        if len(brute) < KMV_K
        else float(KMV_K - 1) * float(1 << 60) / float(max(brute))
    )
    assert r["est_union_users"] == expect_est


def test_x9_hll_estimates_within_bound_and_union_consistent(spark, sf_dir):
    """Native HLL estimates: each per-type estimate within 5% of the exact
    distinct-user count (default lgK=12 -> RSE ~1.6%, 3 sigma < 5%), and
    the ALL row (hll_union_agg of the per-type sketches) within 5% of the
    exact global distinct — the union-mergeability check."""
    from tts_etl_pipeline_spark.operators.sketches import x9_hll_native_sketch

    est = {
        r["event_type"]: r["est_users"]
        for r in x9_hll_native_sketch(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert set(est) == set(exact)
    record_floor(
        "x9_hll_native_sketch",
        "max_err_of_bound",  # err / max(1, 0.05*e): same shape the assert uses
        max(abs(est[k] - e) / max(1, 0.05 * e) for k, e in exact.items()),
        1.0,
    )
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(1, 0.05 * e), (k, est[k], e)
