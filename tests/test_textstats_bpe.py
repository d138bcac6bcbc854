"""t17 BPE merge training: exactness vs an independent naive reference,
determinism, tie-break totality, and the bounded-collect cap."""

from __future__ import annotations

import collections

from tts_etl_pipeline_spark.operators.textstats import (
    BPE_N_MERGES,
    bpe_train_from_histogram,
    t17_bpe_merge_training,
)


def _naive_reference(words, n_merges):
    """Deliberately different implementation: re-tokenize every word from
    scratch each round with str.split on the merged pair."""
    vocab = dict(words)
    merges = []
    segs = {w: list(w) for w in vocab}
    for mi in range(n_merges):
        counts = collections.Counter()
        for w, c in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += c
        if not counts:
            break
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (l, r), cnt = best
        if cnt < 2:
            break
        for w in segs:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
        merges.append((mi + 1, l, r, cnt))
    return merges


def test_bpe_matches_independent_reference():
    words = [
        ("lowering", 5), ("lower", 7), ("newest", 6), ("widest", 3),
        ("low", 9), ("new", 4), ("wide", 2), ("estimate", 1),
    ]
    got = bpe_train_from_histogram(words, 8)
    ref = _naive_reference(words, 8)
    assert got == ref
    assert len(got) == 8  # enough mass for all 8 merges on this corpus


def test_bpe_deterministic_and_tie_break_lexicographic():
    # two pairs with identical counts: ('a','b') and ('c','d') both x4 —
    # the lexicographically smaller pair must win round 1
    words = [("ab", 4), ("cd", 4)]
    got = bpe_train_from_histogram(words, 1)
    assert got == [(1, "a", "b", 4)]
    # stops when no pair repeats
    assert bpe_train_from_histogram([("xy", 1)], 3) == []


def test_t17_query_runs_and_is_deterministic(spark, sf_dir):
    a = [tuple(r) for r in t17_bpe_merge_training(spark, sf_dir).collect()]
    b = [tuple(r) for r in t17_bpe_merge_training(spark, sf_dir).collect()]
    assert a == b and len(a) >= 1
    # merge indices are dense from 1 and counts are non-negative
    assert [r[0] for r in a] == list(range(1, len(a) + 1))
    assert all(r[3] >= 2 for r in a)
    # driver-side training agrees with the reference run on the same
    # histogram pulled through the SAME bounded top-N path
    from pyspark.sql import functions as F
    from tts_etl_pipeline_spark.operators.textstats import token_stream
    from tts_etl_pipeline_spark.sources.tables import table

    hist = (
        token_stream(table(spark, sf_dir, "documents"))
        .groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .orderBy(F.desc("c"), "token").limit(50_000).collect()
    )
    ref = _naive_reference([(r["token"], r["c"]) for r in hist], BPE_N_MERGES)
    assert [tuple(r) for r in a] == ref


# --------------------------------------------------------------------------
# t19 encode
# --------------------------------------------------------------------------
def _naive_encode(word, merges):
    """Independent re-implementation: tokenize by repeatedly applying each
    merge via string join/split round-trips instead of index walking."""
    SEP = "\x00"
    s = SEP.join(list(word))
    for l, r in merges:
        s = s.replace(l + SEP + r, l + r)
    return s.split(SEP) if s else []


def test_bpe_encode_word_matches_independent_reference():
    from tts_etl_pipeline_spark.operators.textstats import (
        bpe_encode_word,
        bpe_train_from_histogram,
    )

    words = [
        ("the", 120), ("then", 40), ("there", 25), ("data", 80),
        ("database", 30), ("quick", 12), ("query", 44), ("queue", 9),
    ]
    merges = [(l, r) for _, l, r, _ in bpe_train_from_histogram(words, 8)]
    assert merges  # training found merges on this corpus
    for w, _ in words + [("unseen", 0), ("x", 0), ("", 0)]:
        got = bpe_encode_word(w, merges)
        assert got == _naive_encode(w, merges), (w, got)
        assert "".join(got) == w  # encoding is lossless

def test_t19_counts_consistent_with_driver_side_encode(spark, sf_dir):
    from pyspark.sql import functions as F

    from tts_etl_pipeline_spark.operators.textstats import (
        BPE_N_MERGES,
        bpe_encode_word,
        bpe_train_from_histogram,
        t19_bpe_encode,
        token_stream,
    )
    from tts_etl_pipeline_spark.sources.tables import table

    got = {r["lang"]: r for r in t19_bpe_encode(spark, sf_dir).collect()}
    # driver-side recompute from the full token histogram (independent path:
    # histogram counts, not per-document iteration)
    docs = table(spark, sf_dir, "documents")
    hist = (
        token_stream(docs).groupBy("token").count().collect()
    )
    merges = [
        (l, r)
        for _, l, r, _ in bpe_train_from_histogram(
            sorted(
                ((r["token"], r["count"]) for r in hist),
                key=lambda kv: (-kv[1], kv[0]),
            ),
            BPE_N_MERGES,
        )
    ]
    per_tok = {t: len(bpe_encode_word(t, merges)) for t, _ in
               ((r["token"], r["count"]) for r in hist)}
    expect = {}
    for r in (
        docs.select("lang", F.explode(F.split(F.lower(F.trim("text")), " ")).alias("token"))
        .groupBy("lang", "token").count().collect()
    ):
        e = expect.setdefault(r["lang"], [0, 0])
        e[0] += r["count"]
        e[1] += per_tok[r["token"]] * r["count"]
    assert set(got) == set(expect)
    for lang, (nw, nt) in expect.items():
        assert got[lang]["n_words"] == nw, lang
        assert got[lang]["n_bpe_tokens"] == nt, lang
