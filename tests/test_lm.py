"""N-gram LM training + perplexity filtering (operators/lm.py, SURVEY §2.11).

The oracle is an independent driver-side reimplementation with
collections.Counter over the same corpus — the Spark path must reproduce
its add-k smoothed average NLL exactly (same floats, not approximately:
both sides sum doubles over identical tiny inputs)."""
from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from dbbspark.operators.lm import (
    NgramLM,
    perplexity,
    perplexity_buckets,
    train_ngram_lm,
)

TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "the cat ate the fish",
    "a dog ate a bone",
]
SCORE = [
    (1, "the cat sat on the mat"),   # in-domain: low ppl
    (2, "the dog ate the fish"),     # seen grams, new combination
    (3, "zebra quantum flux gate"),  # wholly out-of-domain: high ppl
    (4, "single"),                   # shorter than bigram width
]


def _py_expected(train, score, n, k, min_count=1):
    """Independent Counter-based reference for add-k n-gram NLL."""
    grams: Counter = Counter()
    ctxs: Counter = Counter()
    vocab = set()
    for text in train:
        toks = text.split(" ")
        vocab.update(toks)
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            c = " ".join(toks[i : i + n - 1])
            grams[g] += 1
            ctxs[c] += 1
    v = len(vocab)
    kept = {g: c for g, c in grams.items() if c >= min_count}
    out = {}
    for doc, text in score:
        toks = text.split(" ")
        pairs = [
            (" ".join(toks[i : i + n]), " ".join(toks[i : i + n - 1]))
            for i in range(len(toks) - n + 1)
        ]
        if not pairs:
            out[doc] = (0, None, None)
            continue
        nll = 0.0
        for g, c in pairs:
            p = (kept.get(g, 0) + k) / (ctxs.get(c, 0) + k * v)
            nll -= math.log(p)
        avg = nll / len(pairs)
        out[doc] = (len(pairs), avg, math.exp(avg))
    return v, out


@pytest.fixture(scope="module")
def corpora(spark):
    train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    score = spark.createDataFrame(SCORE, "doc_id long, text string")
    return train, score


def _collect_scores(df):
    return {
        r["doc"]: (r["n_grams"], r["avg_nll"], r["perplexity"])
        for r in df.collect()
    }


def _assert_scores_close(a, b, rel=1e-9):
    assert set(a) == set(b)
    for doc in a:
        an, anll, appl = a[doc]
        bn, bnll, bppl = b[doc]
        assert an == bn
        if anll is None:
            assert bnll is None and bppl is None
        else:
            assert bnll == pytest.approx(anll, rel=rel)
            assert bppl == pytest.approx(appl, rel=rel)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_perplexity_matches_counter_oracle(spark, corpora, n):
    train, score = corpora
    lm = train_ngram_lm(train, n=n)
    v, expected = _py_expected(TRAIN, SCORE, n=n, k=1.0)
    assert lm.vocab_size == v
    got = _collect_scores(perplexity(score, lm))
    assert set(got) == set(expected)
    for doc, (en, enll, eppl) in expected.items():
        gn, gnll, gppl = got[doc]
        assert gn == en
        if enll is None:
            assert gnll is None and gppl is None
        else:
            assert gnll == pytest.approx(enll, rel=1e-12)
            assert gppl == pytest.approx(eppl, rel=1e-12)


def test_out_of_domain_scores_worse_than_in_domain(spark, corpora):
    train, score = corpora
    lm = train_ngram_lm(train, n=2)
    got = _collect_scores(perplexity(score, lm))
    assert got[1][2] < got[2][2] < got[3][2]


def test_min_count_floor_equals_unseen(spark, corpora):
    """A floored gram must score exactly like a never-seen gram, and the
    context table / V stay exact (the floor is size-only)."""
    train, score = corpora
    lm = train_ngram_lm(train, n=2, min_count=2)
    _, expected = _py_expected(TRAIN, SCORE, n=2, k=1.0, min_count=2)
    got = _collect_scores(perplexity(score, lm))
    for doc, (en, enll, _) in expected.items():
        if enll is not None:
            assert got[doc][1] == pytest.approx(enll, rel=1e-12)
    kept = lm.ngram_counts.count()
    full = train_ngram_lm(train, n=2).ngram_counts.count()
    assert kept < full  # the floor actually dropped hapax grams


def test_broadcast_model_same_result(spark, corpora):
    # Different physical join strategies may feed F.avg in a different
    # order, so compare to tight tolerance rather than bit-exact.
    train, score = corpora
    lm = train_ngram_lm(train, n=2)
    plain = _collect_scores(perplexity(score, lm))
    bcast = _collect_scores(perplexity(score, lm, broadcast_model=True))
    _assert_scores_close(plain, bcast)


def test_scores_partition_invariant(spark, corpora):
    """Same floats regardless of layout — a production threshold survives
    a cluster resize."""
    train, score = corpora
    lm = train_ngram_lm(train, n=2)
    a = _collect_scores(perplexity(score, lm))
    b = _collect_scores(perplexity(score.repartition(7), lm))
    _assert_scores_close(a, b)


def test_buckets_pinned_thresholds(spark, corpora):
    train, score = corpora
    lm = train_ngram_lm(train, n=2)
    scored = perplexity(score, lm)
    vals = sorted(
        v[2] for v in _collect_scores(scored).values() if v[2] is not None
    )
    # perplexity_buckets re-evaluates the lineage; give the pinned cuts
    # a 1e-9 relative margin so an avg-summation ULP wiggle between the
    # two evaluations can't flip a boundary doc.
    lo, hi = vals[0] * (1 + 1e-9), vals[-2] * (1 + 1e-9)
    rows = perplexity_buckets(scored, thresholds=(lo, hi)).collect()
    by_doc = {r["doc"]: r["ppl_bucket"] for r in rows}
    assert by_doc[1] == "head"          # the most fluent doc
    assert by_doc[3] == "tail"          # the out-of-domain doc
    assert by_doc[4] is None            # too short to score ≠ bad


def test_buckets_estimated_thresholds_cover_all_labels(spark):
    # A spread distribution (not the 3-value LM output, where the
    # estimated 2/3-quantile can equal the max and leave no tail).
    rows = [(i, float(i)) for i in range(1, 10)] + [(99, None)]
    scored = spark.createDataFrame(rows, "doc long, perplexity double")
    got = {r["doc"]: r["ppl_bucket"] for r in perplexity_buckets(scored).collect()}
    labels = set(got.values())
    assert "head" in labels and "tail" in labels and None in labels
    assert got[1] == "head" and got[9] == "tail" and got[99] is None


def test_rejects_bad_inputs(spark, corpora):
    train, score = corpora
    with pytest.raises(ValueError):
        train_ngram_lm(train, n=0)
    empty = NgramLM(
        ngram_counts=train.limit(0).select(
            F.lit(0).cast("long").alias("gram_h"), F.lit(0).cast("long").alias("c")
        ),
        context_counts=train.limit(0).select(
            F.lit(0).cast("long").alias("ctx_h"), F.lit(0).cast("long").alias("c_ctx")
        ),
        vocab_size=0,
        n=2,
    )
    with pytest.raises(ValueError):
        perplexity(score, empty)


TARGET_TRAIN = [
    "the committee published the annual report",
    "the annual report described regional planning",
    "regional planning requires careful review",
]
SOURCE_TRAIN = [
    "click here buy now best price",
    "free bonus click here subscribe now",
    "best price free shipping buy now",
]


def test_dsir_weights_separate_domains(spark):
    from dbbspark.operators.lm import dsir_weights

    t_df = spark.createDataFrame([(t,) for t in TARGET_TRAIN], "text string")
    s_df = spark.createDataFrame([(t,) for t in SOURCE_TRAIN], "text string")
    lm_t = train_ngram_lm(t_df, n=2)
    lm_s = train_ngram_lm(s_df, n=2)
    docs = spark.createDataFrame(
        [
            (1, "the committee reviewed the annual report"),
            (2, "click here free bonus best price now"),
            (3, "x"),  # too short for bigrams
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc"]: r["log_ratio"]
        for r in dsir_weights(docs, lm_t, lm_s).collect()
    }
    assert got[1] > 0 > got[2]  # target-like up, source-like down
    assert got[3] is None  # unscorable, reported not dropped


def test_dsir_weights_match_perplexity_identity(spark):
    # log_ratio must equal n_grams * (nll_source - nll_target) exactly
    from dbbspark.operators.lm import dsir_weights

    t_df = spark.createDataFrame([(t,) for t in TARGET_TRAIN], "text string")
    s_df = spark.createDataFrame([(t,) for t in SOURCE_TRAIN], "text string")
    lm_t, lm_s = train_ngram_lm(t_df, n=2), train_ngram_lm(s_df, n=2)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TARGET_TRAIN + SOURCE_TRAIN)],
        "doc_id long, text string",
    )
    w = {r["doc"]: r for r in dsir_weights(docs, lm_t, lm_s).collect()}
    pt = _collect_scores(perplexity(docs, lm_t))
    ps = _collect_scores(perplexity(docs, lm_s))
    for doc, row in w.items():
        expected = row["n_grams"] * (ps[doc][1] - pt[doc][1])
        assert row["log_ratio"] == pytest.approx(expected, rel=1e-12)


def test_dsir_rejects_mismatched_order(spark):
    from dbbspark.operators.lm import dsir_weights

    t_df = spark.createDataFrame([(t,) for t in TARGET_TRAIN], "text string")
    with pytest.raises(ValueError):
        dsir_weights(
            t_df.withColumn("doc_id", F.lit(1)),
            train_ngram_lm(t_df, n=2),
            train_ngram_lm(t_df, n=3),
        )


def test_dsir_sample_deterministic_and_biased(spark):
    from dbbspark.operators.lm import dsir_sample

    rows = [(i, float(i) / 10.0) for i in range(200)] + [(999, None)]
    df = spark.createDataFrame(rows, "doc long, log_ratio double")
    a = {r["doc"] for r in dsir_sample(df, 0.25, seed=3).collect()}
    b = {r["doc"] for r in dsir_sample(df, 0.25, seed=3).collect()}
    assert a == b  # deterministic
    assert 999 not in a  # null ratio dropped
    assert 25 <= len(a) <= 75  # ~25% of 200, quantile tolerance
    # biased: kept set's mean ratio beats the population mean
    kept_mean = sum(i / 10.0 for i in a) / len(a)
    assert kept_mean > sum(i / 10.0 for i in range(200)) / 200
    # colder temperature concentrates harder on high ratios
    cold = {r["doc"] for r in dsir_sample(df, 0.25, temperature=0.1, seed=3).collect()}
    cold_mean = sum(i / 10.0 for i in cold) / len(cold)
    assert cold_mean >= kept_mean


def test_dsir_select_flag_equals_sample_join_back(spark):
    """r13: the projected flag must equal membership in dsir_sample's
    kept set row-for-row (same Gumbel expression, same cut), including
    the NULL-ratio row (flag False, matching the left-join miss) — the
    q_dsir join-back elimination rides on exactly this contract."""
    from dbbspark.operators.lm import dsir_sample, dsir_select_flag

    rows = [(i, float(i) / 10.0) for i in range(200)] + [(999, None)]
    df = spark.createDataFrame(rows, "doc long, log_ratio double")
    cut = 2.0
    kept = {r["doc"] for r in dsir_sample(df, 0.25, seed=3, cut=cut).collect()}
    flagged = df.select(
        "doc", dsir_select_flag("log_ratio", cut=cut, seed=3).alias("sel")
    ).collect()
    assert {r["doc"] for r in flagged if r["sel"]} == kept
    by_doc = {r["doc"]: r["sel"] for r in flagged}
    assert by_doc[999] is False  # NULL ratio flags False, never NULL
    assert all(v is not None for v in by_doc.values())


def test_dsir_weights_broadcast_close_to_plain(spark):
    from dbbspark.operators.lm import dsir_weights

    t_df = spark.createDataFrame([(t,) for t in TARGET_TRAIN], "text string")
    s_df = spark.createDataFrame([(t,) for t in SOURCE_TRAIN], "text string")
    lm_t, lm_s = train_ngram_lm(t_df, n=2), train_ngram_lm(s_df, n=2)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TARGET_TRAIN + SOURCE_TRAIN)],
        "doc_id long, text string",
    )
    plain = {r["doc"]: r["log_ratio"] for r in dsir_weights(docs, lm_t, lm_s).collect()}
    bcast = {
        r["doc"]: r["log_ratio"]
        for r in dsir_weights(docs, lm_t, lm_s, broadcast_model=True).collect()
    }
    assert set(plain) == set(bcast)
    for doc in plain:
        assert bcast[doc] == pytest.approx(plain[doc], rel=1e-9)


def test_train_ngram_lm_pair_matches_composed(spark):
    """train_ngram_lm_pair (r13) ≡ two train_ngram_lm calls: identical
    count relations, vocab sizes, and identical dsir_weights output."""
    from dbbspark.operators.lm import (
        dsir_weights,
        train_ngram_lm,
        train_ngram_lm_pair,
    )

    rows = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the dog sat on the log"),
        (3, "de", "der hund sitzt auf dem baum"),
        (4, "de", "the cat sat on the mat"),
        (5, "en", "x"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    lm_t0 = train_ngram_lm(docs.where(F.col("lang") == "en"), "text", n=2)
    lm_s0 = train_ngram_lm(docs, "text", n=2)
    lm_t1, lm_s1 = train_ngram_lm_pair(docs, F.col("lang") == "en", "text", n=2)
    for a, b in ((lm_t0, lm_t1), (lm_s0, lm_s1)):
        assert a.vocab_size == b.vocab_size
        assert a.n == b.n
        ca = sorted(map(tuple, a.ngram_counts.collect()))
        cb = sorted(map(tuple, b.ngram_counts.collect()))
        assert ca == cb
        xa = sorted(map(tuple, a.context_counts.collect()))
        xb = sorted(map(tuple, b.context_counts.collect()))
        assert xa == xb
    w0 = {
        r["doc"]: (r["n_grams"], r["log_ratio"])
        for r in dsir_weights(docs, lm_t0, lm_s0).collect()
    }
    w1 = {
        r["doc"]: (r["n_grams"], r["log_ratio"])
        for r in dsir_weights(docs, lm_t1, lm_s1).collect()
    }
    assert set(w0) == set(w1)
    for d in w0:
        assert w0[d][0] == w1[d][0]
        if w0[d][1] is None:
            assert w1[d][1] is None
        else:
            assert abs(w0[d][1] - w1[d][1]) < 1e-9


def test_dsir_weights_empty_target_raises_like_perplexity(spark):
    """ADVICE r13 pin: a target model with an empty vocabulary (the
    target condition matched zero docs) raises ValueError from BOTH the
    fused dsir_weights and the perplexity path the composed form
    routes through — the degenerate case is a loud error, not a silent
    frame, in either formulation."""
    from dbbspark.operators.lm import (
        dsir_weights,
        perplexity,
        train_ngram_lm_pair,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "src"), (2, "beta gamma delta", "src")],
        "doc_id long, text string, kind string",
    )
    lm_t, lm_s = train_ngram_lm_pair(
        docs, F.col("kind") == "never-matches", text_col="text", n=2
    )
    assert lm_t.vocab_size == 0 and lm_s.vocab_size > 0
    with pytest.raises(ValueError, match="empty vocabulary"):
        dsir_weights(docs, lm_t, lm_s, id_col="doc_id", text_col="text")
    with pytest.raises(ValueError, match="empty vocabulary"):
        perplexity(docs, lm_t, id_col="doc_id", text_col="text")
