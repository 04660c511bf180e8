"""Vocabulary statistics (operators/vocab.py) vs a Counter oracle."""
from __future__ import annotations

from collections import Counter

import pytest

from dbbspark.operators.vocab import (
    coverage_at,
    frequency_spectrum,
    token_frequencies,
    top_tokens,
)

DOCS = [
    (1, "the cat and the dog"),
    (2, "the cat sat"),
    (3, "a dog barked"),
    (4, "The THE the"),
]


def _oracle():
    counts: Counter = Counter()
    dfs: Counter = Counter()
    for _, text in DOCS:
        toks = [t.lower() for t in text.split(" ")]
        counts.update(toks)
        dfs.update(set(toks))
    return counts, dfs


@pytest.fixture(scope="module")
def freqs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return token_frequencies(df, "text")


def test_counts_and_df_match_oracle(spark, freqs):
    counts, dfs = _oracle()
    got = {r["token"]: (r["count"], r["df"]) for r in freqs.collect()}
    assert got == {t: (c, dfs[t]) for t, c in counts.items()}


def test_spectrum_partitions_all_tokens(spark, freqs):
    counts, _ = _oracle()
    rows = frequency_spectrum(freqs).collect()
    assert sum(r["n_tokens"] for r in rows) == len(counts)
    assert sum(r["total_occurrences"] for r in rows) == sum(counts.values())
    # 'the' has count 6 -> bucket log2=2; singletons -> bucket 0
    by_bucket = {r["log2_count"]: r["n_tokens"] for r in rows}
    assert by_bucket[2] == 1


def test_top_tokens_deterministic_order(spark, freqs):
    top = [r["token"] for r in top_tokens(freqs, 3).collect()]
    counts, _ = _oracle()
    expected = sorted(counts, key=lambda t: (-counts[t], t))[:3]
    assert top == expected


def test_coverage_matches_oracle(spark, freqs):
    counts, _ = _oracle()
    total = sum(counts.values())
    ordered = sorted(counts.values(), reverse=True)
    got = {d["k"]: d["coverage"] for d in coverage_at(freqs, (1, 3, 100))}
    assert got[1] == pytest.approx(ordered[0] / total)
    assert got[3] == pytest.approx(sum(ordered[:3]) / total)
    assert got[100] == pytest.approx(1.0)  # k beyond vocab covers all


def test_coverage_validates_ks(spark, freqs):
    with pytest.raises(ValueError):
        coverage_at(freqs, ())
    with pytest.raises(ValueError):
        coverage_at(freqs, (0,))


def test_corpus_report_single_job(spark):
    from dbbspark.operators.vocab import corpus_report

    docs = [(i, "tok " * (i + 1) + "end", "en", f"s{i % 2}") for i in range(20)]
    docs += [(99, docs[0][1], "en", "s0")]  # one exact duplicate text
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, source string")
    rep = corpus_report(df, lang_col="lang", source_col="source")
    assert rep["n_docs"] == 21
    assert rep["total_chars"] == sum(len(t) for _, t, _, _ in docs)
    assert rep["total_tokens"] == sum(len(t.split(" ")) for _, t, _, _ in docs)
    assert rep["n_langs"] == 1 and rep["n_sources"] == 2
    # 21 docs, 20 distinct texts -> dup rate ~ 1/21 (HLL is near-exact here)
    assert 0.0 < rep["approx_dup_rate"] < 0.15
    assert rep["p50_tokens"] <= rep["p95_tokens"]
