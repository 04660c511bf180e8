"""BPE tokenizer training (operators/bpe.py): the distributed trainer
must reproduce the classic single-machine algorithm exactly — same
merge list, same encodings — and application must be lossless."""

from __future__ import annotations

from collections import Counter

import pytest

from dbbspark.operators.bpe import (
    END_WORD,
    apply_bpe,
    train_bpe,
    word_counts,
)

CORPUS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new newer"),
    (3, "wide wider widest new low"),
    (4, "low low low newer wide"),
]


def _reference_bpe(words: dict[str, int], num_merges: int, min_pair_count: int = 2):
    """Sennrich-style reference trainer: count adjacent pairs weighted by
    word frequency, merge the (count desc, pair asc) argmax."""
    vocab = {tuple(list(w) + [END_WORD]): c for w, c in words.items()}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # (count desc, pair asc) tiebreak, same as the distributed trainer
        top_count = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top_count)
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        a, b = best
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_word_counts(spark, docs):
    wc = {r["word"]: r["count"] for r in word_counts(docs).collect()}
    assert wc["low"] == 7 and wc["newer"] == 3 and wc["widest"] == 1


def test_trainer_matches_reference(spark, docs):
    wc_df = word_counts(docs)
    words = {r["word"]: r["count"] for r in wc_df.collect()}
    for k in (1, 5, 12):
        assert train_bpe(wc_df, k) == _reference_bpe(words, k)


def test_trainer_partition_invariant(spark, docs):
    wc = word_counts(docs)
    a = train_bpe(wc.repartition(7), 8)
    b = train_bpe(wc.coalesce(1), 8)
    assert a == b and len(a) == 8


def test_min_pair_count_stops(spark, docs):
    merges = train_bpe(word_counts(docs), 500, min_pair_count=2)
    # converges long before 500: every remaining pair is a hapax
    assert 0 < len(merges) < 100


def test_apply_bpe_lossless_and_cached(spark, docs):
    merges = train_bpe(word_counts(docs), 10)
    out = apply_bpe(docs, merges).collect()
    assert len(out) == len(CORPUS)
    for r in out:
        rebuilt = "".join(r["bpe_tokens"]).replace(END_WORD, " ").strip()
        assert rebuilt == r["text"]
    # learned subwords actually merged: 'low' (7 occurrences) should be
    # a single token 'low▁' after 10 merges
    row1 = next(r for r in out if r["doc_id"] == 1)
    assert "low" + END_WORD in row1["bpe_tokens"]


def test_apply_bpe_null_text(spark):
    df = spark.createDataFrame([(1, None), (2, "low low")], "doc_id long, text string")
    merges = [("l", "o"), ("lo", "w")]
    rows = {r["doc_id"]: r["bpe_tokens"] for r in apply_bpe(df, merges).collect()}
    assert rows[1] is None
    assert rows[2] == ["low", END_WORD, "low", END_WORD]


def test_cli_curate_with_bpe(spark, sf_dir, tmp_path):
    from dbbspark.cli import main

    out = str(tmp_path / "curated")
    assert main([
        "curate", "--sf-dir", sf_dir, "--out", out, "--bpe-merges", "16",
    ]) == 0
    got = spark.read.parquet(out)
    assert "bpe_tokens" in got.columns
    row = got.where(got.bpe_tokens.isNotNull()).first()
    assert row is not None and len(row["bpe_tokens"]) > 0
