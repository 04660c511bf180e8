"""Duplicate n-gram span detection/removal (operators/spans.py): planted
cross-document passages, within-document repetition, island merging, and
the keep-first removal policy."""

from __future__ import annotations

from dbbspark.operators.spans import duplicate_ngram_spans, remove_duplicate_spans

# distinct vocabularies so no accidental n-gram collisions
PASSAGE = [f"p{i}" for i in range(30)]
PREF_A = [f"a{i}" for i in range(15)]
SUF_A = [f"x{i}" for i in range(10)]
PREF_B = [f"b{i}" for i in range(12)]
SUF_B = [f"y{i}" for i in range(5)]
UNRELATED = [f"u{i}" for i in range(40)]
PHRASE = [f"q{i}" for i in range(10)]
FILLER = [f"f{i}" for i in range(5)]


def _docs(spark):
    rows = [
        (1, " ".join(PREF_A + PASSAGE + SUF_A)),
        (2, " ".join(PREF_B + PASSAGE + SUF_B)),
        (3, " ".join(UNRELATED)),
        (4, " ".join(PHRASE + FILLER + PHRASE)),  # internal repetition
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_cross_document_passage_found_and_merged(spark):
    spans = {
        r["doc"]: (r["span_start"], r["span_end"], r["n_dup_grams"])
        for r in duplicate_ngram_spans(_docs(spark), "doc_id", "text", n=10)
        .where("doc IN (1, 2)")
        .collect()
    }
    # 21 contiguous duplicated 10-gram starts merge into ONE maximal span
    # covering exactly the 30-token passage
    assert spans[1] == (15, 45, 21)
    assert spans[2] == (12, 42, 21)


def test_clean_doc_has_no_spans(spark):
    got = (
        duplicate_ngram_spans(_docs(spark), "doc_id", "text", n=10)
        .where("doc = 3")
        .count()
    )
    assert got == 0


def test_within_document_repetition_two_islands(spark):
    spans = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicate_ngram_spans(_docs(spark), "doc_id", "text", n=10)
        .where("doc = 4")
        .collect()
    )
    # gap of 5 filler tokens > 0 and start distance 15 > n → two islands
    assert spans == [(0, 10), (15, 25)]


def test_remove_keep_first_keeps_one_copy(spark):
    cleaned = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(
            _docs(spark), "doc_id", "text", n=10, keep_first=True
        ).collect()
    }
    # doc 1 wins (smallest (doc, start) for the passage's lead n-gram)
    assert cleaned[1] == " ".join(PREF_A + PASSAGE + SUF_A)
    assert cleaned[2] == " ".join(PREF_B + SUF_B)
    # untouched doc passes through byte-identical
    assert cleaned[3] == " ".join(UNRELATED)
    # within-doc: first phrase occurrence kept, second removed
    assert cleaned[4] == " ".join(PHRASE + FILLER)


def test_remove_drop_all(spark):
    cleaned = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(
            _docs(spark), "doc_id", "text", n=10, keep_first=False
        ).collect()
    }
    assert cleaned[1] == " ".join(PREF_A + SUF_A)
    assert cleaned[2] == " ".join(PREF_B + SUF_B)
    assert cleaned[4] == " ".join(FILLER)
