"""Unit tests for the shared column builders in dbbspark.functions
(the declared queries exercise them end-to-end against the DuckDB
oracle; these pin semantics on crafted inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbbspark.functions import dup_ratio, ngram_array


def _metrics(spark, text: str) -> dict:
    df = spark.createDataFrame([(text,)], ["text"]).select(
        F.split("text", " ").alias("toks")
    )
    row = df.select(
        dup_ratio("toks").alias("tok"),
        dup_ratio(ngram_array("toks", 2)).alias("g2"),
        dup_ratio(ngram_array("toks", 3)).alias("g3"),
        ngram_array("toks", 3).alias("g3_arr"),
    ).first()
    return row.asDict()


def test_repetition_signals_separate_spam_from_clean(spark):
    spam = _metrics(spark, "buy now " * 20 + "buy now")  # one bigram looped
    clean = _metrics(spark, " ".join(f"w{i}" for i in range(42)))
    assert clean["tok"] == 0.0 and clean["g2"] == 0.0 and clean["g3"] == 0.0
    assert spam["tok"] > 0.9  # 42 tokens, 2 distinct
    assert spam["g2"] > 0.9  # "buy now"/"now buy" dominate
    assert spam["g3"] > 0.9


def test_ngram_array_short_doc_edges(spark):
    # shorter than n -> empty array, never a descending-sequence blowup
    assert _metrics(spark, "one two")["g3_arr"] == []
    assert _metrics(spark, "a")["g3_arr"] == []
    # exactly n tokens -> single n-gram, zero dup ratio
    m = _metrics(spark, "a b c")
    assert m["g3_arr"] == ["a b c"] and m["g3"] == 0.0


def test_char_weighted_repetition_fractions(spark):
    """r10 Gopher char-weighted forms (functions.dup_char_fraction /
    top_run_char_fraction): hand-computed fractions over sorted arrays,
    plus the empty / all-equal / zero-char edges."""
    from dbbspark.functions import dup_char_fraction, top_run_char_fraction

    def frac(values, fn):
        df = spark.createDataFrame([(values,)], "arr array<string>")
        return df.select(
            fn(F.array_sort(F.col("arr"))).alias("f")
        ).first()["f"]

    # lines: "aaaa" twice (4 dup chars), "bb" once -> 4 / (4+4+2)
    assert frac(["aaaa", "bb", "aaaa"], dup_char_fraction) == round(4 / 10, 4)
    # no duplicates -> 0; all-equal -> (k-1)/k of the chars
    assert frac(["x", "yy"], dup_char_fraction) == 0.0
    assert frac(["ccc"] * 4, dup_char_fraction) == round(9 / 12, 4)
    # empty array and zero-length elements -> 0.0, no divide error
    assert frac([], dup_char_fraction) == 0.0
    assert frac(["", ""], dup_char_fraction) == 0.0

    # top run: "ab ab ab" (6 chars) vs "cdcd" (4) -> 6 / 10
    assert frac(["ab", "cdcd", "ab", "ab"], top_run_char_fraction) == round(
        6 / 10, 4
    )
    # a LONG rare gram can beat a frequent short one: count*len decides
    assert frac(
        ["zzzzzzzzzz", "a", "a", "a"], top_run_char_fraction
    ) == round(10 / 13, 4)
    assert frac([], top_run_char_fraction) == 0.0
