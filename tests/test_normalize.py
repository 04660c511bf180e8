"""Text normalization (operators/normalize.py) — driver-side expected
strings, plus the no-Python plan guarantee."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbbspark.operators.normalize import (
    collapse_whitespace,
    fix_mojibake,
    fold_punctuation,
    normalize_docs,
    normalize_text,
    strip_control,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("out")).collect()[0]["out"]


def test_strip_control(spark):
    assert (
        _one(spark, "a\x00b\x08c\td\ne\x7f", strip_control(F.col("text")))
        == "abc\td\ne"
    )


def test_fold_punctuation(spark):
    assert (
        _one(spark, "‘q’ “w” – — … x", fold_punctuation(F.col("text")))
        == "'q' \"w\" - - ... x"
    )


def test_fix_mojibake(spark):
    # real mojibake: '“' and '”' mis-decoded as cp1252 produce
    # "â€œ" and "â€\x9d" (the third byte of '”' is the invisible U+009D)
    raw = "donâ€™t say â€œcafÃ©â€\x9d"
    assert _one(spark, raw, fix_mojibake(F.col("text"))) == 'don\'t say "café"'


def test_mojibake_is_decode_roundtrip(spark):
    # The table must agree with the actual cp1252 mis-decode of UTF-8.
    # ('”' is excluded: its 0x9D byte is undefined in cp1252, so the
    # mangled form carries a raw control char — covered above.)
    from dbbspark.operators.normalize import _PUNCT_FOLD

    for clean in ["don’t", "‘q’ “w", "café", "señora", "a–b—c", "x…"]:
        raw = clean.encode("utf-8").decode("cp1252")
        got = _one(spark, raw, fix_mojibake(F.col("text")))
        expected = clean
        for s, d in _PUNCT_FOLD:
            expected = expected.replace(s, d)
        assert got == expected, (clean, raw)


def test_collapse_whitespace(spark):
    got = _one(
        spark, "  a\t\tb  \n   c\n\n\n\n\nd  ", collapse_whitespace(F.col("text"))
    )
    assert got == "a b\nc\n\nd"


def test_composition_order(spark):
    # mojibake first: its sequences contain C1 chars the control strip
    # would otherwise strip, leaving them unrepairable.
    raw = "donâ€™t\x00  stop\n\n\n\nnow …"
    got = _one(spark, raw, normalize_text(F.col("text")))
    assert got == "don't stop\n\nnow ..."


def test_lowercase_opt_in(spark):
    assert _one(spark, "MiXeD", normalize_text(F.col("text"), lowercase=True)) == "mixed"
    assert _one(spark, "MiXeD", normalize_text(F.col("text"))) == "MiXeD"


def test_normalize_docs_no_python_in_plan(spark):
    df = spark.createDataFrame([(1, "a  b"), (2, "c’d")], "doc_id long, text string")
    out = normalize_docs(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # pure JVM expressions, fuses into the scan
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got == {1: "a b", 2: "c'd"}
