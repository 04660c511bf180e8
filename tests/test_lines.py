"""CCNet-style cross-document line dedup (operators/lines.py).

Oracle: a driver-side Counter over the same normalization — the Spark
path must keep/drop exactly the same lines and reassemble byte-identical
text."""
from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from dbbspark.operators.lines import (
    dedup_lines,
    duplicate_line_hashes,
    line_mentions,
)

BOILER = "Cookie notice: we use cookies"
FOOTER = "(c) 2019 Acme Corp"
FOOTER2 = "(C) 2020  ACME CORP"  # normalizes identically to FOOTER

DOCS = [
    (1, f"{BOILER}\nunique first body line\n\n{FOOTER}"),
    (2, f"{BOILER}\nanother body entirely\n{FOOTER2}"),
    (3, "standalone document\nno shared lines here"),
    (4, f"{BOILER}\n{BOILER}"),  # within-doc repeat, all boilerplate
]


def _norm(line: str) -> str:
    return re.sub(r"\s+", " ", re.sub(r"\d+", "", line.lower())).strip()


def _py_dedup(docs, min_df=2, keep_first=False):
    counts: Counter = Counter()
    mentions = []
    for doc, text in docs:
        for line_no, line in enumerate(text.split("\n")):
            n = _norm(line)
            mentions.append((doc, line_no, line, n))
            if n:
                counts[n] += 1
    seen = set()
    out = {doc: [] for doc, _ in docs}
    for doc, line_no, line, n in sorted(mentions):
        if not n or counts[n] < min_df:
            out[doc].append((line_no, line))
        elif keep_first and n not in seen:
            seen.add(n)
            out[doc].append((line_no, line))
    return {
        doc: "\n".join(line for _, line in sorted(lines))
        for doc, lines in out.items()
    }


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _collect_texts(df):
    return {r["doc_id"]: r["text"] for r in df.collect()}


def test_matches_counter_oracle(spark, docs_df):
    got = _collect_texts(dedup_lines(docs_df, "doc_id", "text"))
    assert got == _py_dedup(DOCS)


def test_keep_first_matches_oracle(spark, docs_df):
    got = _collect_texts(dedup_lines(docs_df, "doc_id", "text", keep_first=True))
    expected = _py_dedup(DOCS, keep_first=True)
    assert got == expected
    # the surviving copy is doc 1's (smallest (doc, line_no))
    assert expected[1].startswith(BOILER)


def test_normalization_collides_year_variants(spark, docs_df):
    # FOOTER vs FOOTER2 differ in case/digits/spacing but normalize
    # identically, so BOTH are removed as a cross-doc duplicate.
    got = _collect_texts(dedup_lines(docs_df, "doc_id", "text"))
    assert FOOTER not in got[1]
    assert FOOTER2 not in got[2]


def test_untouched_doc_is_byte_identical(spark, docs_df):
    got = _collect_texts(dedup_lines(docs_df, "doc_id", "text"))
    assert got[3] == DOCS[2][1]


def test_all_boilerplate_doc_survives_empty(spark, docs_df):
    got = _collect_texts(dedup_lines(docs_df, "doc_id", "text"))
    assert got[4] == ""
    assert set(got) == {1, 2, 3, 4}  # report-don't-drop


def test_blank_lines_exempt(spark, docs_df):
    # doc 1 has a blank line; blank lines repeat corpus-wide by nature
    # but must never be deleted (h is null for them).
    got = _collect_texts(dedup_lines(docs_df, "doc_id", "text"))
    assert got[1] == "unique first body line\n"  # blank line survives
    nulls = (
        line_mentions(docs_df, "doc_id", "text")
        .where(F.col("h").isNull())
        .count()
    )
    assert nulls == 1


def test_duplicate_inventory(spark, docs_df):
    rows = duplicate_line_hashes(docs_df, "doc_id", "text").collect()
    # two duplicated normalized lines: the cookie banner (4 mentions:
    # docs 1,2 + twice in doc 4) and the footer (2 mentions)
    dfs = sorted(r["df"] for r in rows)
    assert dfs == [2, 4]


def test_min_df_below_two_rejected(spark, docs_df):
    with pytest.raises(ValueError):
        dedup_lines(docs_df, "doc_id", "text", min_df=1)
