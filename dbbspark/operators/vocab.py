"""Corpus-level vocabulary statistics — the tokenizer-prep analysis pass
(training-pipeline closure, SURVEY.md §2.11). Per-document token stats
live in queries/text.py; this module answers the CORPUS-level questions
a tokenizer/vocab decision needs: the exact token frequency relation,
the Zipf spectrum, and top-k coverage ("what fraction of all token
occurrences would a k-entry vocabulary cover?").

Scale shapes:
- `token_frequencies` is ONE shuffle (explode → groupBy token-hash);
  the token string rides along via `first` so no second join. At 100 TB
  the relation has one row per distinct token — millions, not billions.
- `frequency_spectrum` buckets tokens by floor(log2(count)) — the Zipf
  curve as a ~60-row aggregate, no global sort, no driver data.
- `top_tokens` is TakeOrderedAndProject (no global sort) and
  `coverage_at` derives the coverage fractions from one top-k fetch
  plus one total-sum aggregate: k rows on the driver, documented as the
  small-k path (vocab candidates are ≤ a few hundred thousand).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_col


def token_frequencies(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(token, count, df): corpus-wide occurrence count and document
    frequency per distinct token. One explode + one groupBy."""
    toks = tokens_col(text_col)
    if lowercase:
        toks = F.transform(toks, F.lower)
    # The doc identity must be assigned BEFORE the explode (after it,
    # every mention would get its own id and df would equal count).
    base = docs.select(
        F.monotonically_increasing_id().alias("__doc"), toks.alias("__toks")
    )
    mentions = base.select("__doc", F.explode("__toks").alias("token"))
    return mentions.groupBy("token").agg(
        F.count("*").alias("count"),
        F.count_distinct("__doc").alias("df"),
    )


def frequency_spectrum(freqs: DataFrame) -> DataFrame:
    """(log2_count, n_tokens, total_occurrences): the Zipf spectrum —
    how many distinct tokens fall in each power-of-two count bucket and
    how much corpus mass they carry. ~60 rows, no ordering required."""
    bucket = F.floor(F.log2("count")).cast("long").alias("log2_count")
    return (
        freqs.groupBy(bucket)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("count").alias("total_occurrences"),
        )
    )


def top_tokens(freqs: DataFrame, k: int) -> DataFrame:
    """The k most frequent tokens — TakeOrdered, never a global sort.
    Ties break on the token string so the result is deterministic."""
    return freqs.orderBy(F.desc("count"), "token").limit(k)


def coverage_at(freqs: DataFrame, ks: tuple[int, ...]) -> list[dict]:
    """[{k, coverage}] — the fraction of all token OCCURRENCES covered
    by a top-k vocabulary, for each candidate size. One top-max(ks)
    fetch (driver holds max(ks) counts, the documented small-k path)
    plus one total aggregate."""
    if not ks or any(k <= 0 for k in ks):
        raise ValueError("ks must be positive vocabulary sizes")
    total = freqs.agg(F.sum("count")).first()[0] or 0
    if total == 0:
        return [{"k": k, "coverage": 0.0} for k in sorted(ks)]
    counts = [r["count"] for r in top_tokens(freqs, max(ks)).collect()]
    out = []
    running = 0
    marks = sorted(ks)
    mi = 0
    for i, c in enumerate(counts, start=1):
        running += c
        while mi < len(marks) and i == marks[mi]:
            out.append({"k": marks[mi], "coverage": running / total})
            mi += 1
    # ks beyond the distinct-token count cover everything fetched
    while mi < len(marks):
        out.append({"k": marks[mi], "coverage": running / total})
        mi += 1
    return out


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str | None = None,
    source_col: str | None = None,
) -> dict:
    """The dataset-card summary every corpus release records, as ONE
    aggregation job (driver receives a single row): doc/token/char
    totals, token-length percentiles (approx_percentile sketch), an
    approximate exact-duplicate rate (HLL over sha256 of the text —
    1 - distinct/total), and optional language/source cardinalities.

    Everything is sketch- or sum-shaped, so the job is a single
    map-side-combined aggregate regardless of corpus size; nothing but
    the one result row reaches the driver."""
    toks = F.size(F.split(F.col(text_col), " "))
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum(toks.cast("bigint")).alias("total_tokens"),
        F.sum(F.length(text_col).cast("bigint")).alias("total_chars"),
        F.expr(
            f"approx_percentile(size(split({text_col}, ' ')), array(0.5, 0.95))"
        ).alias("tok_pcts"),
        F.approx_count_distinct(
            F.sha2(F.col(text_col).cast("binary"), 256)
        ).alias("approx_distinct"),
    ]
    if lang_col:
        aggs.append(F.approx_count_distinct(lang_col).alias("n_langs"))
    if source_col:
        aggs.append(F.approx_count_distinct(source_col).alias("n_sources"))
    row = docs.agg(*aggs).first()
    n = row["n_docs"] or 0
    out = {
        "n_docs": n,
        "total_tokens": row["total_tokens"] or 0,
        "total_chars": row["total_chars"] or 0,
        "p50_tokens": row["tok_pcts"][0] if row["tok_pcts"] else None,
        "p95_tokens": row["tok_pcts"][1] if row["tok_pcts"] else None,
        "approx_dup_rate": (
            max(0.0, 1.0 - row["approx_distinct"] / n) if n else 0.0
        ),
    }
    if lang_col:
        out["n_langs"] = row["n_langs"]
    if source_col:
        out["n_sources"] = row["n_sources"]
    return out
