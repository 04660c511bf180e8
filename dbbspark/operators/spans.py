"""Duplicate n-gram SPAN detection and removal — substring-level exact
dedup (training-pipeline closure, SURVEY.md §2.11).

Document-level dedup (sha/MinHash/Jaccard — operators/dedup.py) leaves a
well-known residue: long passages duplicated ACROSS otherwise-distinct
documents (boilerplate, licenses, quoted articles) and repeated WITHIN a
document. The published remedy is suffix-array substring dedup
("Deduplicating Training Data Makes Language Models Better", Lee et al.
2021); a suffix array is inherently sequential, so the Spark-native
formulation here uses the standard hashed-n-gram approximation:

1. posexplode every doc's token n-grams with their start position →
   (doc, pos, xxhash64(ngram)); the mention stream carries only longs.
2. A count-over-hash window keeps hashes occurring >= min_count times
   in the corpus (within- and cross-document occurrences both count, as
   in the suffix-array formulation). The window form — not
   groupBy(hash).count + join back — because the df relation has one row
   per DISTINCT n-gram (corpus-scale): the join's build side can never
   be broadcast at 100 TB, and even at the 10× scale test AQE already
   broadcast it (3.9 s vs 2.2 s for the single-shuffle window).
3. Surviving (doc, pos) starts merge into maximal spans per document via
   gaps-and-islands: ordered by pos within each doc, a new island opens
   when pos - prev_pos > n (disjoint n-grams); island bounds are
   [min(pos), max(pos) + n).

Two shuffles total (hash groupBy, per-doc window); both partition on
high-cardinality keys, so the plan scales with the corpus, not with a
driver-side structure. Hashing instead of materializing 20-gram strings
makes the widest stream 3 longs/row; a 64-bit collision can only promote
one n-gram to "duplicated" spuriously (~(distinct n-grams)²/2⁶⁵ — the
same accepted approximation as operators/dedup.py's Jaccard hashing).

`remove_duplicate_spans` applies the spans: tokens whose position falls
in any flagged span are dropped (keep_first=True exempts each span
content's first occurrence corpus-wide, the Lee-et-al. policy of keeping
one copy; keep_first=False drops all flagged occurrences)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from .dedup import tokens_col


def _ngram_mentions(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(doc, pos, h): every token n-gram start position with the
    xxhash64 of the n-gram's token-array SLICE. pos is 0-based token
    index.

    r14: the gram is hashed as the sliced token array (xxhash64 hashes
    array elements sequentially) instead of a concat_ws string — tokens
    are space-free, so the equality classes are identical (array
    equality == joined-string equality) and the per-gram string build
    disappears. h is internal only (outputs are span positions);
    interleaved stream A/B 1.13 → 0.90 s at sf0.1, count-multiset
    identity checked (plans/r14/probe_gram_tuplehash.py)."""
    toks = docs.select(F.col(id_col).alias("doc"), tokens_col(text_col).alias("__toks"))
    toks = toks.where(F.size("__toks") >= n)
    n_grams = F.size("__toks") - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.xxhash64(F.slice("__toks", i, n)),
    )
    return toks.select(
        "doc", F.posexplode(grams).alias("pos", "h")
    )  # posexplode is 0-based


def duplicate_ngram_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 20,
    min_count: int = 2,
) -> DataFrame:
    """(doc, span_start, span_end, n_dup_grams) — maximal token spans
    [span_start, span_end) built from n-grams that occur >= min_count
    times corpus-wide. n_dup_grams counts the duplicated n-gram starts
    merged into the span (span_end - span_start - n + 1 when the span is
    gapless)."""
    from ..session import cut_lineage

    # r13: lazy lineage cut — the df aggregation AND the semi-join both
    # consume the mention stream, and without the cut each branch
    # re-runs scan + tokenize + per-gram slice/concat/xxhash64 (the
    # expensive part); the materialized stream is 3 longs/row, far
    # cheaper to re-read than to re-derive at any scale.
    mentions = cut_lineage(_ngram_mentions(docs, id_col, text_col, n))
    # Hub-skew-safe df (same reasoning as lines.dedup_lines): the
    # duplicated n-grams this operator hunts ARE the skewed keys, so
    # frequency comes from a partial-aggregated groupBy and mentions
    # keep themselves via a left-semi join AQE can skew-split — a count
    # window on h would pin every mention of the most-copied passage to
    # one unsplittable task.
    dup_h = (
        mentions.groupBy("h")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_count)
    )
    dup = mentions.join(dup_h.select("h"), "h", "left_semi").select("doc", "pos")
    w = Window.partitionBy("doc").orderBy("pos")
    islands = dup.withColumn(
        "__new",
        F.when(F.col("pos") - F.lag("pos").over(w) > n, 1).otherwise(0),
    ).withColumn("__island", F.sum("__new").over(w))
    return islands.groupBy("doc", "__island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + n).alias("span_end"),
        F.count("*").alias("n_dup_grams"),
    ).drop("__island")


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 20,
    min_count: int = 2,
    keep_first: bool = True,
) -> DataFrame:
    """Documents with flagged duplicate spans CUT OUT of the text.

    Output: (id_col, text_col) with the same schema as the input
    projection — drop-in for the next pipeline stage. keep_first exempts
    the occurrence with the smallest (doc, span_start) per leading-n-gram
    group — the keep-one-copy policy, implemented as a skew-immune
    groupBy-min winner per leading hash joined back against the spans
    (never a window keyed on that hash: the most-copied passage would
    pin its whole group to one task). Spans with
    equal content always share that key; spans that merely share their
    first n tokens do too, so keep-first is exact for identical passages
    and conservative (keeps one) for passages that diverge after the
    first n tokens.

    The cut is positional (token filter against the span array via a
    higher-order `exists`), so documents with no flagged spans pass
    through byte-identical. Span arrays per doc are small (merged,
    maximal), keeping the per-token HOF check cheap."""
    from ..session import cut_lineage

    # r13: same lazy mention-stream cut as duplicate_ngram_spans (df
    # aggregation + semi-join share one derivation)
    mentions = cut_lineage(_ngram_mentions(docs, id_col, text_col, n))
    # hub-skew-safe df: groupBy partial agg + AQE-splittable semi join,
    # never a count window on the deliberately-skewed gram hash (see
    # duplicate_ngram_spans)
    dup_h = (
        mentions.groupBy("h")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_count)
    )
    dup = mentions.join(dup_h.select("h"), "h", "left_semi").select(
        "doc", "pos", "h"
    )
    w = Window.partitionBy("doc").orderBy("pos")
    islands = (
        dup.withColumn(
            "__new",
            F.when(F.col("pos") - F.lag("pos").over(w) > n, 1).otherwise(0),
        )
        .withColumn("__island", F.sum("__new").over(w))
    )
    spans = islands.groupBy("doc", "__island").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + n).alias("e"),
        # the span's identity for keep-first: the hash of its leading
        # duplicated n-gram (deterministic; equal-content spans share it)
        F.min_by("h", "pos").alias("lead_h"),
    )
    if keep_first:
        # keep-first without a lead_h-keyed window (the most-copied
        # passage's spans would all land on one task): the winner per
        # lead_h is a groupBy min — skew-immune — and spans that are not
        # the winner survive the flag via an inequality against it
        winners = spans.groupBy("lead_h").agg(
            F.min(F.struct("doc", "s")).alias("__w")
        )
        spans = spans.join(winners, "lead_h").where(
            (F.col("doc") != F.col("__w.doc")) | (F.col("s") != F.col("__w.s"))
        ).drop("__w")
    per_doc = spans.groupBy("doc").agg(
        F.collect_list(F.struct("s", "e")).alias("__spans")
    )

    toks = docs.select(
        F.col(id_col).alias("doc"), tokens_col(text_col).alias("__toks")
    )
    joined = toks.join(per_doc, "doc", "left")

    def in_span(idx: Column) -> Column:
        return F.exists(
            "__spans", lambda sp: (idx >= sp["s"]) & (idx < sp["e"])
        )

    kept = F.filter(
        F.transform("__toks", lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~in_span(s["i"]),
    )
    cleaned = F.when(
        F.col("__spans").isNull(), F.concat_ws(" ", "__toks")
    ).otherwise(F.concat_ws(" ", F.transform(kept, lambda s: s["t"])))
    return joined.select(
        F.col("doc").alias(id_col), cleaned.alias(text_col)
    )
