"""Cross-document LINE-level dedup — boilerplate removal (training-
pipeline closure, SURVEY.md §2.11).

Document-level dedup (operators/dedup.py) and span dedup (operators/
spans.py) bracket a third published formulation: CCNet-style *line*
dedup ("CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data", Wenzek et al. 2020), where the unit of duplication is the
newline-delimited line. Web corpora are dominated by boilerplate that
repeats verbatim across pages — navigation, cookie banners, footers —
and those lines are exactly the ones whose corpus-wide document
frequency explodes. Dropping every line whose normalized hash occurs
>= min_df times removes the boilerplate while leaving body text (which
rarely repeats at line granularity) untouched.

Spark-native formulation, two shuffles total:

1. posexplode the lines of every doc → (doc, line_no, line); hash a
   *normalized* form (lowercase, digits stripped, whitespace collapsed —
   the CCNet normalization, so "© 2019 Acme" and "© 2020 ACME" collide)
   with xxhash64, so the corpus-wide frequency relation moves longs.
2. A count-over-hash window tags each mention with its corpus df —
   window, not groupBy+join-back, for the same reason as spans.py: the
   df relation has one row per distinct line (corpus-scale) and can
   never be broadcast at 100 TB.
3. Surviving lines reassemble per doc with sort_array over
   (line_no, line) structs — order is restored exactly, and the
   reassembly groupBy(doc) is the second shuffle.

Blank/whitespace-only lines are exempt (always kept): their hash would
collide corpus-wide and deleting them would silently reflow every
document. keep_first=True keeps the single occurrence with the smallest
(doc, line_no) per hash — the keep-one-copy policy — instead of
deleting all occurrences.

A 64-bit hash collision can only delete one innocent line per colliding
pair (~(distinct lines)²/2⁶⁵), the same accepted approximation as the
other hashed-dedup operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def normalized_line_col(line: Column) -> Column:
    """CCNet line normalization for *hashing only* (the emitted text
    keeps the original bytes): lowercase, strip digits, collapse
    whitespace runs, trim."""
    norm = F.lower(line)
    norm = F.regexp_replace(norm, r"\d+", "")
    norm = F.regexp_replace(norm, r"\s+", " ")
    return F.trim(norm)


def line_mentions(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, line_no, line, h): every line of every document with the
    xxhash64 of its normalized form. line_no is 0-based; h is null for
    blank/whitespace-only lines (exempt from dedup)."""
    lines = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    )
    norm = normalized_line_col(F.col("line"))
    return lines.withColumn(
        "h", F.when(norm != "", F.xxhash64(norm))
    )


def duplicate_line_hashes(
    docs: DataFrame, id_col: str, text_col: str, min_df: int = 2
) -> DataFrame:
    """(h, df) for normalized lines occurring >= min_df times corpus-wide
    — the boilerplate inventory, useful on its own as a report."""
    mentions = line_mentions(docs, id_col, text_col).where(F.col("h").isNotNull())
    return (
        mentions.groupBy("h")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
    )


def dedup_lines(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """Documents with corpus-duplicated lines removed; schema
    (id_col, text_col), a drop-in for the next pipeline stage.

    A line is removed when its normalized hash occurs >= min_df times
    across the corpus (within-doc repeats count, as in CCNet). With
    keep_first the occurrence with the smallest (doc, line_no) survives.
    Documents whose every line is boilerplate come back with empty text
    — report-don't-drop; a downstream length filter decides their fate.
    """
    if min_df < 2:
        raise ValueError("min_df must be >= 2 (1 would delete every line)")
    mentions = line_mentions(docs, id_col, text_col)
    # Blank-line skew guard: h is NULL for every blank/whitespace line,
    # and a window partitioned on h alone shuffles ALL of them — a
    # double-digit percentage of a web corpus's lines — into ONE task
    # (the F.when guards only the output, not the shuffle). A per-row
    # salt on the null stratum spreads them; real hashes keep salt 0, so
    # their frequency partitions are untouched and blanks never
    # contaminate a real line's df.
    salt = F.when(
        F.col("h").isNull(), F.xxhash64(F.col("doc"), F.col("line_no"))
    ).otherwise(F.lit(0))
    mentions = mentions.withColumn("__salt", salt)
    cw = Window.partitionBy("h", "__salt")
    tagged = mentions.withColumn(
        "df", F.when(F.col("h").isNotNull(), F.count("*").over(cw))
    )
    keep = F.col("h").isNull() | (F.col("df") < min_df)
    if keep_first:
        ow = Window.partitionBy("h", "__salt").orderBy("doc", "line_no")
        tagged = tagged.withColumn("rk", F.row_number().over(ow))
        keep = keep | (F.col("rk") == 1)
    survivors = tagged.where(keep)
    reassembled = survivors.groupBy("doc").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s["line"],
            ),
        ).alias(text_col)
    )
    # Docs that lost every line still come back (empty text): right-join
    # the id spine so the operator never silently drops documents.
    spine = docs.select(F.col(id_col).alias("doc"))
    return (
        spine.join(reassembled, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        )
    )
