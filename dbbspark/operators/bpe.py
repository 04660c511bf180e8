"""Distributed BPE tokenizer training + application (LLM-pipeline
closure op — the tokenizer-fitting stage between corpus curation and
sequence packing).

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units") trains on the WORD-FREQUENCY table, not
the raw corpus: merge statistics are identical because a word's internal
pairs occur once per word occurrence. That factorization is what makes
the op scale — at 100 TB the corpus has ~10¹¹ tokens but only ~10⁷
distinct words, so:

- `word_counts` is ONE corpus aggregation (explode + groupBy — the only
  pass that ever touches the full corpus);
- each merge round is one pair-count aggregation over the vocab-sized
  symbols table (pairs via zip_with of two array slices — the same
  interpreted-lambda-friendly shape as operators/lm) plus a map applying
  the chosen merge. The driver holds one row per round (the argmax
  pair), never data;
- lineage is cut every few rounds (localCheckpoint) so round N doesn't
  replay rounds 1..N-1 — same device as connected_components.

Application (`apply_bpe`) runs the learned merge ranks greedily per word
inside an Arrow-batched pandas iterator with a per-batch word cache —
tokenizing is Python-bound in every real pipeline; the cache exploits
Zipf (a batch of documents re-uses a small set of words).

Determinism: the merge choice breaks count ties on the pair itself
(lexicographic), so the learned merge list is reproducible across runs,
partitionings, and engines — the property every downstream token count
depends on.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, functions as F

from dbbspark.session import cut_lineage

END_WORD = "▁"  # sentencepiece-style end-of-word marker


def word_counts(
    docs: DataFrame, text_col: str = "text", lowercase: bool = False
) -> DataFrame:
    """(word, count) over whitespace tokens — the one full-corpus pass.
    Map-side partial aggregation applies; the result is vocab-sized."""
    col: Column = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    return (
        docs.select(F.explode(F.split(col, " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _pair_col(syms: Column) -> Column:
    """array<string> of adjacent symbol pairs 'a b' (empty for 1-symbol
    words) — zip_with over two slices, no per-index element_at."""
    n = F.size(syms) - 1
    empty = F.array().cast("array<string>")
    heads = F.when(n >= 1, F.slice(syms, 1, n)).otherwise(empty)
    tails = F.when(n >= 1, F.slice(syms, 2, n)).otherwise(empty)
    return F.zip_with(heads, tails, lambda a, b: F.concat_ws(" ", a, b))


def _merge_expr(syms: Column, a: str, b: str) -> Column:
    """Apply ONE merge (a,b)→ab to a symbol array: left-to-right fold,
    non-overlapping (after merging at i, position i+1 can't also merge
    with the consumed symbol — the standard BPE greedy-scan rule)."""
    la, lb = F.lit(a), F.lit(b)

    def step(acc: Column, s: Column) -> Column:
        merged_tail = (F.element_at(acc, -1) == la) & (s == lb)
        # guard: the just-merged symbol must not re-merge ("aaa" with
        # merge (a,a) → ["aa","a"], not ["aa","aa"]); track via a
        # sentinel-free trick: compare the tail AS WRITTEN — a merge
        # writes "ab" which only equals `a` again if a==ab (impossible:
        # ab is strictly longer).
        return F.when(
            (F.size(acc) > 0) & merged_tail,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(la, lb)),
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def train_bpe(
    words: DataFrame,
    num_merges: int,
    min_pair_count: int = 2,
    word_col: str = "word",
    count_col: str = "count",
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from a (word, count) table.

    Each round: count adjacent symbol pairs weighted by word count (one
    vocab-sized aggregation), take the argmax with a deterministic
    (count desc, pair asc) tiebreak — a single driver row — and apply
    the merge to the symbols table. Stops early when no pair reaches
    ``min_pair_count``. Returns [(left, right), ...] in merge order."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    syms = words.select(
        F.col(count_col).alias("count"),
        F.concat(
            F.split(F.col(word_col), ""),
            F.array(F.lit(END_WORD)),
        ).alias("syms"),
    ).transform(cut_lineage, eager=False)

    merges: list[tuple[str, str]] = []
    for round_no in range(num_merges):
        top = (
            syms.select("count", F.explode(_pair_col(F.col("syms"))).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("count").alias("c"))
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_pair_count:
            break
        a, b = top[0]["pair"].split(" ", 1)
        merges.append((a, b))
        syms = syms.select("count", _merge_expr(F.col("syms"), a, b).alias("syms"))
        if (round_no + 1) % checkpoint_every == 0:
            syms = syms.transform(cut_lineage, eager=False)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-order BPE encode of one word (reference semantics:
    repeatedly merge the best-ranked adjacent pair)."""
    syms = list(word) + [END_WORD]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = False,
) -> DataFrame:
    """Add ``out_col``: array<string> of BPE subword tokens for each
    document. Arrow-batched mapInPandas with a per-batch word→tokens
    cache (Zipf makes the cache hit rate ~1 within a batch); the merge
    ranks ride the closure (list of pairs — broadcast-sized by
    construction, it IS the tokenizer)."""
    import pandas as pd

    from pyspark.sql import types as T

    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = T.StructType(
        docs.schema.fields
        + [T.StructField(out_col, T.ArrayType(T.StringType()), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def encode(text) -> list[str] | None:
            if text is None:
                return None
            if lowercase:
                text = text.lower()
            out: list[str] = []
            for w in text.split(" "):
                if not w:
                    continue
                toks = cache.get(w)
                if toks is None:
                    toks = _encode_word(w, ranks)
                    cache[w] = toks
                out.extend(toks)
            return out

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [encode(t) for t in pdf[text_col]]
            yield pdf

    return docs.mapInPandas(run, schema=out_schema)
