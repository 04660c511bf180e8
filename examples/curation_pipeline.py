"""End-to-end training-data curation on the fixture corpus — the
operator chain a 100 TB pipeline runs, composed from dbbspark parts
(each stage is lazy; Catalyst sees the whole chain):

    normalize → exact dedup → near-dedup (Jaccard + CC, keep component
    representative) → duplicate-span removal → cross-doc line dedup →
    quality gate (heuristic + trained classifier) → DSIR importance
    selection → leakage-safe split → sequence packing

Run: python examples/curation_pipeline.py [sf_dir]
Prints one JSON line per stage: {"stage": ..., "docs": ...}.

This is the narrative version of the declared capstone
(`q_training_pipeline`, queries/text.py) — that one is oracle-checked
end-to-end; this one shows the full menu, including the stages whose
operators are pytest-verified rather than SQL-expressible."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from dbbspark.operators.classify import (
    quality_filter,
    score_quality,
    train_quality_classifier,
)
from dbbspark.operators.dedup import (
    connected_components_adaptive,
    jaccard_pairs,
    sha_dedup_keep_first,
)
from dbbspark.operators.lines import dedup_lines
from dbbspark.operators.lm import dsir_sample, dsir_weights, train_ngram_lm
from dbbspark.operators.normalize import normalize_docs
from dbbspark.operators.packing import pack_sequences
from dbbspark.operators.scrub import leakage_safe_split
from dbbspark.operators.spans import remove_duplicate_spans
from dbbspark.session import get_spark
from dbbspark.tables import load_table


def run(spark, sf_dir: str) -> dict[str, int]:
    out: dict[str, int] = {}

    def stage(name: str, df: DataFrame) -> DataFrame:
        out[name] = df.count()
        print(json.dumps({"stage": name, "docs": out[name]}))
        return df

    docs = stage("input", load_table(spark, sf_dir, "documents"))

    # 0. normalization — map-only cleanup BEFORE any hashing, so the
    # clean and mojibake'd copies of the same page dedup together
    docs = normalize_docs(docs)

    # 1. exact dedup — byte-identical copies collapse to the lowest id
    docs = stage("exact_dedup", sha_dedup_keep_first(docs, "text", "doc_id"))

    # 2. near-dedup — Jaccard pairs → connected components → keep each
    # component's minimum id (consistent with every keep-first rule).
    # Ordering matters: whole-document near-dedup runs BEFORE span
    # removal — cutting shared passages first would erase exactly the
    # shingle overlap near-dedup keys on (measured on the fixtures:
    # reversed order finds zero near-dup pairs).
    pairs = jaccard_pairs(docs, "doc_id", "text", threshold=0.5, max_df=1000)
    dropped = (
        connected_components_adaptive(pairs, "doc_a", "doc_b")
        .where(F.col("node") != F.col("component"))
        .select(F.col("node").alias("doc_id"))
    )
    docs = stage("near_dedup", docs.join(dropped, "doc_id", "left_anti"))

    # 3. substring-level dedup — remaining duplicated passages
    # (boilerplate shared across otherwise-distinct docs) cut,
    # keep-one-copy
    docs = stage(
        "span_removal",
        remove_duplicate_spans(
            docs.select("doc_id", "text"), "doc_id", "text", n=10
        ).join(docs.drop("text"), "doc_id"),
    )

    # 3b. cross-doc line dedup — CCNet-style boilerplate removal for
    # lines repeated across the whole corpus (min_df high enough that
    # legitimate short sentences survive at this corpus size)
    docs = stage(
        "line_dedup",
        dedup_lines(docs.select("doc_id", "text"), "doc_id", "text", min_df=5)
        .join(docs.drop("text"), "doc_id"),
    )

    # 4. quality gate — cheap expression-level signals (the full signal
    # set is q_doc_metrics)
    toks = F.split(F.col("text"), " ")
    docs = stage(
        "quality",
        docs.withColumn("n_tokens", F.size(toks)).where(
            (F.col("n_tokens") >= 5)
            & ((F.col("n_chars") / F.col("n_tokens")).between(2, 15))
        ),
    )

    # 4b. model-based quality gate — a linear classifier trained on a
    # bootstrap label set (here: long in-corpus docs as positives vs
    # token-shuffled copies as negatives — a stand-in for the usual
    # reference-corpus-vs-crawl labeling), scored map-only, soft
    # boundary retention
    # bootstrap label set is deterministic (TakeOrdered + array_sort,
    # no RNG) so re-runs train the identical model
    pos = (
        docs.where(F.col("n_tokens") >= 20)
        .orderBy("doc_id")
        .limit(200)
        .select("text")
    )
    neg = pos.select(
        F.concat_ws(" ", F.array_sort(F.split(F.col("text"), " "))).alias("text")
    )
    labeled = pos.withColumn("label", F.lit(1.0)).unionByName(
        neg.withColumn("label", F.lit(0.0))
    )
    model = train_quality_classifier(labeled, num_features=1 << 14)
    docs = stage(
        "model_quality",
        quality_filter(
            score_quality(docs, model), threshold=0.2, alpha=25.0
        ).drop("quality_score"),
    )

    # 4c. DSIR importance selection — keep the docs that look most like
    # a target domain (here: one source's docs as the target sample vs
    # the whole corpus as the source distribution). Weights are n-gram
    # LM log-likelihood ratios; sampling is deterministic Gumbel-top-k.
    first_source = docs.select("source").orderBy("source").first()["source"]
    lm_target = train_ngram_lm(docs.where(F.col("source") == first_source), n=2)
    lm_source = train_ngram_lm(docs, n=2)
    weighted = dsir_weights(docs, lm_target, lm_source)
    # Materialize the chosen ids: log_ratio comes from a float avg whose
    # summation order can vary across re-executions, so a borderline doc
    # could otherwise flip across the Gumbel cut between this stage's
    # count and the downstream stages' recomputation of the lineage.
    # (The other replay device is pinning the threshold itself —
    # dsir_sample(..., cut=<recorded value>) skips the approxQuantile
    # entirely, which is how the driver-checked q_dsir replays its
    # selection byte-identically on a different engine.)
    chosen = (
        dsir_sample(weighted, fraction=0.8, temperature=2.0)
        .select(F.col("doc").alias("doc_id"))
        .localCheckpoint(eager=True)
    )
    docs = stage("dsir_select", docs.join(chosen, "doc_id", "left_semi"))

    # 5. leakage-safe split — the val coin flips per SOURCE, so near-dup
    # survivors from one source can never straddle the eval boundary
    split = leakage_safe_split(docs, "source", val_fraction=0.1)
    train = stage("train_side", split.where(~F.col("is_val")))
    stage("val_side", split.where(F.col("is_val")))

    # 6. fit the tokenizer on the TRAIN side only (fitting on val leaks
    # its subword statistics into training) and tokenize it — subword
    # counts, not whitespace counts, are what the packing budget should
    # meter in a real pipeline
    from dbbspark.operators.bpe import apply_bpe, train_bpe, word_counts

    merges = train_bpe(word_counts(train), num_merges=64)
    tokenized = apply_bpe(train, merges)
    train = stage(
        "bpe_tokenized",
        tokenized.withColumn("n_tokens", F.size("bpe_tokens")),
    )
    print(json.dumps({"stage": "bpe_merges", "count": len(merges)}))

    # 6a. token-budget selection (operators/select.py, C42) — of the
    # tokenized train docs, keep the most TARGET-LIKE (DSIR log-ratio
    # as the score) documents that fit a fixed training-token budget;
    # same distributed prefix sum as packing, over the (score desc, id)
    # order. Docs the LM couldn't score (null ratio) sort last.
    from dbbspark.operators.select import budget_select

    picked = budget_select(
        train.join(
            weighted.select(
                F.col("doc").alias("doc_id"), F.col("log_ratio").alias("score")
            ),
            "doc_id",
            "left",
        ).select("doc_id", "score", "n_tokens"),
        budget=20_000,
    )
    train = stage(
        "budget_select", train.join(picked.select("doc_id"), "doc_id", "left_semi")
    )

    # 6b. epoch materialization + curriculum order: repeat high-value
    # sources (C52 — here the DSIR-selected docs get 1.5 epochs worth)
    # and order easy→hard by quality score with seeded within-band
    # shuffle (C53); the (stage, order_key) order is what a loader
    # consumes — global_shuffle's key is the degenerate 1-stage case
    from dbbspark.operators.curriculum import curriculum_order
    from dbbspark.operators.mixing import epoch_repeats

    epoch = (
        epoch_repeats(train, {}, default=1.5, epoch_seed=0)
        # fold the copy index into the ordering id (as the CLI does): with
        # id_col="doc_id" every copy of a doc would share one order_key and
        # cluster adjacently — defeating the point of spreading repeats
        .withColumn("uid", F.col("doc_id") * 2 + F.col("rep"))
        .withColumn(
            "difficulty", F.size(F.split("text", " ")).cast("double")
        )  # length as the classic difficulty proxy: short docs first
    )
    ordered = curriculum_order(epoch, "difficulty", stages=3, seed=0, id_col="uid")
    stage("epoch_curriculum", ordered.drop("difficulty", "uid"))

    # 7. pack the train side into fixed-budget training sequences
    packed = pack_sequences(
        train.select("doc_id", "n_tokens"), "doc_id", "n_tokens", budget=512
    )
    stage("packed_docs", packed)
    n_seqs = packed.agg(F.max("seq_last")).first()[0]
    print(json.dumps({"stage": "sequences", "count": int(n_seqs) + 1}))

    # 8. loader-facing export — WebDataset-style tar shards of the train
    # side (payload = utf-8 text, sidecar json = source + token count);
    # byte-deterministic, so a re-run of the whole pipeline reproduces
    # identical shard files
    from dbbspark.operators.shards import build_tar_shards

    shards = build_tar_shards(
        train.select(
            "doc_id",
            F.encode("text", "utf-8").alias("content"),
            "source",
            "n_tokens",
        ),
        shard_bytes=256 * 1024,
        ext="txt",
        meta_cols=["source", "n_tokens"],
    )
    totals = shards.agg(
        F.count("*").alias("n"), F.sum("bytes").alias("b")
    ).first()
    print(
        json.dumps(
            {
                "stage": "tar_shards",
                "count": int(totals["n"]),
                "bytes": int(totals["b"]),
            }
        )
    )
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    run(get_spark("curation-example"), sf)
