"""Streaming ANN-gate lifecycle example — the OPERATIONS story of the
C39 semantic gate (streaming/annindex.py), composed end to end:

1. bootstrap a quantizer (IVF centroids + PQ codebooks) on an early
   sample of the embedding stream;
2. stream arriving batches through the drift-aware gate in
   ``rekey='lazy'`` mode: new vectors are admitted, byte-identical
   re-deliveries are rejected by the exact vector-hash rule;
3. a distribution shift (new encoder / new domain) trips the
   reconstruction-cosine drift check: the quantizer retrains and the
   generation advances — WITHOUT rewriting the corpus index inside the
   trigger (old partitions stay scorable under their own persisted
   codebooks);
4. a RESTARTED gate run resolves the PERSISTED retrained quantizer
   (never the caller's stale bootstrap argument): an at-least-once
   re-delivery of the shifted content is fully rejected by the exact
   vhash rule across the retrain, stays drift-quiet, and its trigger's
   bounded re-key converges the index to one generation without any
   trigger ever paying the whole corpus;
5. snapshot retention: the quantizer store keeps only what live index
   generations still decode under.

Prints one JSON line per step. Run:
    python examples/ann_gate_ops.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys

from pyspark.sql import functions as F


def run(spark, sf_dir: str, work: str) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dbbspark.commit import committed_versions
    from dbbspark.operators.pq import train_ivfpq
    from dbbspark.operators.similarity import train_centroids
    from dbbspark.streaming.annindex import (
        index_generations,
        streaming_ann_gate_with_drift,
    )
    from dbbspark.tables import load_table

    out: dict = {}
    idx = os.path.join(work, "ann_index")
    acc = os.path.join(work, "accepted")
    src = os.path.join(work, "arrivals")
    os.makedirs(src, exist_ok=True)

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )

    # 1. bootstrap quantizer on a REPRESENTATIVE sample (every 5th
    # vector): a regional bootstrap would make every later batch look
    # drifted; representative training is what keeps the drift check
    # meaningful (quiet on clean batches, loud on a real shift)
    boot = emb.where(F.col("vec_id") % 5 == 0)
    cents = train_centroids(boot, k=16).localCheckpoint(eager=True)
    books = train_ivfpq(boot, cents, m=16, k=64)
    out["bootstrap"] = {"vectors": boot.count(), "cells": 16}
    print(json.dumps({"step": "bootstrap", **out["bootstrap"]}))

    def drop_batch(df, name):
        stage = os.path.join(work, f"stage_{name}")
        df.coalesce(1).write.parquet(stage)
        shutil.move(
            glob.glob(f"{stage}/part-*.parquet")[0],
            os.path.join(src, f"{name}.parquet"),
        )

    # 2. arrivals: a clean batch, then a batch carrying 20 byte-identical
    # re-deliveries (same embeddings, new ids — the vhash rule's case),
    # then a SHIFTED batch (encoder/domain change → drift retrain)
    rest = emb.where(F.col("vec_id") % 5 != 0)
    b1 = rest.where(F.col("vec_id") < 250)
    dups = (
        b1.where(F.col("vec_id") < 30)
        .select((F.col("vec_id") + 9000).alias("vec_id"), "embedding")
    )
    b2 = rest.where(F.col("vec_id") >= 250).unionByName(dups)
    shifted = rest.where(F.col("vec_id") >= 250).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(2.0)).alias("embedding"),
    )
    drop_batch(b1, "b1_clean")
    drop_batch(b2, "b2_with_dups")
    drop_batch(shifted, "b3_drifted")

    def gate_run():
        q, state = streaming_ann_gate_with_drift(
            (
                spark.readStream.schema(
                    "vec_id long, embedding array<double>"
                )
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
            ),
            idx,
            acc,
            os.path.join(work, "ckpt"),
            cents,
            books,
            eps=0.05,
            drift_stds=1.0,
            rekey="lazy",
            rekey_batches_per_trigger=8,
        )
        q.awaitTermination()
        return state

    state = gate_run()
    out["stream1"] = {
        "retrains": state["retrains"],
        "gen": state["gen"],
        "index_generations": index_generations(spark, idx),
        "accepted": spark.read.parquet(acc).count(),
    }
    print(json.dumps({"step": "stream1", **out["stream1"]}))

    # 3. restart + crash-retry: the upstream re-delivers the shifted
    # content under fresh ids (the classic at-least-once hazard). The
    # restarted gate must resolve the PERSISTED gen-1 quantizer — not
    # our stale bootstrap args — reject every re-delivery through the
    # exact vhash rule ACROSS the retrain, stay drift-quiet (same
    # distribution as the re-baselined batch), and use the trigger's
    # bounded re-key to converge the index to one generation
    b4 = shifted.select((F.col("vec_id") + 20000).alias("vec_id"), "embedding")
    drop_batch(b4, "b4_redelivery_after_restart")
    state2 = gate_run()
    out["stream2"] = {
        "gen": state2["gen"],
        "index_generations": index_generations(spark, idx),
        "accepted": spark.read.parquet(acc).count(),
    }
    print(json.dumps({"step": "stream2", **out["stream2"]}))

    # 4. retention: the committed quantizer store holds only what live
    # generations decode under (min-live-gen pruning ran inside saves)
    out["quantizer_versions"] = committed_versions(spark, f"{idx}.quantizer")
    print(json.dumps({"step": "retention", "versions": out["quantizer_versions"]}))
    return out


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dbbspark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ann_gate_ops"
    shutil.rmtree(work, ignore_errors=True)
    run(get_spark("ann-gate-ops"), sf_dir, work)
