"""Rolling-corpus operations example — the OTHER side of the curation
story: `examples/curation_pipeline.py` curates a corpus you already
have; this drives the corpus you are STILL RECEIVING. Five micro-batches
of documents arrive; each flows through the streaming line-dedup gate
(persisted (line-hash, df) frequency index, batch=<id> retry-idempotent
sinks, per-batch telemetry sketches), then the accumulated state is
maintained (gate-index compaction) and audited (incremental dataset
card, one-pass profile + declarative expectations) without EVER
rescanning prior batches' raw inputs.

Prints one JSON line per step. Run:
    python examples/rolling_corpus.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import functions as F


def run(spark, sf_dir: str, work: str) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dbbspark.maintenance import compact_gate_index
    from dbbspark.operators.profile import check_table, profile_table
    from dbbspark.operators.sketches import incremental_card
    from dbbspark.streaming.linededup import index_df, process_batch
    from dbbspark.tables import load_table

    out = {}
    index_dir = os.path.join(work, "line_index")
    out_dir = os.path.join(work, "gated_docs")
    sketch_dir = os.path.join(work, "sketches")

    # 1. five arriving micro-batches (deterministic id-range slices of
    # the fixture corpus — stand-ins for a crawl's daily drops)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_batches = 5
    for b in range(n_batches):
        batch = docs.where(F.col("doc_id") % n_batches == b)
        process_batch(
            batch, b, index_dir, out_dir, min_df=3, sketch_dir=sketch_dir
        )
    gated = spark.read.parquet(out_dir)
    out["batches"] = n_batches
    out["gated_docs"] = gated.count()
    print(json.dumps({"step": "gate", **out}))

    # 2. retry is a no-op: re-run the LAST batch verbatim (the crash-
    # replay case) and pin that nothing changed
    process_batch(
        docs.where(F.col("doc_id") % n_batches == n_batches - 1),
        n_batches - 1,
        index_dir,
        out_dir,
        min_df=3,
        sketch_dir=sketch_dir,
    )
    assert spark.read.parquet(out_dir).count() == out["gated_docs"]
    print(json.dumps({"step": "retry_noop", "ok": True}))

    # 3. telemetry WITHOUT rescanning: the dataset card is an aggregate
    # over n_batches one-row sketches
    card = incremental_card(spark, sketch_dir)
    out["card_docs"] = card["n_docs"]
    print(json.dumps({"step": "card", "card": {k: card[k] for k in ("n_docs", "total_tokens")}}))

    # 4. maintenance: the line-frequency INDEX self-compacts (v=<N>
    # snapshots, old versions pruned by process_batch — and
    # compact_gate_index REFUSES that layout, pinned here); the
    # batch=<id>-append DOC SINK is what grows a partition per batch
    # and is what compaction collapses.
    try:
        compact_gate_index(spark, index_dir)
        raise AssertionError("v= layout must be refused")
    except ValueError:
        pass
    gated_before = spark.read.parquet(out_dir).count()
    compact_gate_index(spark, out_dir)
    assert spark.read.parquet(out_dir).count() == gated_before
    index_rows = index_df(spark, index_dir).count()
    print(json.dumps({"step": "compacted", "index_rows": index_rows}))

    # 5. gate the OUTPUT with declarative expectations before handing it
    # to training (profile + checks are ONE aggregation each). Fresh
    # read: the pre-compaction DataFrame's file listing died with the
    # swap — after ANY compaction, re-resolve readers.
    gated = spark.read.parquet(out_dir)
    prof = profile_table(gated, columns=["doc_id", "text"])
    checks = check_table(
        gated,
        [
            {"check": "not_null", "column": "doc_id"},
            {"check": "unique", "column": "doc_id"},
            {"check": "row_count_between", "min": 1},
        ],
    )
    out["checks_passed"] = all(c["passed"] for c in checks)
    print(
        json.dumps(
            {
                "step": "validate",
                "null_rate_text": prof["columns"]["text"]["null_rate"],
                "checks": checks,
            }
        )
    )
    return out


if __name__ == "__main__":
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dbbspark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="rolling-")
    spark = get_spark("rolling-corpus-example")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, sf, work)
