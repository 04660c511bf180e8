"""The composed curation-pipeline example must keep running end to end
and only ever shrink the corpus stage over stage."""

from __future__ import annotations

import os
import sys


def test_curation_pipeline_runs_and_shrinks(spark, sf_dir):
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
    )
    from curation_pipeline import run

    out = run(spark, sf_dir)
    order = [
        "input",
        "exact_dedup",
        "near_dedup",
        "span_removal",
        "line_dedup",
        "quality",
        "model_quality",
        "dsir_select",
    ]
    counts = [out[k] for k in order]
    assert counts == sorted(counts, reverse=True)
    assert out["train_side"] + out["val_side"] == out["dsir_select"]
    assert out["budget_select"] <= out["train_side"]
    assert out["packed_docs"] == out["budget_select"]


def test_rolling_corpus_example(spark, sf_dir, tmp_path):
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
    )
    from rolling_corpus import run

    out = run(spark, sf_dir, str(tmp_path / "work"))
    assert out["gated_docs"] > 0
    assert out["card_docs"] == out["gated_docs"]  # telemetry counts the gated output
    assert out["checks_passed"] is True


def test_ann_gate_ops_example(spark, sf_dir, tmp_path):
    """The C39 lifecycle example: one drift retrain, generation stable
    across a restarted gate + re-delivery (vhash rejects all of it),
    index converged to a single generation, quantizer store pruned."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
    )
    from ann_gate_ops import run

    out = run(spark, sf_dir, str(tmp_path / "work"))
    assert out["stream1"]["retrains"] == 1
    assert out["stream1"]["gen"] == 1
    # the restarted run resolved the persisted quantizer and stayed quiet
    assert out["stream2"]["gen"] == 1
    assert out["stream2"]["index_generations"] == [1]
    # the full re-delivery batch was rejected: accepted count is flat
    assert out["stream2"]["accepted"] == out["stream1"]["accepted"]
    assert out["quantizer_versions"]  # store present and pruned
