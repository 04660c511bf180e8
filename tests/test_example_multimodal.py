"""The multimodal pipeline example must run end to end: every item
decodes, all 5 byte-identical image dups are rejected (the exact
vector-hash rule), survivors export as readable tar shards."""

from __future__ import annotations

import os
import sys


def test_multimodal_pipeline_runs(spark):
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
    )
    from multimodal_pipeline import run

    out = run(spark)
    assert out["decoded"] == out["input"] == 47
    assert out["resized"] == 47  # every image re-encoded, audio passthrough
    # exact dups (5 images + 6 same-frequency audio pairs) can never
    # survive; ADC near-threshold rejects may remove a few more
    assert out["semantic_dedup"] <= 47 - 11
    assert out["semantic_dedup"] >= 20  # but the gate must not collapse all
    assert out["tar_shards"] >= 1
