"""The multimodal pipeline example must run end to end: the perceptual
stage removes all byte-identical AND resized image copies on direct
hash evidence, every survivor decodes, the semantic gate rejects the
same-frequency audio pairs, survivors export as readable tar shards."""

from __future__ import annotations

import os
import sys


def test_multimodal_pipeline_runs(spark):
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
    )
    from multimodal_pipeline import run

    out = run(spark)
    assert out["input"] == 51
    # perceptual keep-one: 5 exact dups (distance 0) + 4 2x-resized
    # copies (block means area-average back to distance 0) — and ONLY
    # those (cross-seed dHash distance >= 14 by construction)
    assert out["phash_dedup"] == 42
    assert out["decoded"] == out["resized"] == 42
    # semantic gate: the 6 same-frequency audio pairs can never survive;
    # ADC near-threshold rejects may remove a few more
    assert out["semantic_dedup"] <= 42 - 6
    assert out["semantic_dedup"] >= 20  # but the gate must not collapse all
    assert out["tar_shards"] >= 1
