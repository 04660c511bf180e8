"""Quality classifier (operators/classify.py): separation on a synthetic
quality split, deterministic soft-boundary lottery, map-only scoring."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbbspark.operators.classify import (
    quality_filter,
    score_quality,
    train_quality_classifier,
)

GOOD = [
    "the committee published its annual report on regional water quality",
    "researchers observed a measurable decline in seasonal rainfall totals",
    "the library extended its opening hours after community consultation",
    "engineers completed the bridge inspection ahead of schedule",
    "the orchestra performed three new commissions this season",
    "local farmers adopted drought resistant crop varieties last year",
    "the museum restored a collection of nineteenth century maps",
    "city council approved funding for two new cycling corridors",
]
BAD = [
    "click here buy now cheap cheap best price click here",
    "win win win free free casino bonus click subscribe now",
    "cheap pills best price free shipping click click buy",
    "subscribe now win free bonus casino casino best odds",
    "buy cheap buy cheap free free free click here now",
    "best casino bonus free spins click subscribe win now",
    "free shipping best price buy now click here cheap",
    "casino bonus subscribe win free pills cheap click",
]


@pytest.fixture(scope="module")
def model_and_scored(spark):
    labeled = spark.createDataFrame(
        [(t, 1.0) for t in GOOD] + [(t, 0.0) for t in BAD],
        "text string, label double",
    )
    model = train_quality_classifier(labeled, num_features=1 << 12)
    held_out = spark.createDataFrame(
        [
            (1, "the committee reviewed the annual rainfall report"),
            (2, "click now free casino bonus cheap pills"),
        ],
        "doc_id long, text string",
    )
    scored = score_quality(held_out, model)
    return model, scored


def test_separates_held_out(spark, model_and_scored):
    _, scored = model_and_scored
    s = {r["doc_id"]: r["quality_score"] for r in scored.collect()}
    assert s[1] > 0.8 and s[2] < 0.2


def test_scoring_is_map_only(spark, model_and_scored):
    _, scored = model_and_scored
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle in the scoring path


def test_schema_clean_after_scoring(spark, model_and_scored):
    _, scored = model_and_scored
    assert set(scored.columns) == {"doc_id", "text", "quality_score"}


def test_hard_threshold_filter(spark, model_and_scored):
    _, scored = model_and_scored
    kept = quality_filter(scored, threshold=0.5).collect()
    assert [r["doc_id"] for r in kept] == [1]


def test_soft_boundary_is_deterministic_and_monotone(spark):
    # synthetic scores straddling the threshold; no model needed
    rows = [(i, 0.5 - i * 0.004) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, quality_score double")
    a = {r["doc_id"] for r in quality_filter(df, alpha=10.0, seed=7).collect()}
    b = {r["doc_id"] for r in quality_filter(df, alpha=10.0, seed=7).collect()}
    assert a == b  # same lottery on re-run
    strict = {r["doc_id"] for r in quality_filter(df).collect()}
    assert strict <= a  # soft mode only ever keeps MORE
    assert len(a) > len(strict)  # and does keep some near-misses
    far = {r["doc_id"] for r in quality_filter(df, alpha=200.0, seed=7).collect()}
    assert len(far) <= len(a)  # steeper decay keeps fewer
