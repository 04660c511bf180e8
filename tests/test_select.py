"""Token-budget subset selection (operators/select.py, SURVEY.md §2.11 C42)."""

from __future__ import annotations

import random

import pytest

from dbbspark.operators.select import budget_select, budget_select_threshold


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score double, n_tokens bigint")


def _serial_select(rows, budget):
    """Single-machine reference: sort by (score desc, id), take while the
    exclusive prefix is below budget."""
    out, cum = [], 0
    for did, score, tok in sorted(rows, key=lambda r: (-(r[1] if r[1] is not None else float("-inf")), r[0])):
        if cum < budget:
            cum += tok
            out.append((did, cum))
        else:
            break
    return out


def test_matches_serial_reference(spark):
    random.seed(7)
    rows = [(i, round(random.random(), 6), random.randint(1, 400)) for i in range(500)]
    got = {
        (r["doc_id"], r["cum_tokens"])
        for r in budget_select(_mk(spark, rows), budget=20_000).collect()
    }
    assert got == set(_serial_select(rows, 20_000))


def test_straddling_doc_admitted(spark):
    rows = [(1, 3.0, 10), (2, 2.0, 10), (3, 1.0, 10)]
    # budget 15: doc 1 fits (cum 10), doc 2 straddles (exclusive prefix
    # 10 < 15 → admitted, cum 20), doc 3's prefix 20 >= 15 → cut.
    got = sorted(r["doc_id"] for r in budget_select(_mk(spark, rows), 15).collect())
    assert got == [1, 2]


def test_partition_invariance(spark):
    random.seed(11)
    rows = [(i, float(random.randint(0, 5)), random.randint(1, 50)) for i in range(300)]
    a = sorted(budget_select(_mk(spark, rows), 3000, num_buckets=1).collect())
    b = sorted(budget_select(_mk(spark, rows), 3000, num_buckets=7).collect())
    assert a == b


def test_score_tie_broken_by_id(spark):
    rows = [(i, 1.0, 10) for i in range(10)]
    got = sorted(r["doc_id"] for r in budget_select(_mk(spark, rows), 35).collect())
    assert got == [0, 1, 2, 3]  # ids 0-2 fill 30, id 3 straddles


def test_null_scores_sort_last(spark):
    rows = [(1, None, 10), (2, 0.1, 10), (3, 0.2, 10)]
    got = sorted(r["doc_id"] for r in budget_select(_mk(spark, rows), 20).collect())
    assert got == [2, 3]


def test_empty_frame(spark):
    assert budget_select(_mk(spark, []), 100).count() == 0


def test_everything_fits(spark):
    rows = [(i, float(i), 5) for i in range(20)]
    assert budget_select(_mk(spark, rows), 10_000).count() == 20


@pytest.mark.parametrize("budget", [5_000, 15_000])
def test_threshold_variant_lands_near_budget(spark, budget):
    random.seed(3)
    rows = [(i, round(random.random(), 6), random.randint(20, 80)) for i in range(2000)]
    df = _mk(spark, rows)
    picked = budget_select_threshold(df, budget, slack=0.05).collect()
    exact = _serial_select(rows, budget)
    total = sum(
        next(tok for d, _s, tok in rows if d == r["doc_id"]) for r in picked
    )
    exact_total = exact[-1][1]
    # Admitted mass within one straddling doc of the exact rule's mass.
    assert abs(total - exact_total) <= 80 + 0.05 * budget
    # The bulk (well above the cut) agrees with the exact selection.
    exact_ids = {d for d, _ in exact}
    got_ids = {r["doc_id"] for r in picked}
    scores = {d: s for d, s, _ in rows}
    core = {d for d in exact_ids if scores[d] > min(scores[x] for x in exact_ids) + 0.1}
    assert core <= got_ids
