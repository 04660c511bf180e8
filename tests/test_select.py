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


def _mk_grouped(spark, rows):
    return spark.createDataFrame(
        rows, "source string, doc_id long, score double, n_tokens bigint"
    )


def _serial_grouped(rows, budgets):
    out = []
    for g in sorted({r[0] for r in rows}):
        if g not in budgets:
            continue
        cum = 0
        for src, did, score, tok in sorted(
            (r for r in rows if r[0] == g), key=lambda r: (-r[2], r[1])
        ):
            if cum < budgets[g]:
                cum += tok
                out.append((g, did, cum))
    return set(out)


def test_grouped_matches_serial_reference(spark):
    from dbbspark.operators.select import budget_select_grouped

    rng = random.Random(71)
    rows = [
        (rng.choice(["web", "code", "books"]), i, round(rng.random(), 6),
         rng.randint(5, 80))
        for i in range(600)
    ]
    budgets = {"web": 2000, "code": 500, "books": 100}
    got = {
        (r["source"], r["doc_id"], r["cum_tokens"])
        for r in budget_select_grouped(_mk_grouped(spark, rows), budgets).collect()
    }
    assert got == _serial_grouped(rows, budgets)


def test_grouped_partition_invariance_and_unlisted_group_dropped(spark):
    from dbbspark.operators.select import budget_select_grouped

    rng = random.Random(73)
    rows = [
        (rng.choice(["a", "b", "c"]), i, float(rng.randint(0, 4)), rng.randint(1, 30))
        for i in range(400)
    ]
    budgets = {"a": 600, "b": 150}  # c unlisted -> dropped entirely
    one = sorted(
        budget_select_grouped(_mk_grouped(spark, rows), budgets, num_buckets=1).collect()
    )
    many = sorted(
        budget_select_grouped(_mk_grouped(spark, rows), budgets, num_buckets=11).collect()
    )
    assert one == many
    assert not [r for r in one if r["source"] == "c"]
    assert {r["source"] for r in one} == {"a", "b"}


def test_grouped_budgets_independent(spark):
    from dbbspark.operators.select import budget_select_grouped

    rows = [("x", i, 1.0, 10) for i in range(10)]
    rows += [("y", 100 + i, 1.0, 10) for i in range(10)]
    got = budget_select_grouped(
        _mk_grouped(spark, rows), {"x": 25, "y": 95}
    ).collect()
    by = {}
    for r in got:
        by.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by["x"]) == 3  # 10+10 fits, third straddles 25
    assert len(by["y"]) == 10  # 95 admits all ten (last straddles)


def test_typed_columns_pass_through(spark):
    """Regression (ADVICE r4): the mapInPandas output schema derives from
    the INPUT types — string ids, float scores, int tokens, and an
    integer group column all work, nothing is force-cast to
    long/double/string."""
    rows = [(f"doc-{i:03d}", float(i % 7), 10 + i % 5) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id string, score float, n_tokens int")
    out = budget_select(df, budget=200)
    got = out.collect()
    assert dict(out.dtypes)["doc_id"] == "string"
    assert dict(out.dtypes)["score"] == "float"
    assert dict(out.dtypes)["n_tokens"] == "int"
    want = _serial_select(rows, 200)
    assert {(r["doc_id"], r["cum_tokens"]) for r in got} == set(want)

    from dbbspark.operators.select import budget_select_grouped

    grows = [(1, i, float(i % 3), 10) for i in range(10)]
    grows += [(2, 100 + i, float(i % 3), 10) for i in range(10)]
    gdf = spark.createDataFrame(grows, "source int, doc_id long, score double, n_tokens bigint")
    gout = budget_select_grouped(gdf, {1: 45, 2: 95})
    assert dict(gout.dtypes)["source"] == "int"
    by = {}
    for r in gout.collect():
        by.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by[1]) == 5 and len(by[2]) == 10
