"""PII scrubbing + benchmark decontamination operators."""

from __future__ import annotations

from dbbspark.operators.scrub import benchmark_overlap, scrub_pii


def test_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or 555-867-5309 at 10.0.0.1"),
            (2, "ssn 123-45-6789 twice: 123-45-6789"),
            (3, "clean text with version 1.2.3 and id 12345"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in scrub_pii(df, "text", out_col="clean").collect()}
    assert "<EMAIL>" in rows[1]["clean"] and "<IPV4>" in rows[1]["clean"]
    assert "bob@example.com" not in rows[1]["clean"]
    assert rows[1]["pii_counts"]["email"] == 1
    assert rows[2]["clean"].count("<SSN>") == 2
    assert rows[2]["pii_counts"]["ssn"] == 2
    # conservative: versions / plain numbers untouched
    assert rows[3]["clean"] == rows[3]["text"]
    assert sum(rows[3]["pii_counts"].values()) == 0


def test_phone_needs_separators(spark):
    df = spark.createDataFrame(
        [(1, "call (303) 555-0100 now"), (2, "order 3035550100 shipped")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["text2"] for r in scrub_pii(df, "text", out_col="text2").collect()}
    assert "<PHONE>" in rows[1]
    assert rows[2] == "order 3035550100 shipped"  # bare digit runs left alone


def test_benchmark_overlap_flags_quotes(spark):
    bench = spark.createDataFrame(
        [(100, "the seven wonders of the ancient world include the great pyramid")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # contains an 8-token quote from the benchmark
            (1, "as we know the seven wonders of the ancient world include many things"),
            (2, "completely unrelated text about spark shuffle partitions and codegen stages"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc"]: r["overlap"] for r in benchmark_overlap(docs, bench, shingle_n=8).collect()}
    assert got[1] > 0, "quoted doc must be flagged as contaminated"
    assert got[2] == 0


def test_benchmark_overlap_corpus_side_no_shuffle(spark):
    bench = spark.createDataFrame([(1, "a b c d e f g h i")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(i, f"doc {i} words a b c d e f g h") for i in range(50)],
        "doc_id long, text string",
    )
    plan = (
        benchmark_overlap(docs, bench, shingle_n=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the only exchanges allowed are on the tiny benchmark side
    # (distinct + single-row collect_set); the corpus side must be a
    # broadcast probe. BroadcastNestedLoopJoin over ONE row is the
    # expected cross-join shape.
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    corpus_branch = plan.split("Broadcast", 1)[0]
    assert "Exchange hashpartitioning(doc" not in corpus_branch


def test_leakage_safe_split_groups_never_straddle(spark):
    from dbbspark.operators.scrub import leakage_safe_split

    rows = [(i, f"dom{i % 40}") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "domain"])
    out = leakage_safe_split(df, "domain", 0.25).collect()
    sides = {}
    for r in out:
        sides.setdefault(r["domain"], set()).add(r["is_val"])
    # every domain entirely on one side
    assert all(len(s) == 1 for s in sides.values())
    # fraction lands near the target at the GROUP level
    val_groups = sum(1 for s in sides.values() if s == {True})
    assert 3 <= val_groups <= 17  # 40 groups, p=0.25 -> ~10
    # deterministic + salt-sensitive
    again = leakage_safe_split(df, "domain", 0.25).collect()
    assert {(r["doc_id"], r["is_val"]) for r in again} == {
        (r["doc_id"], r["is_val"]) for r in out
    }
    resalted = leakage_safe_split(df, "domain", 0.25, salt="split-v2").collect()
    assert {(r["doc_id"], r["is_val"]) for r in resalted} != {
        (r["doc_id"], r["is_val"]) for r in out
    }
