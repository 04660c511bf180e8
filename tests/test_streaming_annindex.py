"""Streaming ANN-index gate (streaming/annindex.py, C39): cross-batch
semantic rejection over the persisted IVFPQ index, within-batch greedy
keep-lowest, retry idempotence, stream ≡ batch caller."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbbspark.operators.pq import train_ivfpq
from dbbspark.streaming.annindex import (
    _index_codes,
    gate_batch,
    process_batch,
)


def _vec(seed, d=16):
    # deterministic unit-ish vectors; far apart for distinct seeds
    vals = [((seed * 31 + j * 7) % 13) - 6.0 for j in range(d)]
    return [v / 10.0 for v in vals]


@pytest.fixture(scope="module")
def setup(spark):
    base = spark.createDataFrame(
        [(i, _vec(i)) for i in range(12)], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(0, _vec(100)), (1, _vec(200)), (2, _vec(300))],
        "vec_id long, embedding array<double>",
    )
    books = train_ivfpq(base, cents, m=4, k=8)
    return cents, books


def test_gate_rejects_cross_batch_and_within_batch_dups(spark, tmp_path, setup):
    cents, books = setup
    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    b1 = spark.createDataFrame(
        [(1, _vec(1)), (2, _vec(2))], "vec_id long, embedding array<double>"
    )
    process_batch(b1, 0, idx, acc, cents, books)
    got0 = sorted(
        r["vec_id"] for r in spark.read.parquet(acc).collect()
    )
    assert got0 == [1, 2]

    # batch 2: 10 duplicates vec 1 exactly (cross-batch reject), 12 and
    # 13 duplicate each other (within-batch: keep 12), 14 is new
    b2 = spark.createDataFrame(
        [(10, _vec(1)), (12, _vec(5)), (13, _vec(5)), (14, _vec(6))],
        "vec_id long, embedding array<double>",
    )
    process_batch(b2, 1, idx, acc, cents, books)
    got = sorted(r["vec_id"] for r in spark.read.parquet(acc).collect())
    assert got == [1, 2, 12, 14]
    # index rows mirror accepted vectors exactly
    idx_ids = sorted(
        r["vec_id"] for r in _index_codes(spark, idx).collect()
    )
    assert idx_ids == got


def test_retry_is_idempotent(spark, tmp_path, setup):
    cents, books = setup
    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    b1 = spark.createDataFrame(
        [(1, _vec(1))], "vec_id long, embedding array<double>"
    )
    process_batch(b1, 0, idx, acc, cents, books)
    b2 = spark.createDataFrame(
        [(2, _vec(1)), (3, _vec(9))], "vec_id long, embedding array<double>"
    )
    process_batch(b2, 1, idx, acc, cents, books)
    once = sorted(r["vec_id"] for r in spark.read.parquet(acc).collect())
    assert once == [1, 3]  # 2 rejected against batch 0's vec 1
    process_batch(b2, 1, idx, acc, cents, books)  # crashed-attempt re-run
    assert sorted(r["vec_id"] for r in spark.read.parquet(acc).collect()) == once
    assert sorted(
        r["vec_id"] for r in _index_codes(spark, idx).collect()
    ) == once


def test_batch_caller_equals_streaming(spark, tmp_path, setup):
    import glob
    import os
    import shutil

    from dbbspark.streaming.annindex import streaming_ann_gate

    cents, books = setup
    src = str(tmp_path / "src")
    stage = str(tmp_path / "stage")
    rows = [(1, _vec(1)), (2, _vec(1)), (3, _vec(4))]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1).write.parquet(stage)
    os.makedirs(src, exist_ok=True)
    shutil.move(
        glob.glob(f"{stage}/part-*.parquet")[0], os.path.join(src, "b1.parquet")
    )
    stream = spark.readStream.schema("vec_id long, embedding array<double>").parquet(src)
    q = streaming_ann_gate(
        stream,
        str(tmp_path / "idx"),
        str(tmp_path / "acc"),
        str(tmp_path / "ck"),
        cents,
        books,
    )
    q.awaitTermination()
    streamed = sorted(
        r["vec_id"]
        for r in spark.read.parquet(str(tmp_path / "acc")).collect()
    )
    batch = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    empty = _index_codes(spark, str(tmp_path / "none"))
    acc, _codes = gate_batch(batch, empty, cents, books)
    direct = sorted(r["vec_id"] for r in acc.collect())
    assert streamed == direct == [1, 3]


def test_eps_validation(spark, setup):
    cents, books = setup
    batch = spark.createDataFrame(
        [(1, _vec(1))], "vec_id long, embedding array<double>"
    )
    empty = _index_codes(batch.sparkSession, "/nonexistent-annidx")
    with pytest.raises(ValueError):
        gate_batch(batch, empty, cents, books, eps=0.0)


# ---------------------------------------------------------------------------
# Quantizer drift policy (VERDICT r4 item 3)
# ---------------------------------------------------------------------------


def _cluster_vec(center, i, d=16, spread=0.5):
    """Deterministic vector near `center` (sin-hash noise: no two ids
    collide into parallel vectors, unlike modular patterns)."""
    import math

    def noise(j):
        return (math.sin(i * 12.9898 + j * 78.233) * 43758.5453) % 1.0 - 0.5

    return [c + noise(j) * spread for j, c in enumerate(center)]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _centers(d=16):
    a = [1.0 if j % 2 == 0 else 0.2 for j in range(d)]
    b = [-0.8 if j % 3 == 0 else 1.5 for j in range(d)]  # far from a
    return a, b


def test_quantizer_drift_detection(spark):
    """Same-distribution batches stay quiet; a shifted cluster trips the
    recon-cosine mean_shift finding."""
    from dbbspark.streaming.annindex import quantizer_drift, quantizer_profile

    a, b = _centers()
    boot = _mk(spark, [(i, _cluster_vec(a, i)) for i in range(60)])
    cents = train_centroids_for_test(spark, boot)
    books = train_ivfpq(boot, cents, m=4, k=8)

    base = quantizer_profile(boot, cents, books)
    same = quantizer_profile(
        _mk(spark, [(100 + i, _cluster_vec(a, i + 7)) for i in range(40)]),
        cents, books,
    )
    assert quantizer_drift(base, same, stds=2.0) == []

    shifted = quantizer_profile(
        _mk(spark, [(200 + i, _cluster_vec(b, i)) for i in range(40)]),
        cents, books,
    )
    findings = quantizer_drift(base, shifted, stds=2.0)
    assert findings and findings[0]["kind"] == "mean_shift"
    # drifted data reconstructs WORSE than baseline
    assert findings[0]["after"] < findings[0]["before"]


def train_centroids_for_test(spark, boot):
    from dbbspark.operators.similarity import train_centroids

    return train_centroids(boot, k=4).localCheckpoint(eager=True)


def test_drift_triggered_retrain_and_rebuild(spark, tmp_path):
    """End-to-end: a drifted batch retrains the quantizer, the code
    index is rebuilt under the new codebooks, the gate keeps working
    (byte-identical duplicates of earlier accepts still rejected), and
    a non-drifted stream never retrains."""
    import glob
    import os
    import shutil

    from dbbspark.streaming.annindex import (
        _index_codes,
        streaming_ann_gate_with_drift,
    )

    a, b = _centers()
    boot = _mk(spark, [(1000 + i, _cluster_vec(a, i)) for i in range(60)])
    cents = train_centroids_for_test(spark, boot)
    books = train_ivfpq(boot, cents, m=4, k=8)

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)

    def drop_batch(rows, name):
        stage = str(tmp_path / f"stage_{name}")
        _mk(spark, rows).coalesce(1).write.parquet(stage)
        shutil.move(
            glob.glob(f"{stage}/part-*.parquet")[0],
            os.path.join(src, f"{name}.parquet"),
        )

    # batch files land before the stream starts: availableNow drains them
    # in file order as separate micro-batches (maxFilesPerTrigger=1)
    b1 = [(i, _cluster_vec(a, i)) for i in range(20)]
    b2 = [(100 + i, _cluster_vec(b, i)) for i in range(20)]
    drop_batch(b1, "b1")
    drop_batch(b2, "b2")

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    q, state = streaming_ann_gate_with_drift(
        stream, idx, acc, str(tmp_path / "ck"), cents, books,
        eps=0.05, drift_stds=2.0,
    )
    q.awaitTermination()

    assert state["retrains"] == 1
    accepted = {r["vec_id"] for r in spark.read.parquet(acc).collect()}
    # greedy within-batch dedup legitimately trims same-cluster vectors
    # (they ARE semantic near-dups); the lowest id of each batch always
    # survives, proving both batches were gated, not dropped
    assert 0 in accepted
    assert any(i >= 100 for i in accepted)  # drifted batch still gated in
    # index fully re-keyed: every row's cell is a NEW centroid id and
    # every accepted vector has exactly one index row
    idx_rows = _index_codes(spark, idx).collect()
    assert {r["vec_id"] for r in idx_rows} == accepted
    new_cells = {r["vec_id"] for r in state["centroids"].collect()}
    assert {r["cell"] for r in idx_rows} <= new_cells

    # byte-identical duplicates of pre-retrain accepts are still
    # rejected (vhash identity survives any re-key)
    from dbbspark.streaming.annindex import gate_batch

    # 900: byte-identical to accepted vec 0 — must be vhash-rejected.
    # 901: far from BOTH clusters (cos < 0.2 to each) — genuinely new.
    far = [4.0, -4.0] + [0.1] * 14
    dup = _mk(spark, [(900, b1[0][1]), (901, far)])
    acc2, _ = gate_batch(
        dup, _index_codes(spark, idx), state["centroids"], state["codebooks"]
    )
    got = {r["vec_id"] for r in acc2.collect()}
    assert 900 not in got and 901 in got


def test_restart_after_retrain_uses_persisted_quantizer(spark, tmp_path):
    """Restart safety (ADVICE r5): after a drift retrain re-keys the
    index, a NEW gate process started with the caller's ORIGINAL frozen
    quantizer (checkpoint skips the retrain batches, so nothing replays)
    must resolve the persisted retrained quantizer — not score old
    codebooks against new-generation codes."""
    import glob
    import os
    import shutil

    from dbbspark.streaming.annindex import (
        index_generation,
        load_quantizer,
        streaming_ann_gate_with_drift,
    )

    a, b = _centers()
    boot = _mk(spark, [(1000 + i, _cluster_vec(a, i)) for i in range(60)])
    cents = train_centroids_for_test(spark, boot)
    books = train_ivfpq(boot, cents, m=4, k=8)

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)

    def drop_batch(rows, name):
        stage = str(tmp_path / f"stage_{name}")
        _mk(spark, rows).coalesce(1).write.parquet(stage)
        shutil.move(
            glob.glob(f"{stage}/part-*.parquet")[0],
            os.path.join(src, f"{name}.parquet"),
        )

    def stream():
        return (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

    b1 = [(i, _cluster_vec(a, i)) for i in range(20)]
    b2 = [(100 + i, _cluster_vec(b, i)) for i in range(20)]
    drop_batch(b1, "b1")
    drop_batch(b2, "b2")
    idx, acc, ck = (
        str(tmp_path / "idx"), str(tmp_path / "acc"), str(tmp_path / "ck")
    )
    q, state = streaming_ann_gate_with_drift(
        stream(), idx, acc, ck, cents, books, eps=0.05, drift_stds=2.0,
    )
    q.awaitTermination()
    assert state["retrains"] == 1 and state["gen"] == 1
    assert index_generation(spark, idx) == 1

    accepted_b = sorted(
        r["vec_id"]
        for r in spark.read.parquet(acc).collect()
        if r["vec_id"] >= 100
    )
    anchor = next(r for r in spark.read.parquet(acc).collect()
                  if r["vec_id"] == accepted_b[0])
    near = [v + (0.002 if j == 0 else 0.0) for j, v in enumerate(anchor["embedding"])]
    far = [4.0, -4.0] + [0.1] * 14

    # "restart": a fresh gate over the SAME dirs/checkpoint, handed the
    # STALE bootstrap quantizer — only b3 will run (checkpoint advanced)
    drop_batch([(900, near), (901, far)], "b3")
    q2, state2 = streaming_ann_gate_with_drift(
        stream(), idx, acc, ck, cents, books, eps=0.05, drift_stds=2.0,
    )
    # the persisted generation-1 quantizer was resolved before any batch
    assert state2["gen"] >= 1
    pq_cents = {
        tuple(r["embedding"]) for r in state["centroids"].collect()
    }
    got_cents = {
        tuple(r["embedding"]) for r in state2["centroids"].collect()
    }
    assert got_cents == pq_cents  # retrained centroids, not the stale arg
    q2.awaitTermination()
    final = {r["vec_id"] for r in spark.read.parquet(acc).collect()}
    assert 900 not in final  # eps-near an accepted vector: ADC still sees it
    assert 901 in final  # genuinely new: still accepted

    # the persisted store exposes baseline + gen for observability
    loaded = load_quantizer(spark, idx)
    assert loaded is not None and loaded[3] >= 1 and loaded[2] is not None


def test_restart_heals_crash_between_quantizer_save_and_rebuild(
    spark, tmp_path
):
    """Crash window: quantizer snapshot committed at gen N+1 but the
    process died before re-keying the index (still gen N). Gate start
    detects the generation mismatch and re-runs the rebuild from the
    durable accepted vectors."""
    import os

    from dbbspark.streaming.annindex import (
        gate_batch,
        index_generation,
        load_quantizer,
        retrain_quantizer,
        save_quantizer,
        streaming_ann_gate_with_drift,
    )

    a, _b = _centers()
    boot = _mk(spark, [(1000 + i, _cluster_vec(a, i)) for i in range(60)])
    cents = train_centroids_for_test(spark, boot)
    books = train_ivfpq(boot, cents, m=4, k=8)
    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")

    b1 = _mk(spark, [(i, _cluster_vec(a, i)) for i in range(30)])
    process_batch(b1, 0, idx, acc, cents, books, gen=0)
    save_quantizer(spark, idx, cents, books, None, 0)

    # the crash: a new quantizer generation lands, the index does not
    new_cents, new_books = retrain_quantizer(
        spark.read.parquet(acc).select("vec_id", "embedding"), 4, 4, 8
    )
    save_quantizer(spark, idx, new_cents, new_books, None, 1)
    assert index_generation(spark, idx) == 0  # stale codes on disk

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)  # empty: availableNow drains nothing
    q, state = streaming_ann_gate_with_drift(
        (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .parquet(src)
        ),
        idx, acc, str(tmp_path / "ck"), cents, books,
    )
    q.awaitTermination()
    assert state["gen"] == 1
    assert index_generation(spark, idx) == 1  # healed: re-keyed at start
    # and the healed index still gates: byte-identical dup rejected
    dup = _mk(spark, [(500, _cluster_vec(a, 0))])
    ld_cents, ld_books, _, _ = load_quantizer(spark, idx)
    acc2, _ = gate_batch(
        dup, _index_codes(spark, idx), ld_cents, ld_books
    )
    assert acc2.count() == 0


def test_lazy_rekey_scores_mixed_generations_and_converges(spark, tmp_path):
    """VERDICT r5 item 5: rekey='lazy' makes a drift retrain O(new batch)
    up front — old partitions keep old-generation codes, scored under
    their OWN codebooks (multi-generation ADC), and a bounded slice
    re-keys per trigger until the index converges to one generation.
    Decisions must match the eager full-rebuild gate on margin-clear
    vectors throughout."""
    import glob
    import os
    import shutil

    from dbbspark.streaming.annindex import (
        gate_batch,
        index_generations,
        load_quantizer_generations,
        streaming_ann_gate_with_drift,
    )

    a, b = _centers()
    boot = _mk(spark, [(1000 + i, _cluster_vec(a, i)) for i in range(60)])
    cents = train_centroids_for_test(spark, boot)
    books = train_ivfpq(boot, cents, m=4, k=8)

    def drop_batch(src, rows, name):
        stage = str(tmp_path / f"stage_{name}_{os.path.basename(src)}")
        _mk(spark, rows).coalesce(1).write.parquet(stage)
        shutil.move(
            glob.glob(f"{stage}/part-*.parquet")[0],
            os.path.join(src, f"{name}.parquet"),
        )

    b1 = [(i, _cluster_vec(a, i)) for i in range(20)]
    b2 = [(100 + i, _cluster_vec(b, i)) for i in range(20)]

    def run(mode, tag, per_trigger):
        src = str(tmp_path / f"src_{tag}")
        os.makedirs(src, exist_ok=True)
        drop_batch(src, b1, "b1")
        drop_batch(src, b2, "b2")
        idx = str(tmp_path / f"idx_{tag}")
        acc = str(tmp_path / f"acc_{tag}")
        q, state = streaming_ann_gate_with_drift(
            (
                spark.readStream.schema("vec_id long, embedding array<double>")
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
            ),
            idx, acc, str(tmp_path / f"ck_{tag}"), cents, books,
            eps=0.05, drift_stds=2.0, rekey=mode,
            rekey_batches_per_trigger=per_trigger,
        )
        q.awaitTermination()
        return idx, acc, state, src

    e_idx, e_acc, e_state, _ = run("eager", "eager", 0)
    l_idx, l_acc, l_state, l_src = run("lazy", "lazy", 0)

    assert e_state["retrains"] == 1 and l_state["retrains"] == 1
    e_accepted = {r["vec_id"] for r in spark.read.parquet(e_acc).collect()}
    l_accepted = {r["vec_id"] for r in spark.read.parquet(l_acc).collect()}
    assert l_accepted == e_accepted  # gate decisions identical
    # eager fully re-keyed; lazy (per_trigger=0) still holds BOTH gens
    assert index_generations(spark, e_idx) == [1]
    assert index_generations(spark, l_idx) == [0, 1]
    # both generations' codebooks are live in the store
    store = load_quantizer_generations(spark, l_idx)
    assert {0, 1} <= set(store)

    # mixed-generation gating: near-dups of BOTH strata rejected, far
    # vector accepted — the old stratum is scored under gen-0 codebooks
    lo = min(v for v in l_accepted if v < 100)
    hi = min(v for v in l_accepted if v >= 100)
    acc_rows = {r["vec_id"]: r["embedding"]
                for r in spark.read.parquet(l_acc).collect()}
    near_old = [v + (0.002 if j == 0 else 0.0)
                for j, v in enumerate(acc_rows[lo])]
    near_new = [v + (0.002 if j == 0 else 0.0)
                for j, v in enumerate(acc_rows[hi])]
    far = [4.0, -4.0] + [0.1] * 14
    probe = _mk(spark, [(900, near_old), (901, near_new), (902, far)])
    from dbbspark.streaming.annindex import _index_codes

    got, _ = gate_batch(
        probe, _index_codes(spark, l_idx, with_gen=True),
        l_state["centroids"], l_state["codebooks"],
        quantizers_by_gen={
            **store, l_state["gen"]: (l_state["centroids"],
                                      l_state["codebooks"]),
        },
    )
    ids = {r["vec_id"] for r in got.collect()}
    assert ids == {902}

    # convergence: restart the lazy gate with a re-key budget and one
    # more (clean) batch — stale partitions re-encode, single gen left,
    # decisions for the probe unchanged
    b3 = [(300 + i, _cluster_vec(b, 50 + i)) for i in range(5)]
    drop_batch(l_src, b3, "b3")
    q2, l_state2 = streaming_ann_gate_with_drift(
        (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", "1")
            .parquet(l_src)
        ),
        l_idx, l_acc, str(tmp_path / "ck_lazy"), cents, books,
        eps=0.05, drift_stds=2.0, rekey="lazy", rekey_batches_per_trigger=8,
    )
    q2.awaitTermination()
    assert index_generations(spark, l_idx) == [l_state2["gen"]]
    got2, _ = gate_batch(
        probe, _index_codes(spark, l_idx, with_gen=True),
        l_state2["centroids"], l_state2["codebooks"],
        quantizers_by_gen={
            l_state2["gen"]: (l_state2["centroids"], l_state2["codebooks"])
        },
    )
    assert {r["vec_id"] for r in got2.collect()} == {902}


def test_rekey_stale_partitions_bounded_and_idempotent(spark, tmp_path):
    """The background compaction primitive: re-keys at most max_batches
    stale partitions per call, leaves fresh ones untouched, converges,
    and a repeat call is a no-op."""
    from dbbspark.streaming.annindex import (
        index_generations,
        rekey_stale_partitions,
        retrain_quantizer,
    )

    # unique sin-noise vectors + a tight eps: the gate must ACCEPT all
    # 24, so the re-key has enough durable vectors to retrain/encode
    # against (_vec has period 13 in its seed — byte-identical repeats
    # would be vhash-rejected; an operating-width eps would ADC-trim
    # same-cluster neighbors)
    a, _b = _centers()
    boot = _mk(spark, [(1000 + i, _cluster_vec(a, i)) for i in range(60)])
    cents = train_centroids_for_test(spark, boot)
    books = train_ivfpq(boot, cents, m=4, k=8)
    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    for bid in range(3):
        rows = _mk(
            spark,
            [(bid * 50 + i, _cluster_vec(a, 100 + bid * 20 + i))
             for i in range(8)],
        )
        process_batch(rows, bid, idx, acc, cents, books, gen=0, eps=0.001)
    new_cents, new_books = retrain_quantizer(
        spark.read.parquet(acc).select("vec_id", "embedding"), 4, 4, 8
    )
    done = rekey_stale_partitions(
        spark, acc, idx, new_cents, new_books, gen=1, max_batches=2
    )
    assert done == [0, 1]
    assert index_generations(spark, idx) == [0, 1]  # batch 2 still stale
    done2 = rekey_stale_partitions(
        spark, acc, idx, new_cents, new_books, gen=1, max_batches=2
    )
    assert done2 == [2]
    assert index_generations(spark, idx) == [1]
    assert rekey_stale_partitions(
        spark, acc, idx, new_cents, new_books, gen=1
    ) == []
    # every accepted vector still has exactly one index row
    acc_ids = sorted(r["vec_id"] for r in spark.read.parquet(acc).collect())
    idx_ids = sorted(r["vec_id"] for r in spark.read.parquet(idx).collect())
    assert acc_ids == idx_ids


def test_gen_column_survives_mixed_schema_index(spark, tmp_path, setup):
    """Self-review r6: an index whose older partitions predate generation
    stamping (plain gate) and whose newer ones carry gen must read with
    mergeSchema — single-footer inference could drop the gen column and
    silently score gen-N codes under gen-0 codebooks."""
    from dbbspark.streaming.annindex import index_generations

    cents, books = setup
    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    b1 = spark.createDataFrame(
        [(1, _vec(1)), (2, _vec(2))], "vec_id long, embedding array<double>"
    )
    process_batch(b1, 0, idx, acc, cents, books)  # pre-gen partition
    b2 = spark.createDataFrame(
        [(3, _vec(9))], "vec_id long, embedding array<double>"
    )
    process_batch(b2, 1, idx, acc, cents, books, gen=1)  # stamped
    rows = _index_codes(spark, idx, with_gen=True).collect()
    by_id = {r["vec_id"]: r["gen"] for r in rows}
    assert by_id[3] == 1  # the stamped partition's gen is visible...
    assert by_id[1] == 0 and by_id[2] == 0  # ...pre-gen rows coalesce to 0
    assert index_generations(spark, idx) == [0, 1]


def test_drift_gate_refuses_bootstrap_over_stamped_index(spark, tmp_path):
    """Self-review r6: a gen-stamped index with NO loadable quantizer
    store means the store was lost — re-bootstrapping would commit the
    caller's stale quantizer as newest and silently undo the retrain, so
    the gate must refuse to start."""
    import os

    import pytest as _pytest

    from dbbspark.streaming.annindex import streaming_ann_gate_with_drift

    a, _b = _centers()
    boot = _mk(spark, [(1000 + i, _cluster_vec(a, i)) for i in range(60)])
    cents = train_centroids_for_test(spark, boot)
    books = train_ivfpq(boot, cents, m=4, k=8)
    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    b1 = _mk(spark, [(i, _cluster_vec(a, i)) for i in range(10)])
    process_batch(b1, 0, idx, acc, cents, books, gen=2)  # stamped, no store

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    with _pytest.raises(RuntimeError, match="quantizer"):
        streaming_ann_gate_with_drift(
            (
                spark.readStream.schema(
                    "vec_id long, embedding array<double>"
                ).parquet(src)
            ),
            idx, acc, str(tmp_path / "ck"), cents, books,
        )


def test_multi_gen_scoring_refuses_missing_generation(spark, tmp_path, setup):
    """gate_batch's multi-generation path must FAIL FAST when the index
    holds a generation whose codebooks are not in the supplied store —
    scoring those rows under any other generation's codebooks is the
    silent mis-decode the gen machinery exists to prevent."""
    cents, books = setup
    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    b1 = spark.createDataFrame(
        [(1, _vec(1)), (2, _vec(5))], "vec_id long, embedding array<double>"
    )
    process_batch(b1, 0, idx, acc, cents, books, gen=3)  # stamped gen 3
    b2 = spark.createDataFrame(
        [(7, _vec(9))], "vec_id long, embedding array<double>"
    )
    with pytest.raises(RuntimeError, match="no persisted"):
        gate_batch(
            b2,
            _index_codes(spark, idx, with_gen=True),
            cents,
            books,
            quantizers_by_gen={0: (cents, books)},  # gen 3 missing
        )
    # with the store complete, the same call gates normally
    accepted, _codes = gate_batch(
        b2,
        _index_codes(spark, idx, with_gen=True),
        cents,
        books,
        quantizers_by_gen={0: (cents, books), 3: (cents, books)},
    )
    assert accepted.count() == 1
