"""The reliable-checkpoint seam (session.cut_lineage).

SURVEY.md §4 promises the ~30 lineage-cut sites accept reliable
`spark.checkpoint` "by flipping the checkpoint dir". These tests make that
claim executable: the same iterative / shared-sub-plan operators produce
identical results in local mode (default) and reliable mode
(spark.dbbspark.checkpointDir set on a LIVE session), and reliable mode
demonstrably writes checkpoint blocks to the configured directory —
the property that lets a preemptible 1000-executor cluster recompute
from the shared filesystem instead of dying with a lost executor.
"""

from __future__ import annotations

import glob
import os

import pytest

from dbbspark.session import CHECKPOINT_DIR_CONF, cut_lineage


def _chain_edges(spark):
    # one diameter-30 chain + two triangles: exercises multiple star
    # rounds (several eager + lazy cuts per round)
    rows = [(i, i + 1) for i in range(30)]
    rows += [(100, 101), (101, 102), (102, 100), (200, 201), (201, 202)]
    return spark.createDataFrame(rows, "src long, dst long")


def _docs(spark):
    return spark.createDataFrame(
        [(i, 7 + (i * 13) % 23) for i in range(200)], "doc_id long, n_tokens long"
    )


def _run_ops(spark):
    from dbbspark.operators.dedup import connected_components_star
    from dbbspark.operators.packing import pack_sequences

    cc = sorted(
        tuple(r)
        for r in connected_components_star(_chain_edges(spark)).collect()
    )
    packed = sorted(
        tuple(r) for r in pack_sequences(_docs(spark), budget=64).collect()
    )
    return cc, packed


@pytest.fixture()
def ckpt_dir(spark, tmp_path):
    d = str(tmp_path / "reliable_ckpt")
    yield d
    # never leak reliable mode into the rest of the (session-scoped) suite
    try:
        spark.conf.unset(CHECKPOINT_DIR_CONF)
    except Exception:
        pass


def _ckpt_files(d: str) -> list[str]:
    return [
        p
        for p in glob.glob(os.path.join(d, "**", "*"), recursive=True)
        if os.path.isfile(p)
    ]


def test_flip_produces_identical_results_and_writes_blocks(spark, ckpt_dir):
    local_cc, local_packed = _run_ops(spark)  # default: localCheckpoint

    spark.conf.set(CHECKPOINT_DIR_CONF, ckpt_dir)
    try:
        rel_cc, rel_packed = _run_ops(spark)
    finally:
        spark.conf.unset(CHECKPOINT_DIR_CONF)

    assert rel_cc == local_cc
    assert rel_packed == local_packed
    # the reliable run must actually have durable blocks on the shared fs
    assert len(_ckpt_files(ckpt_dir)) > 0


def test_unset_reverts_to_local_mode(spark, ckpt_dir):
    spark.conf.set(CHECKPOINT_DIR_CONF, ckpt_dir)
    df = spark.range(100).withColumnRenamed("id", "v")
    cut_lineage(df, eager=True).count()
    n_reliable = len(_ckpt_files(ckpt_dir))
    assert n_reliable > 0

    spark.conf.unset(CHECKPOINT_DIR_CONF)
    cut_lineage(spark.range(50), eager=True).count()
    # local mode even though the SparkContext still holds a checkpoint dir:
    # routing keys off the dbbspark conf, so no new durable files appear
    assert len(_ckpt_files(ckpt_dir)) == n_reliable


def test_lazy_cut_preserves_values_in_reliable_mode(spark, ckpt_dir):
    spark.conf.set(CHECKPOINT_DIR_CONF, ckpt_dir)
    try:
        from pyspark.sql import functions as F

        base = spark.range(1000).select(
            F.col("id"), (F.col("id") * 3 % 17).alias("k")
        )
        pinned = cut_lineage(base, eager=False)
        # two consumers of the pinned sub-plan agree with direct evaluation
        total = pinned.agg(F.sum("k")).first()[0]
        cnt = pinned.where(F.col("k") > 8).count()
        assert total == sum(i * 3 % 17 for i in range(1000))
        assert cnt == sum(1 for i in range(1000) if i * 3 % 17 > 8)
    finally:
        spark.conf.unset(CHECKPOINT_DIR_CONF)


def test_reliable_mode_through_composed_pipeline(spark, ckpt_dir, sf_dir, tmp_path):
    """The flip holds through a real multi-operator composition (the
    curate core: normalize → exact dedup → LSH+CC → line dedup), not
    just isolated operators: identical surviving ids in both modes."""
    from pyspark.sql import functions as F

    from dbbspark.operators.dedup import (
        connected_components_adaptive,
        lsh_candidate_pairs_direct,
        sha_dedup_keep_first,
    )
    from dbbspark.operators.lines import dedup_lines
    from dbbspark.operators.normalize import normalize_docs
    from dbbspark.tables import load_table

    def run():
        raw = normalize_docs(load_table(spark, sf_dir, "documents"))
        docs = sha_dedup_keep_first(raw, "text", "doc_id")
        pairs = lsh_candidate_pairs_direct(docs, "doc_id", "text")
        comps = connected_components_adaptive(pairs, "doc_a", "doc_b")
        dropped = comps.where(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
        docs = docs.join(dropped, "doc_id", "left_anti")
        docs = dedup_lines(docs.select("doc_id", "text"), "doc_id", "text", min_df=2)
        return sorted(r["doc_id"] for r in docs.select("doc_id").collect())

    local_ids = run()
    spark.conf.set(CHECKPOINT_DIR_CONF, ckpt_dir)
    try:
        reliable_ids = run()
    finally:
        spark.conf.unset(CHECKPOINT_DIR_CONF)
    assert reliable_ids == local_ids and len(local_ids) > 0


def test_repeated_cuts_reuse_one_checkpoint_subdir(spark, ckpt_dir):
    """Regression (ADVICE r5): getCheckpointDir returns a fully-qualified
    URI (file:/...) while the conf holds a bare path, so the raw
    startswith comparison never matched and EVERY cut re-ran
    setCheckpointDir — one fresh random subdirectory per lineage cut
    (directory churn on the shared filesystem). Path-component
    comparison must keep all cuts of one configured root in ONE
    subdirectory."""
    spark.conf.set(CHECKPOINT_DIR_CONF, ckpt_dir)
    try:
        for n in (100, 200, 300):
            cut_lineage(spark.range(n), eager=True).count()
    finally:
        spark.conf.unset(CHECKPOINT_DIR_CONF)
    subdirs = [
        p
        for p in glob.glob(os.path.join(ckpt_dir, "*"))
        if os.path.isdir(p)
    ]
    assert len(subdirs) == 1, subdirs


def test_reliable_checkpoint_survives_executor_kill(tmp_path):
    """Chaos pin (VERDICT r5 item 6): the seam's CLAIM is surviving
    executor loss — localCheckpoint blocks die with their executor and
    the truncated lineage cannot recompute them, while reliable
    checkpoint blocks live on the shared filesystem. Stage it for real:
    local-cluster mode (separate executor JVMs), cut lineage reliably,
    SIGKILL one executor, then consume the checkpointed frame — the job
    must complete with the right answer. Runs in a subprocess so the
    session-scoped local[4] fixture is untouched."""
    import os
    import subprocess
    import sys
    import textwrap

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = textwrap.dedent(
        f"""
        import os, signal, subprocess, sys
        sys.path.insert(0, {repo!r})
        from pyspark.sql import SparkSession, functions as F
        from dbbspark.session import CHECKPOINT_DIR_CONF, cut_lineage

        spark = (
            SparkSession.builder.master("local-cluster[2,1,2048]")
            .appName("chaos-seam")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.shuffle.partitions", "4")
            # no task-level retries: a failure would surface, not mask
            .config("spark.task.maxFailures", "4")
            .getOrCreate()
        )
        spark.conf.set(CHECKPOINT_DIR_CONF, {str(tmp_path / "ckpt")!r})
        df = (
            spark.range(0, 10000, 1, 4)
            .withColumn("g", F.col("id") % 7)
            .groupBy("g").agg(F.sum("id").alias("s"))
        )
        cut = cut_lineage(df, eager=True)  # durable blocks on shared fs

        def executor_pids():
            # build the pattern at runtime: the literal would appear in
            # THIS process's `python -c` cmdline and pgrep -f would match
            # the driver itself (and we would SIGKILL ourselves)
            pat = "CoarseGrained" + "ExecutorBackend"
            out = subprocess.run(
                ["pgrep", "-f", pat], capture_output=True, text=True,
            ).stdout.split()
            me = os.getpid()
            return [int(p) for p in out if int(p) != me]

        pids = executor_pids()
        assert len(pids) >= 2, f"expected 2 executor JVMs, saw {{pids}}"
        os.kill(pids[0], signal.SIGKILL)  # chaos: one executor gone

        rows = {{r["g"]: r["s"] for r in cut.collect()}}
        expect = {{g: sum(i for i in range(10000) if i % 7 == g)
                  for g in range(7)}}
        assert rows == expect, (rows, expect)
        n = cut.join(cut.withColumnRenamed("s", "s2"), "g").count()
        assert n == 7
        print("CHAOS_OK", len(pids))
        spark.stop()
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=420,
        env=dict(os.environ, PYTHONPATH=repo),
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "CHAOS_OK" in r.stdout
