"""Commit-protocol tests (VERDICT r5 item 1): versioned snapshots stay
correct under CONCURRENT writers, not just single-writer retries.

The hazard being pinned: two jobs appending/compacting the same state
dir used to interleave raw renames — writer B's `rename(staging, live)`
could land inside writer A's half-finished swap and a snapshot is lost
with no error. The protocol's create-exclusive commit log + owned-slot
rename makes every interleaving yield N complete snapshots."""

from __future__ import annotations

import json
import threading

import pytest
from pyspark.sql import functions as F

from dbbspark.commit import (
    ConcurrentWriteError,
    commit_snapshot,
    committed_versions,
    exclusive_lock,
    latest_snapshot,
    prune_snapshots,
    read_latest,
)
from dbbspark.maintenance import _fs_and_path, compact_gate_index


def _write_payload(spark, value: int):
    def write_fn(path: str) -> None:
        spark.createDataFrame([(value,)], "payload int").coalesce(1).write.parquet(
            path
        )

    return write_fn


def test_commit_sequence_and_latest(spark, tmp_path):
    root = str(tmp_path / "snaps")
    v0, p0 = commit_snapshot(spark, root, _write_payload(spark, 10))
    v1, p1 = commit_snapshot(spark, root, _write_payload(spark, 11))
    assert (v0, v1) == (0, 1)
    assert committed_versions(spark, root) == [0, 1]
    n, path = latest_snapshot(spark, root)
    assert n == 1
    assert read_latest(spark, root).first()["payload"] == 11
    # snapshot 0 is still fully readable (no in-place mutation ever)
    assert spark.read.parquet(p0).first()["payload"] == 10


def test_interleaved_writers_all_snapshots_survive(spark, tmp_path):
    """Deterministic interleaving: both writers stage BEFORE either
    commits (the worst ordering for a raw-rename design), then commit in
    opposite order of staging. Both snapshots must exist, complete, with
    distinct versions — no lost snapshot, no merged directory."""
    from dbbspark.commit import _reserved_versions

    root = str(tmp_path / "interleaved")
    # stage both writers' data by hand (what commit_snapshot does first)
    a_stage, b_stage = f"{root}/_staging/wa", f"{root}/_staging/wb"
    _write_payload(spark, 100)(a_stage)
    _write_payload(spark, 200)(b_stage)

    # writer B commits first although A staged first
    import dbbspark.commit as commit_mod

    def finish(staging: str) -> int:
        fs, hroot, jvm = _fs_and_path(spark, root)
        Path = jvm.org.apache.hadoop.fs.Path
        fs.mkdirs(Path(f"{root}/_commits"))
        for _ in range(5):
            reserved = _reserved_versions(spark, root)
            n = (reserved[-1] + 1) if reserved else 0
            if commit_mod._create_exclusive(
                fs, jvm, f"{root}/_commits/{n}", "{}"
            ):
                assert fs.rename(Path(staging), Path(f"{root}/v={n}"))
                return n
        raise AssertionError("could not reserve a slot")

    vb = finish(b_stage)
    va = finish(a_stage)
    assert {va, vb} == {0, 1} and vb == 0  # B won slot 0, A took 1
    assert committed_versions(spark, root) == [0, 1]
    by_version = {
        n: spark.read.parquet(f"{root}/v={n}").first()["payload"]
        for n in (0, 1)
    }
    assert by_version == {0: 200, 1: 100}


def test_racing_threads_produce_distinct_complete_snapshots(spark, tmp_path):
    """True concurrency: N threads commit simultaneously through the
    public API; every writer lands a complete snapshot at a unique
    version."""
    root = str(tmp_path / "race")
    n_writers, results, errors = 4, {}, []

    def worker(i: int) -> None:
        try:
            v, _ = commit_snapshot(spark, root, _write_payload(spark, i))
            results[i] = v
        except Exception as e:  # pragma: no cover - diagnostic
            errors.append((i, repr(e)))

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(n_writers)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert sorted(results.values()) == list(range(n_writers))  # unique slots
    assert committed_versions(spark, root) == list(range(n_writers))
    payloads = {
        spark.read.parquet(f"{root}/v={v}").first()["payload"]
        for v in results.values()
    }
    assert payloads == set(range(n_writers))  # nothing lost or duplicated


def test_burned_slot_is_skipped_not_resolved(spark, tmp_path):
    """A writer that crashed between reserving a slot and renaming its
    data leaves a record with no snapshot: readers skip it, the next
    writer reserves past it."""
    root = str(tmp_path / "burned")
    commit_snapshot(spark, root, _write_payload(spark, 1))
    # simulate the crash: record for slot 1, no v=1 dir
    fs, _, jvm = _fs_and_path(spark, root)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(f"{root}/_commits/1"), False)
    out.close()
    v2, _ = commit_snapshot(spark, root, _write_payload(spark, 3))
    assert v2 == 2
    assert committed_versions(spark, root) == [0, 2]
    assert read_latest(spark, root).first()["payload"] == 3


def test_prune_keeps_newest_and_version_counter_monotonic(spark, tmp_path):
    root = str(tmp_path / "pruned")
    for i in range(4):
        commit_snapshot(spark, root, _write_payload(spark, i))
    removed = prune_snapshots(spark, root, keep_last=2)
    assert removed == [0, 1]
    assert committed_versions(spark, root) == [2, 3]
    # commit records survive pruning, so the next slot is still 4 —
    # version numbers never regress into a pruned slot
    v, _ = commit_snapshot(spark, root, _write_payload(spark, 9))
    assert v == 4


def test_exclusive_lock_loser_aborts_and_releases(spark, tmp_path):
    root = str(tmp_path / "ds")
    _write_payload(spark, 1)(root)
    with exclusive_lock(spark, root, purpose="test"):
        with pytest.raises(ConcurrentWriteError):
            with exclusive_lock(spark, root, purpose="late"):
                pass  # pragma: no cover
    # released on exit: a fresh acquisition succeeds
    with exclusive_lock(spark, root, purpose="again"):
        pass
    # released on ERROR too
    with pytest.raises(RuntimeError, match="boom"):
        with exclusive_lock(spark, root):
            raise RuntimeError("boom")
    with exclusive_lock(spark, root):
        pass


def test_exclusive_lock_stale_break_is_explicit(spark, tmp_path):
    root = str(tmp_path / "stale")
    _write_payload(spark, 1)(root)
    # a crashed holder's lock: present, old enough
    fs, _, jvm = _fs_and_path(spark, root)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(f"{root}.lock"), False)
    out.write(bytearray(json.dumps({"ts": 0}).encode()))
    out.close()
    # default: strict — never broken implicitly
    with pytest.raises(ConcurrentWriteError):
        with exclusive_lock(spark, root):
            pass  # pragma: no cover
    # explicit stale horizon: broken and re-acquired
    with exclusive_lock(spark, root, break_stale_after=0.0):
        pass


def test_exclusive_lock_bounded_wait_rides_out_brief_holder(spark, tmp_path):
    """``wait`` (r13, ADVICE r12): a bounded retry-with-backoff
    acquisition that outlives a BRIEF holder instead of aborting — the
    streaming-gate mode — while still raising once the horizon passes a
    holder that never releases."""
    import threading
    import time as _time

    root = str(tmp_path / "waity")
    _write_payload(spark, 1)(root)

    release = threading.Event()
    held = threading.Event()

    def holder():
        with exclusive_lock(spark, root, purpose="brief-maintenance"):
            held.set()
            release.wait(timeout=30)

    t = threading.Thread(target=holder)
    t.start()
    assert held.wait(timeout=30)
    # loser-aborts default still aborts immediately under contention
    with pytest.raises(ConcurrentWriteError):
        with exclusive_lock(spark, root):
            pass  # pragma: no cover
    # bounded wait: release the holder shortly after the waiter starts
    threading.Timer(0.4, release.set).start()
    t0 = _time.monotonic()
    with exclusive_lock(spark, root, purpose="stream-batch", wait=20.0):
        waited = _time.monotonic() - t0
    t.join(timeout=30)
    assert waited < 15.0  # acquired on release, nowhere near the horizon
    # horizon passes against a still-held lock: raises, not hangs
    release.clear()
    held.clear()
    t2 = threading.Thread(target=holder)
    t2.start()
    assert held.wait(timeout=30)
    with pytest.raises(ConcurrentWriteError):
        with exclusive_lock(spark, root, wait=0.6, poll=0.1):
            pass  # pragma: no cover
    release.set()
    t2.join(timeout=30)


def test_concurrent_compaction_loser_aborts_gate_state_intact(spark, tmp_path):
    """compact_gate_index under a held lock aborts WITHOUT touching the
    dataset; after release it compacts and the index content (the gate's
    decisions input) is identical."""
    idx = str(tmp_path / "gate_idx")
    for b in range(3):
        (
            spark.range(b * 10, b * 10 + 10)
            .select(
                F.col("id").alias("h"), F.lit(1).cast("long").alias("df"),
                F.lit(b).alias("batch"),
            )
            .write.mode("append")
            .partitionBy("batch")
            .parquet(idx)
        )
    before = {
        (r["h"], r["df"]) for r in spark.read.parquet(idx).collect()
    }
    with exclusive_lock(spark, idx, purpose="writer-A-compaction"):
        with pytest.raises(ConcurrentWriteError):
            compact_gate_index(spark, idx)
        # loser left no staging/backup debris and no data change
        fs, _, jvm = _fs_and_path(spark, idx)
        Path = jvm.org.apache.hadoop.fs.Path
        assert not fs.exists(Path(idx + ".compact-staging"))
        assert not fs.exists(Path(idx + ".pre-compact"))
    after_abort = {
        (r["h"], r["df"]) for r in spark.read.parquet(idx).collect()
    }
    assert after_abort == before
    backup = compact_gate_index(spark, idx)  # lock free now: succeeds
    compacted = spark.read.parquet(idx)
    assert {(r["h"], r["df"]) for r in compacted.collect()} == before
    assert compacted.select("batch").distinct().count() == 1
    assert backup.endswith(".pre-compact")


def test_lock_release_is_ownership_checked(spark, tmp_path):
    """Self-review r6: a holder outlived by a stale-break must NOT
    delete the new holder's lock on exit — release re-reads the lock and
    acts only on its own token."""
    import json as _json

    root = str(tmp_path / "owned")
    _write_payload(spark, 1)(root)
    fs, _, jvm = _fs_and_path(spark, root)
    Path = jvm.org.apache.hadoop.fs.Path

    gen = exclusive_lock(spark, root, purpose="long-holder")
    gen.__enter__()
    # operator breaks the "stale" lock; a new holder acquires
    fs.delete(Path(root + ".lock"), False)
    with exclusive_lock(spark, root, purpose="new-holder"):
        # the outlived holder exits — must NOT remove the new lock
        try:
            gen.__exit__(None, None, None)
        except Exception:
            pass
        assert fs.exists(Path(root + ".lock"))
        data = []
        stream = fs.open(Path(root + ".lock"))
        while True:
            b = stream.read()
            if b < 0:
                break
            data.append(b)
        stream.close()
        assert _json.loads(bytes(data))["purpose"] == "new-holder"
    # new holder's exit DOES release (its token matches)
    assert not fs.exists(Path(root + ".lock"))


def test_commit_failure_cleans_staging(spark, tmp_path):
    """A failed commit must not leak its staged snapshot copy."""
    root = str(tmp_path / "cleanup")

    def bad_write(path: str) -> None:
        _write_payload(spark, 1)(path)
        raise RuntimeError("simulated writer crash after staging")

    with pytest.raises(RuntimeError, match="simulated"):
        commit_snapshot(spark, root, bad_write)
    fs, _, jvm = _fs_and_path(spark, root)
    Path = jvm.org.apache.hadoop.fs.Path
    stg = Path(f"{root}/_staging")
    assert not fs.exists(stg) or not list(fs.listStatus(stg))
    # and the corrupt-slot path (ADVICE r6): pre-existing v=N dirs with
    # no commit record must be reserved PAST, never paired with a fresh
    # record (which would make committed_versions report data the
    # protocol never wrote) — the commit lands beyond them
    root2 = str(tmp_path / "cleanup2")
    _write_payload(spark, 0)(f"{root2}/v=0")  # corrupt: data, no record
    _write_payload(spark, 0)(f"{root2}/v=1")
    n, path = commit_snapshot(spark, root2, _write_payload(spark, 1))
    assert n == 2 and path.endswith("v=2")
    # the foreign dirs (v=0 has Spark's _SUCCESS!) stay invisible
    assert committed_versions(spark, root2) == [2]
    staging_root = Path(f"{root2}/_staging")
    leaked = (
        [s.getPath().getName() for s in fs.listStatus(staging_root)]
        if fs.exists(staging_root)
        else []
    )
    assert leaked == []


def test_gc_staging_reaps_killed_writer_orphans_only(spark, tmp_path):
    """A SIGKILL'd writer leaves _staging/<token> with no in-process
    cleanup; gc_staging reaps it past the age horizon, never touches a
    younger (possibly live) staging dir, and never touches committed
    snapshots. Commits keep working afterwards."""
    from dbbspark.commit import gc_staging

    root = str(tmp_path / "gcroot")
    commit_snapshot(spark, root, _write_payload(spark, 7))
    # orphan: staged data whose writer died before the commit CAS
    _write_payload(spark, 99)(f"{root}/_staging/deadwriter")
    # horizon larger than the orphan's age: nothing is eligible
    assert gc_staging(spark, root, older_than_sec=3600.0) == []
    removed = gc_staging(spark, root, older_than_sec=0.0)
    assert [p.rsplit("/", 1)[1] for p in removed] == ["deadwriter"]
    fs, _, jvm = _fs_and_path(spark, root)
    Path = jvm.org.apache.hadoop.fs.Path
    assert not fs.exists(Path(f"{root}/_staging/deadwriter"))
    # committed state untouched; the log advances normally after gc
    assert committed_versions(spark, root) == [0]
    assert read_latest(spark, root).first()["payload"] == 7
    v, _p = commit_snapshot(spark, root, _write_payload(spark, 8))
    assert v == 1 and read_latest(spark, root).first()["payload"] == 8
    # no _staging at all is a no-op, not an error
    assert gc_staging(spark, str(tmp_path / "nothing"), 0.0) == []


def test_read_snapshot_time_travel_and_refusals(spark, tmp_path):
    """read_snapshot reproduces any retained past version exactly
    (snapshots are immutable) and refuses burned, pruned, and unknown
    versions instead of reading a stale path."""
    from dbbspark.commit import read_snapshot

    root = str(tmp_path / "tt")
    for v in range(3):
        commit_snapshot(spark, root, _write_payload(spark, 10 + v))
    assert read_snapshot(spark, root, 0).first()["payload"] == 10
    assert read_snapshot(spark, root, 2).first()["payload"] == 12
    prune_snapshots(spark, root, keep_last=2)
    with pytest.raises(ValueError, match="not a committed snapshot"):
        read_snapshot(spark, root, 0)  # pruned
    with pytest.raises(ValueError, match="not a committed snapshot"):
        read_snapshot(spark, root, 99)  # never existed
    assert read_snapshot(spark, root, 1).first()["payload"] == 11


def test_cli_gc_prunes_and_reaps(spark, tmp_path, capsys):
    """`cli gc` composes prune_snapshots + gc_staging +
    prune_commit_records: old versions, dead-writer staging, and the
    pruned versions' now-dangling commit records all go; the newest
    snapshots and their records stay."""
    from dbbspark import cli

    root = str(tmp_path / "cliroot")
    for v in range(3):
        commit_snapshot(spark, root, _write_payload(spark, v))
    _write_payload(spark, 99)(f"{root}/_staging/dead")
    rc = cli.main(
        ["gc", "--root", root, "--keep-last", "2", "--staging-horizon", "0"]
    )
    assert rc == 0
    assert committed_versions(spark, root) == [1, 2]
    fs, _, jvm = _fs_and_path(spark, root)
    Path = jvm.org.apache.hadoop.fs.Path
    assert not fs.exists(Path(f"{root}/_staging/dead"))
    # the pruned version's record went with it (r7 bounded commit log)
    assert not fs.exists(Path(f"{root}/_commits/0"))
    # version counter stays monotonic: next commit takes slot 3
    v, _p = commit_snapshot(spark, root, _write_payload(spark, 3))
    assert v == 3


def test_gc_racing_live_committers_never_loses_committed_data(spark, tmp_path):
    """Chaos: gc sweeps with a TOO-SHORT horizon while writers commit.
    The documented worst case is an aborted in-flight write (gc reaps a
    live staging dir, that writer's rename fails) — NEVER a lost or
    corrupt committed snapshot, and the sweep itself never crashes on a
    staging dir a winning commit renames away mid-walk."""
    import threading

    from dbbspark.commit import gc_staging

    root = str(tmp_path / "race2")
    committed, aborted, errors = [], [], []

    def writer(v):
        try:
            n, _ = commit_snapshot(spark, root, _write_payload(spark, v))
            committed.append((n, v))
        except Exception:
            # gc reaped our staging mid-write (Spark job failure) or
            # just before the rename (IOError) — both are the documented
            # "aborted write"; the invariants below prove nothing
            # COMMITTED was harmed
            aborted.append(v)

    stop = threading.Event()

    def sweeper():
        while not stop.is_set():
            try:
                gc_staging(spark, root, older_than_sec=0.0)
            except Exception as exc:
                errors.append(exc)

    sw = threading.Thread(target=sweeper)
    sw.start()
    try:
        threads = [
            threading.Thread(target=writer, args=(v,)) for v in range(6)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        stop.set()
        sw.join()
    assert errors == []
    # every commit that REPORTED success is complete and readable with
    # its own payload, at a unique version
    assert len({n for n, _ in committed}) == len(committed)
    for n, v in committed:
        from dbbspark.commit import read_snapshot

        assert read_snapshot(spark, root, n).first()["payload"] == v
    assert committed_versions(spark, root) == sorted(n for n, _ in committed)


def test_prune_commit_records_bounds_the_log(spark, tmp_path):
    """r7 (found by the 50-batch gate soak): `_commits` grew one record
    per trigger forever, an O(N) listing per resolve. Records of pruned
    snapshots and burned slots are reaped past the age horizon; the
    newest record always survives (monotonic counter), a record with
    live data always survives (deleting it would un-commit), and a
    young record is left alone (it may belong to a live writer between
    CAS and rename)."""
    from dbbspark.commit import prune_commit_records, prune_snapshots

    root = str(tmp_path / "reclog")
    for v in range(5):
        commit_snapshot(spark, root, _write_payload(spark, v))
    # burn a slot: record without data (crashed-after-CAS shape)
    fs, _, jvm = _fs_and_path(spark, root)
    Path = jvm.org.apache.hadoop.fs.Path
    out = fs.create(Path(f"{root}/_commits/5"), False)
    out.close()
    assert committed_versions(spark, root) == [0, 1, 2, 3, 4]
    prune_snapshots(spark, root, keep_last=2)  # data of 0-2 gone

    # young records are protected by the horizon
    assert prune_commit_records(spark, root, older_than_sec=3600.0) == []
    # quiesced horizon-0: prunable = {0,1,2 (data pruned)}; 5 is the
    # NEWEST record and survives even though burned; 3,4 have live data
    assert prune_commit_records(spark, root, older_than_sec=0.0) == [0, 1, 2]
    assert committed_versions(spark, root) == [3, 4]
    # the counter never regresses: next commit reserves past 5
    v, p = commit_snapshot(spark, root, _write_payload(spark, 9))
    assert v == 6 and committed_versions(spark, root) == [3, 4, 6]


class _RaceFS:
    """Proxy fs that simulates a foreign v=<n> dir materializing between
    the slot listing and the CAS (the corrupt-slot race), by CREATING it
    for real the first time the winner checks its rename destination.
    Optionally also fails the commit-record delete (the ADVICE r7
    double-fault)."""

    def __init__(self, inner, fail_record_delete: bool = False):
        self._inner = inner
        self._fail_record_delete = fail_record_delete
        self._fired = False

    def exists(self, p):
        import re

        s = p.toString()
        if (
            not self._fired
            and re.search(r"/v=\d+$", s)
            and not self._inner.exists(p)
        ):
            self._fired = True
            self._inner.mkdirs(p)  # the foreign dir lands mid-race
            return True
        return self._inner.exists(p)

    def delete(self, p, recursive=False):
        if self._fail_record_delete and "_commits/" in p.toString():
            raise IOError("injected record-delete failure")
        return self._inner.delete(p, recursive)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def _race_fs(monkeypatch, fail_record_delete: bool):
    import dbbspark.commit as commit_mod

    real = _fs_and_path

    def patched(sp, path):
        fs, hpath, jvm = real(sp, path)
        return _RaceFS(fs, fail_record_delete), hpath, jvm

    # one proxy instance per call is fine: _fired only matters for the
    # commit_snapshot-internal fs, which is created once per commit
    monkeypatch.setattr(commit_mod, "_fs_and_path", patched)


def test_corrupt_slot_mid_race_burns_record_and_moves_on(
    spark, tmp_path, monkeypatch
):
    """A foreign v=<n> dir appearing between the list and the CAS: the
    winner deletes its own just-created record (never legitimizing data
    the protocol didn't write) and commits on the next slot."""
    from dbbspark.commit import _reserved_versions

    root = str(tmp_path / "race")
    _race_fs(monkeypatch, fail_record_delete=False)
    n, path = commit_snapshot(spark, root, _write_payload(spark, 5))
    monkeypatch.undo()
    assert n == 1 and path.endswith("v=1")
    assert committed_versions(spark, root) == [1]
    # slot 0's record was removed — only the real commit's record stays
    assert _reserved_versions(spark, root) == [1]


def test_corrupt_slot_record_delete_failure_refuses(
    spark, tmp_path, monkeypatch
):
    """ADVICE r7 double-fault: when the corrupt-slot cleanup CANNOT
    remove the freshly-created record, commit_snapshot must refuse —
    continuing would leave a record paired with a foreign v=<n> dir,
    and committed_versions would report data the protocol never wrote
    as committed."""
    root = str(tmp_path / "race2")
    _race_fs(monkeypatch, fail_record_delete=True)
    with pytest.raises(IOError, match="legitimize"):
        commit_snapshot(spark, root, _write_payload(spark, 5))
    monkeypatch.undo()
    # the foreign dir carries no _SUCCESS: nothing reads as committed
    assert committed_versions(spark, root) == []


def test_exclusive_lock_acquires_when_parent_dir_missing(spark, tmp_path):
    """ADVICE r13 pin: the local-FS atomic path (createNewFile) must
    create missing parent directories the way Hadoop create() did
    implicitly — a lock under a not-yet-existing root acquires instead
    of raising IOException."""
    root = str(tmp_path / "never" / "made" / "ds")
    with exclusive_lock(spark, root, purpose="fresh-root"):
        pass
    # and again (release left the slot clean)
    with exclusive_lock(spark, root, purpose="fresh-root-2"):
        pass
