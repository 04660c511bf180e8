"""Lightweight multi-writer commit protocol for versioned snapshot
datasets (VERDICT r5 item 1 — the concurrency layer the single-writer
``batch=<id>`` / ``v=<id>`` idempotence story was missing).

The reference ran every registry mutation inside a per-file database
transaction (`bin/save_DBB_stagein_to_DBB.py:197,225` — Oracle commits),
so two pipelines touching the same state serialized in the DB. This
engine's state lives on a filesystem, where the only atomic multi-writer
primitives Hadoop guarantees everywhere (HDFS, local; object stores via
their committers) are:

- ``FileSystem.create(path, overwrite=false)`` — create-exclusive:
  exactly one of N racing writers succeeds (the CAS);
- ``FileSystem.rename(src, dst)`` — atomic move of a finished directory.

This module composes them into the standard log-structured commit
protocol (the same shape Delta/Iceberg use, reduced to its kernel):

Layout::

    <root>/v=<n>/...            committed snapshot n (holds _SUCCESS)
    <root>/_commits/<n>         commit-log record — RESERVES slot n
    <root>/_staging/<token>/    writer-private staging area

Writer protocol (``commit_snapshot``):

1. write the full snapshot into a private ``_staging/<token>/`` dir
   (Spark drops a ``_SUCCESS`` marker when the job finishes);
2. CAS-reserve the next slot: n = max(reserved ∪ committed) + 1, then
   ``create(_commits/<n>, overwrite=false)``. A loser gets
   FileAlreadyExists, re-lists, and retries at a higher n — nobody
   blocks, nobody overwrites;
3. rename ``_staging/<token>`` → ``v=<n>``. The destination cannot
   exist: only the slot owner may create it (Hadoop rename would
   otherwise move the source INTO an existing dir — the exact
   interleaving hazard raw two-rename swaps have).

A writer crashing between 2 and 3 burns slot n (record, no data);
readers skip it and later writers reserve past it — a monotonic log
with holes, never a lost or half-visible snapshot.

Reader protocol (``committed_versions`` / ``latest_snapshot``): a
version counts only when BOTH its commit record and its
``v=<n>/_SUCCESS`` exist. Readers racing a commit see the previous
snapshot or the new one, never a partial one.

For operations that rewrite a dataset in place (the compaction swaps in
maintenance.py), ``exclusive_lock`` provides the loser-aborts mutex:
create-exclusive on ``<root>.lock`` with an owner token; the loser
raises ``ConcurrentWriteError`` instead of interleaving renames. The
lock file records owner + wall-clock so an operator can inspect and
(explicitly, ``break_stale_after``) clear one left by a crashed job.
"""

from __future__ import annotations

import json
import time
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from .maintenance import _fs_and_path


class ConcurrentWriteError(RuntimeError):
    """Another writer holds the lock / won the slot; caller should abort
    (and may retry from scratch — all protocol steps are restartable)."""


def _commits_dir(root: str) -> str:
    return f"{root.rstrip('/')}/_commits"


def _reserved_versions(spark: SparkSession, root: str) -> list[int]:
    """Slot numbers with a commit-log record (committed OR burned).

    A MISSING directory is []; any other filesystem error PROPAGATES
    (self-review r6): swallowing it would read as "no versions exist",
    and a reader acting on that — e.g. the ANN drift gate deciding this
    is a first run — would overwrite newer state with stale state."""
    fs, cdir, jvm = _fs_and_path(spark, _commits_dir(root))
    if not fs.exists(cdir):
        return []
    out = []
    for st in fs.listStatus(cdir):
        try:
            out.append(int(st.getPath().getName()))
        except ValueError:
            continue
    return sorted(out)


def committed_versions(spark: SparkSession, root: str) -> list[int]:
    """Snapshot numbers that are fully committed: commit-log record AND
    ``v=<n>/_SUCCESS`` present. Ascending; [] when none (missing root is
    []; real filesystem errors propagate — see `_reserved_versions`)."""
    fs, hroot, jvm = _fs_and_path(spark, root)
    if not fs.exists(hroot):
        return []
    Path = jvm.org.apache.hadoop.fs.Path
    reserved = set(_reserved_versions(spark, root))
    out = []
    for st in fs.listStatus(hroot):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("v=")):
            continue
        try:
            n = int(name[2:])
        except ValueError:
            continue
        if n in reserved and fs.exists(Path(st.getPath(), "_SUCCESS")):
            out.append(n)
    return sorted(out)


def latest_snapshot(spark: SparkSession, root: str) -> tuple[int, str] | None:
    """(version, path) of the newest committed snapshot, or None."""
    vs = committed_versions(spark, root)
    if not vs:
        return None
    return vs[-1], f"{root.rstrip('/')}/v={vs[-1]}"


def _create_exclusive(fs, jvm, path_str: str, payload: str) -> bool:
    """create-if-absent + write payload; False if it lost the race (the
    only expected failure — anything else re-raises).

    On HDFS-like filesystems ``create(path, overwrite=false)`` is the
    namenode-atomic CAS this module is built on. On the LOCAL
    filesystem it is NOT: RawLocalFileSystem implements it as an
    exists() check followed by an open — two processes releasing
    simultaneously can BOTH pass the check and both believe they hold
    the lock (caught by the r13 two-process gate-vs-takedown race test:
    the takedown swapped index files out from under the gate's scan).
    The ``file:`` scheme therefore routes through
    ``java.io.File.createNewFile()``, whose existence check + creation
    are a single atomic operation (O_CREAT|O_EXCL), and only then
    writes the payload through the Hadoop stream (safe: the slot is
    already owned; a concurrent stale-breaker reads a same-aged empty
    file and does not break it)."""
    Path = jvm.org.apache.hadoop.fs.Path
    p = Path(path_str)
    try:
        scheme = fs.getUri().getScheme()
    except Exception:
        scheme = None
    if scheme == "file":
        raw = path_str
        if raw.startswith("file:"):
            from urllib.parse import urlparse

            raw = urlparse(raw).path
        f = jvm.java.io.File(raw)
        # Hadoop's create() made parents implicitly; createNewFile()
        # throws IOException on a missing parent instead (ADVICE r13) —
        # mkdirs first so a fresh root acquires rather than erroring.
        # Note: between createNewFile() and the payload write below the
        # lock exists EMPTY for a moment; a concurrent stale-breaker
        # compares ages, not contents, so an empty same-aged file is
        # never broken (see lock_break_stale_after).
        parent = f.getParentFile()
        if parent is not None and not parent.exists():
            parent.mkdirs()
        if not f.createNewFile():
            return False
        out = fs.create(p, True)
    else:
        try:
            out = fs.create(p, False)
        except Exception as e:  # FileAlreadyExistsException (or wrapped)
            name = type(e).__name__
            msg = str(e)
            if (
                "AlreadyExists" in msg
                or "already exists" in msg
                or "Exists" in name
            ):
                return False
            raise
    try:
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()
    return True


def commit_snapshot(
    spark: SparkSession,
    root: str,
    write_fn,
    max_attempts: int = 20,
) -> tuple[int, str]:
    """Stage-then-CAS commit of one snapshot; safe under any number of
    concurrent writers. ``write_fn(staging_path)`` must write a complete
    Spark dataset (parquet/json — anything that drops ``_SUCCESS``) to
    the given path. Returns (version, committed_path).

    The staged data is written ONCE; only the cheap slot reservation
    retries on contention, so N racing writers produce N consecutive
    snapshots, each complete, in commit-record order."""
    root = root.rstrip("/")
    token = uuid.uuid4().hex
    staging = f"{root}/_staging/{token}"
    fs, hroot, jvm = _fs_and_path(spark, root)
    Path = jvm.org.apache.hadoop.fs.Path
    record = json.dumps(
        {"token": token, "ts": time.time(), "writer": "dbbspark"}
    )
    try:
        write_fn(staging)
        fs.mkdirs(Path(_commits_dir(root)))
        for _ in range(max_attempts):
            # Reserve past existing v= DATA dirs too, not just records:
            # a data-without-record dir (foreign/corrupt) must never pair
            # with a fresh record — committed_versions would then report
            # data the protocol never wrote as committed (ADVICE r6).
            reserved = _reserved_versions(spark, root)
            data_dirs = []
            if fs.exists(hroot):
                for st in fs.listStatus(hroot):
                    name = st.getPath().getName()
                    if st.isDirectory() and name.startswith("v="):
                        try:
                            data_dirs.append(int(name[2:]))
                        except ValueError:
                            continue
            taken = reserved + data_dirs
            n = (max(taken) + 1) if taken else 0
            if _create_exclusive(fs, jvm, f"{_commits_dir(root)}/{n}", record):
                dest = Path(f"{root}/v={n}")
                if fs.exists(dest):
                    # a corrupt slot materialized between the list and
                    # the CAS — remove the record we just created (it
                    # must not legitimize data we never wrote) and take
                    # the next slot. The delete is VERIFIED (ADVICE r7):
                    # if it fails and the record survives, a foreign
                    # v=<n>/_SUCCESS would make committed_versions
                    # report data the protocol never wrote as committed
                    # — refuse rather than leak the record.
                    rec = Path(f"{_commits_dir(root)}/{n}")
                    try:
                        fs.delete(rec, False)
                    except Exception:
                        pass
                    if fs.exists(rec):
                        raise IOError(
                            f"commit_snapshot: slot {n} under {root} is "
                            f"occupied by a foreign v={n} dir and the "
                            "reserved commit record could not be removed "
                            "— refusing to leave a record that would "
                            "legitimize data the protocol never wrote"
                        )
                    continue
                if not fs.rename(Path(staging), dest):
                    raise IOError(
                        f"commit_snapshot: rename {staging} -> v={n} failed"
                    )
                return n, f"{root}/v={n}"
        raise ConcurrentWriteError(
            f"commit_snapshot: could not reserve a slot under {root} after "
            f"{max_attempts} attempts"
        )
    except BaseException:
        # never leak the staged snapshot copy on failure (self-review r6)
        try:
            fs.delete(Path(staging), True)
        except Exception:
            pass
        raise


def prune_snapshots(
    spark: SparkSession, root: str, keep_last: int = 2
) -> list[int]:
    """Delete all but the newest ``keep_last`` committed snapshots (data
    dirs only — commit records stay, keeping the version counter
    monotonic). Returns the versions removed. Safe concurrently: deleting
    an already-deleted dir is a no-op, and the newest snapshots are never
    touched."""
    vs = committed_versions(spark, root)
    drop = vs[:-keep_last] if keep_last > 0 else vs
    if not drop:
        return []
    fs, hroot, jvm = _fs_and_path(spark, root)
    Path = jvm.org.apache.hadoop.fs.Path
    for n in drop:
        try:
            fs.delete(Path(f"{root.rstrip('/')}/v={n}"), True)
        except Exception:
            pass
    return drop


def prune_commit_records(
    spark: SparkSession, root: str, older_than_sec: float = 86400.0
) -> list[int]:
    """Delete commit-log records that no longer gate anything — the
    record-side counterpart of `prune_snapshots` (r7: the 50-batch gate
    soak showed `_commits` growing one tiny file per trigger forever,
    and every reader lists it, an O(N²) cost over a stream's life).

    A record is prunable when ALL of:
    - its data dir is gone (pruned snapshot or burned slot) — a record
      paired with live data must survive, deleting it would un-commit
      the snapshot;
    - it is not the NEWEST record — the max record alone keeps the slot
      counter monotonic (max+1 reservation never regresses because every
      deletion leaves a higher record in place);
    - it is older than ``older_than_sec`` — a just-created record may
      belong to a LIVE writer between its CAS and its rename; reaping it
      would make that writer's about-to-land data dir recordless and
      invisible. Same age-horizon contract as `gc_staging`: only pass 0
      against a quiesced dataset."""
    reserved = _reserved_versions(spark, root)
    if len(reserved) <= 1:
        return []
    committed = set(committed_versions(spark, root))
    newest = reserved[-1]
    fs, _, jvm = _fs_and_path(spark, root)
    Path = jvm.org.apache.hadoop.fs.Path
    now = time.time()
    removed = []
    for n in reserved:
        if n == newest or n in committed:
            continue
        p = Path(f"{_commits_dir(root)}/{n}")
        try:
            age = now - fs.getFileStatus(p).getModificationTime() / 1000.0
            if age > older_than_sec and fs.delete(p, False):
                removed.append(n)
        except Exception:
            continue  # raced with another pruner / vanished: not ours
    return removed


def gc_staging(
    spark: SparkSession, root: str, older_than_sec: float = 86400.0
) -> list[str]:
    """Remove orphaned ``_staging/<token>`` dirs left by writers that
    died WITHOUT in-process cleanup (SIGKILL/OOM between the staging
    write and the commit rename — `commit_snapshot`'s except-path only
    runs when the process survives to raise). Anything still under
    ``_staging`` is uncommitted by construction: the winning rename
    MOVES the staging dir into ``v=<n>``, so committed data is immune.

    A dir is an orphan when the newest modification time anywhere in its
    tree is older than ``older_than_sec``. The horizon MUST exceed the
    longest plausible snapshot write plus the write→rename gap (same
    contract as table-format VACUUM retention): gc'ing a live writer's
    staging fails THAT writer — its staging write dies mid-job or its
    commit rename fails — an aborted write, never a corrupt or
    half-visible snapshot (chaos-pinned in test_commit). Returns the
    deleted paths."""
    sdir = f"{root.rstrip('/')}/_staging"
    fs, spath, jvm = _fs_and_path(spark, sdir)
    if not fs.exists(spath):
        return []
    now = time.time()
    removed = []
    for st in fs.listStatus(spath):
        if not st.isDirectory():
            continue
        try:
            newest = st.getModificationTime() / 1000.0
            it = fs.listFiles(st.getPath(), True)
            while it.hasNext():
                newest = max(newest, it.next().getModificationTime() / 1000.0)
        except Exception:
            # a concurrent writer's winning commit RENAMES its staging
            # dir away between our listStatus and this walk — that entry
            # is simply no longer gc's business; skip, don't crash the
            # sweep (the racing-writer scenario is the module's reason
            # to exist)
            continue
        if now - newest > older_than_sec:
            if fs.delete(st.getPath(), True):
                removed.append(str(st.getPath().toUri().getPath()))
    return removed


@contextmanager
def exclusive_lock(
    spark: SparkSession,
    root: str,
    purpose: str = "maintenance",
    break_stale_after: float | None = None,
    wait: float = 0.0,
    poll: float = 0.25,
):
    """Loser-aborts mutex for in-place rewrites (compaction swaps).

    Acquires ``<root>.lock`` via create-exclusive; a second concurrent
    acquirer raises ConcurrentWriteError immediately (no blocking — at
    cluster scale a queued compaction is better re-scheduled than
    silently serialized). Released on exit, including on error.

    ``wait`` (seconds, default 0 = loser-aborts) turns acquisition into
    a BOUNDED retry-with-backoff: re-attempt every ``poll`` seconds
    (doubling up to 2 s) until acquired or the horizon passes, then
    raise. This is the streaming-gate mode — a gate micro-batch
    contending with a brief maintenance swap (compaction, takedown leg)
    should ride it out rather than fail the foreachBatch and terminate
    the whole streaming query; maintenance jobs keep the abort default
    because a queued compaction is better re-scheduled.

    ``break_stale_after`` (seconds) lets an explicit operator decision
    clear a lock left by a crashed job: if the existing lock's recorded
    timestamp is older than the horizon, it is deleted and acquisition
    retried ONCE. Never the default — a long-running legitimate holder
    is indistinguishable from a crash by mtime alone.

    Release is OWNERSHIP-CHECKED (self-review r6): the lock file carries
    this holder's token, and both release and stale-break re-read the
    file and act only when the content matches what they observed — a
    holder outlived by a stale-break must not delete the NEW holder's
    lock (that would re-open the interleaved-rename window the lock
    exists to close), and two racing breakers must not both acquire.

    Residual window, by design: between the breaker's content re-read
    and its delete, a brand-new holder could acquire and be deleted —
    unavoidable for ANY delete-based break without server-side fencing
    (rename-based variants just move the double-hold to the restore
    path). That is WHY ``break_stale_after`` is an explicit operator
    decision on a lock already diagnosed as crashed, never an automatic
    retry policy."""
    lock_path = f"{root.rstrip('/')}.lock"
    fs, _, jvm = _fs_and_path(spark, root)
    Path = jvm.org.apache.hadoop.fs.Path
    token = uuid.uuid4().hex
    payload = json.dumps({"token": token, "ts": time.time(), "purpose": purpose})

    def read_lock() -> str | None:
        try:
            stream = fs.open(Path(lock_path))
            try:
                data = bytearray()
                while True:
                    b = stream.read()
                    if b < 0:
                        break
                    data.append(b)
                return bytes(data).decode("utf-8", "replace")
            finally:
                stream.close()
        except Exception:
            return None  # vanished / unreadable

    def attempt() -> bool:
        got = _create_exclusive(fs, jvm, lock_path, payload)
        if not got and break_stale_after is not None:
            observed = read_lock()
            try:
                st = fs.getFileStatus(Path(lock_path))
                age = time.time() - st.getModificationTime() / 1000.0
            except Exception:
                age = float("inf")  # vanished between create and stat: retry
            if age > break_stale_after and read_lock() == observed:
                fs.delete(Path(lock_path), False)
                got = _create_exclusive(fs, jvm, lock_path, payload)
        return got

    got = attempt()
    if not got and wait > 0:
        deadline = time.monotonic() + wait
        backoff = max(poll, 0.01)
        while not got and time.monotonic() < deadline:
            time.sleep(min(backoff, max(0.0, deadline - time.monotonic())))
            backoff = min(backoff * 2, 2.0)
            got = attempt()
    if not got:
        raise ConcurrentWriteError(
            f"{root}: another writer holds {lock_path}; aborting "
            f"({purpose})"
        )
    try:
        yield token
    finally:
        try:
            current = read_lock()
            if current is not None:
                try:
                    owner = json.loads(current).get("token")
                except ValueError:
                    owner = None
                if owner == token:
                    fs.delete(Path(lock_path), False)
        except Exception:
            pass


def read_latest(spark: SparkSession, root: str) -> DataFrame | None:
    """spark.read.parquet of the newest committed snapshot, or None."""
    latest = latest_snapshot(spark, root)
    if latest is None:
        return None
    return spark.read.parquet(latest[1])


def read_snapshot(spark: SparkSession, root: str, version: int) -> DataFrame:
    """Time-travel read of committed snapshot ``version`` (snapshots are
    immutable once committed, so any retained version reproduces a past
    gate/index state exactly). Raises ValueError when the version is not
    fully committed — burned slot, pruned, or never reserved — instead
    of letting a raw path read return partial or missing data."""
    if version not in committed_versions(spark, root):
        raise ValueError(
            f"{root}: version {version} is not a committed snapshot "
            "(burned, pruned, or never committed)"
        )
    return spark.read.parquet(f"{root.rstrip('/')}/v={version}")
