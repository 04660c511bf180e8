"""The stage-in → archive ingest pipeline, batch and streaming.

Reference flow (`bin/save_DBB_stagein_to_DBB.py:120-217,221-293,308-321`):
scan notify dir → pair notify/data files → per file: parse notify,
filetype dispatch, duplicate gate, validity gate, metadata+checksum
extraction, md5 compare, path templating, copy+verify+retry, DB register,
commit, ack; failures → rollback + quarantine move + DBB_BAD_FILE insert.

Spark-native shape (SURVEY.md §3.1): the per-file loop disappears. One
declarative pipeline classifies the whole batch, then a single persisted
DataFrame feeds three sinks:

  pairs → filetype (P1) → md5 (F11/P3) → metadata extract (U3) →
  registry anti-join (J8/ST8) → reject-reason CASE (F16) →
      ├─ valid      → archive parquet, partitionBy(filetype, nite)  (S9)
      │               + registry append                             (S10)
      └─ rejected   → quarantine parquet, partitionBy(year, month)  (S11)

Exactly-once semantics (ST4): the reference's per-file commit/rollback is
replaced by (a) Spark's committed file output (no torn files), (b) the
registry anti-join making re-runs no-ops for already-ingested names, and
(c) the streaming checkpoint ensuring each notify file is processed by at
most one micro-batch. The notify-delete ack (`:198,293`) is subsumed by
(b)+(c) — re-presenting an ingested file classifies it as a duplicate.
The multi-sink batch is not atomic, but the DATA-PLANE sinks are
crash-replay idempotent: the archive write is partitioned by a
deterministic per-batch token (`batch=<token>` — the streaming epoch id
under foreachBatch; an order-independent content hash of the batch's
data names in cron/replay mode) and written with dynamic-partition
OVERWRITE, so a replay after a crash between the archive write and the
(deliberately last) registry append replaces its own crashed attempt's
rows instead of appending them twice — the same files-first/index-last
discipline the dedup gate family uses (streaming/mediadedup.py,
streaming/linededup.py). The registry stays exactly-once via the
duplicate gate + append-last ordering. The quarantine sink alone stays
append-mode: it is an audit LOG whose replays must add rows, never
rewrite history — a crash replay may leave a duplicate failure row
(distinct uniq name/timestamp), benign under its keep-last read
pattern.

Scale notes (100 TB, 1000 executors):
- data-file bytes never shuffle: pairing broadcasts the (tiny) notify
  side; classification is narrow (map-side) from scan to write;
- the registry gate joins on filename only — at billions of registry rows
  bucket the registry table by `filename` (`bucketBy(4096, "filename")`)
  so the anti-join is co-located instead of a full shuffle;
- archive writes are hash-partitioned by (filetype, nite) — the
  reference's `${band}/${nite}` directory templating (F6) expressed as
  data-driven layout, giving partition pruning to every downstream read;
  the trailing batch=<token> dir accumulates one entry per ingest batch
  (same shape as the gate indexes' batch dirs) — `compact_partitioned`
  with ["filetype", "nite", "batch"] (C24) bounds file/dir counts, and
  tokens never collide, so compacted history stays immutable;
- quarantine is a side output of the same scan (no second read).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..plans.keywords import KeywordSchema
from ..sources.multimodal import extract_kv_metadata
from ..sources.notify import NOTIFY_SUFFIX, parse_notify_binary, read_stagein_pairs

# Fixed schema of the binaryFile source (needed explicitly for readStream).
BINARY_FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)

# DBB_BAD_FILE-equivalent quarantine schema (bin/save_DBB_stagein_to_DBB.py
# :274-291); rows are projected onto exactly these columns (P8 column
# intersection).
BAD_FILE_COLUMNS = (
    "orig_filename",
    "rejected_msg",
    "rejected_date",
    "filesize",
    "filetype",
    "task_id",
    "uniq_fullname",
    "delivery_date",
)

REASON_MISSING_DATA = "missing data file"
REASON_UNKNOWN_FILETYPE = "unknown filetype"
REASON_CHECKSUM = "checksum mismatch"
REASON_MISSING_HEADER = "missing header value"
REASON_DUPLICATE = "duplicate file"


@dataclass(frozen=True)
class IngestConfig:
    notify_dir: str
    delivery_dir: str
    archive_root: str
    registry_path: str
    quarantine_path: str
    # filetype dispatch rules (P1): evaluated in order; first match wins.
    # (name, startswith-prefix or None, endswith-suffix or None)
    filetypes: tuple[tuple[str, str | None, str | None], ...] = (
        ("raw", None, ".fits"),
        ("snmanifest", "manifest_SN", ".json"),
    )
    # per-filetype declared metadata schema (Y/N/R; §1.1.2)
    keyword_schemas: dict[str, KeywordSchema] = field(default_factory=dict)


@dataclass(frozen=True)
class IngestResult:
    archived: int
    quarantined: int
    by_reason: dict[str, int]


def _filetype_col(cfg: IngestConfig) -> F.Column:
    """Extension-dispatch CASE chain (P1,
    bin/save_DBB_stagein_to_DBB.py:36-45)."""
    expr = F.lit(None).cast("string")
    for name, prefix, suffix in reversed(cfg.filetypes):
        cond = F.lit(True)
        if prefix:
            cond = cond & F.col("data_name").startswith(prefix)
        if suffix:
            cond = cond & F.col("data_name").endswith(suffix)
        expr = F.when(cond, F.lit(name)).otherwise(expr)
    return expr


def _registry_names(spark: SparkSession, cfg: IngestConfig) -> DataFrame:
    """Filenames already in the archive (duplicate gate J8). Narrow
    projection — only `filename` is read from the registry parquet.

    First-run detection goes through Spark's own filesystem layer (catch
    PATH_NOT_FOUND / empty-path AnalysisException), NOT os.path.exists:
    a driver-local stat always misses hdfs:// or s3a:// registry paths,
    which would silently disable the duplicate gate on exactly the
    deployments that need it."""
    try:
        return spark.read.parquet(cfg.registry_path).select(
            F.col("filename").alias("data_name")
        ).distinct()
    except AnalysisException:
        # registry not created yet (first ingest) — nothing registered.
        return spark.createDataFrame([], "data_name string")


def classify_pairs(
    spark: SparkSession, cfg: IngestConfig, pairs: DataFrame
) -> DataFrame:
    """Add filetype, md5, extracted metadata, duplicate flag, and the
    reject-reason CASE column to stage-in pairs. Pure transformation — no
    writes, no actions."""
    df = (
        pairs.withColumn("filetype", _filetype_col(cfg))
        .withColumn("md5sum", F.md5(F.col("content")))
        .withColumn(
            "nite",
            F.date_format(
                F.col("delivery_ts") - F.expr("INTERVAL 15 HOURS"), "yyyyMMdd"
            ),
        )
    )

    # Metadata extraction per filetype with a declared schema (U3). One
    # union branch per schema'd filetype keeps each mapInPandas schema
    # static; filetypes without a declared schema pass through.
    schemad = [ft for ft in cfg.keyword_schemas if cfg.keyword_schemas[ft].flags]
    if schemad:
        branches = []
        passthrough = df.where(
            ~F.col("filetype").isin(schemad) | F.col("filetype").isNull()
        )
        for ft in schemad:
            spec = cfg.keyword_schemas[ft]
            dec = {"decoder": spec.decoder} if spec.decoder else {}
            branch = extract_kv_metadata(
                df.where(F.col("filetype") == ft), spec.as_required_map(), **dec
            )
            branches.append(
                branch.withColumn("meta_json", F.to_json("meta")).drop("meta")
            )
        passthrough = passthrough.withColumn(
            "meta_json", F.lit(None).cast("string")
        ).withColumn(
            "meta_missing_required", F.lit(None).cast("array<string>")
        )
        df = branches[0]
        for b in branches[1:]:
            df = df.unionByName(b)
        df = df.unionByName(passthrough.select(*df.columns))
    else:
        df = df.withColumn("meta_json", F.lit(None).cast("string")).withColumn(
            "meta_missing_required", F.lit(None).cast("array<string>")
        )

    # Duplicate gate (J8/ST8): left join against registered names. The
    # indicator column avoids a second pass that a semi+anti pair would
    # need.
    reg = _registry_names(spark, cfg).withColumn("_registered", F.lit(True))
    df = df.join(reg, "data_name", "left")

    reason = (
        F.when(F.col("content").isNull(), REASON_MISSING_DATA)
        .when(F.col("_registered").isNotNull(), REASON_DUPLICATE)
        .when(F.col("filetype").isNull(), REASON_UNKNOWN_FILETYPE)
        .when(
            F.col("declared_md5").isNotNull()
            & (F.col("md5sum") != F.col("declared_md5")),
            REASON_CHECKSUM,
        )
        .when(
            F.size(F.coalesce(F.col("meta_missing_required"), F.array())) > 0,
            REASON_MISSING_HEADER,
        )
    )
    return df.withColumn("reject_reason", reason).drop("_registered")


def _registry_partitioned(spark: SparkSession, path: str) -> bool:
    """True iff the registry at `path` should be written nite-partitioned:
    a not-yet-created registry (new default) or one already carrying
    nite= partition dirs. A legacy registry holding data files at its
    root keeps appending unpartitioned — a mixed layout is unreadable.
    One FileSystem listing, via the JVM layer so hdfs://-s3a:// paths
    behave like local ones (same rationale as `_registry_names`)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return True
    has_root_data = False
    for s in fs.listStatus(p):
        name = s.getPath().getName()
        if s.isDirectory() and name.startswith("nite="):
            return True
        if not s.isDirectory() and not name.startswith(("_", ".")):
            has_root_data = True
    return not has_root_data


def _batch_token(classified: DataFrame) -> str:
    """Deterministic, order/partition-independent token for a batch:
    a commutative hash-sum over the batch's data names (+ row count), so
    a crash replay of the SAME batch derives the SAME token and its
    dynamic-partition overwrite replaces the crashed attempt's rows.
    Shuffle-free (one partial-aggregated sum — no collect_list row that
    would grow with batch size)."""
    from ..operators.dedup import md5_int_col

    row = classified.agg(
        F.sum(md5_int_col(F.col("data_name")) % F.lit(1_000_000_007)).alias("s"),
        F.count("*").alias("n"),
    ).first()
    return f"c{(row['s'] or 0) % (1 << 60):x}n{row['n']}"


def _write_sinks(
    classified: DataFrame,
    cfg: IngestConfig,
    task_id: str | None,
    batch_token: str | None = None,
) -> IngestResult:
    """Fan the classified batch into archive + registry + quarantine.

    ``batch_token`` keys the archive/quarantine dynamic-partition
    overwrite (crash-replay idempotence, module docstring); both the
    streaming and cron/replay paths derive a content token (explicit
    tokens are honored but must be globally unique — see ingest_batch)."""
    classified = classified.withColumn(
        "task_id", F.lit(task_id).cast("string")
    ).persist()
    try:
        if batch_token is None:
            batch_token = _batch_token(classified)
        valid = classified.where(F.col("reject_reason").isNull())
        rejected = classified.where(F.col("reject_reason").isNotNull())

        # S9: archive placement — partitioned layout replaces the
        # reference's per-file templated copy (+retry+verify: Spark's file
        # committer makes verify-after-copy unnecessary, SURVEY.md §4).
        # The trailing batch=<token> partition + dynamic overwrite makes a
        # crash replay REPLACE its own prior attempt (exactly-once archive
        # under the crash window between this write and the registry
        # append); (filetype, nite) stay leading partition columns, so
        # downstream pruning is unchanged.
        (
            valid.select(
                F.col("data_name").alias("filename"),
                "content",
                "md5sum",
                "filesize",
                "delivery_ts",
                "meta_json",
                "task_id",
                "filetype",
                "nite",
                F.lit(batch_token).alias("batch"),
            ).write.partitionBy("filetype", "nite", "batch")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(cfg.archive_root)
        )

        # S11: quarantine dead-letter, partitioned by rejection year/month
        # with a collision-proof uniq name (ref `:255-259`), projected onto
        # the DBB_BAD_FILE-style columns (P8).
        bad = (
            rejected.withColumn("rejected_date", F.current_timestamp())
            .withColumn(
                "uniq_fullname",
                F.concat_ws(
                    ".",
                    F.col("data_name"),
                    F.date_format("rejected_date", "yyyyMMddHHmmssSSS"),
                ),
            )
            .select(
                F.col("data_name").alias("orig_filename"),
                F.col("reject_reason").alias("rejected_msg"),
                "rejected_date",
                "filesize",
                "filetype",
                "task_id",
                "uniq_fullname",
                F.col("delivery_ts").alias("delivery_date"),
                F.year("rejected_date").alias("reject_year"),
                F.month("rejected_date").alias("reject_month"),
            )
        )
        bad = bad.select(
            *[c for c in BAD_FILE_COLUMNS if c in bad.columns],
            "reject_year",
            "reject_month",
        )
        # Quarantine stays APPEND on purpose: it is an append-only failure
        # LOG (re-replays must add rows, never rewrite history — a
        # batch-token overwrite would erase the previous attempt's row
        # when the same all-failed name set fails again). A crash replay
        # can therefore add a second, later-timestamped row for the same
        # failure — benign in a log whose current-state queries already
        # take the latest row per filename (keep-last, q_window_dedup
        # shape). The DATA-PLANE sinks (archive, registry) are the
        # exactly-once ones.
        bad.write.partitionBy("reject_year", "reject_month").mode(
            "append"
        ).parquet(cfg.quarantine_path)

        by_reason = {
            r["reject_reason"]: r["cnt"]
            for r in classified.groupBy("reject_reason")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        archived = by_reason.pop(None, 0)

        # S10: registry append (no bytes — narrow rows). MUST be the LAST
        # action of the batch: the classification plan READS the registry
        # (duplicate gate), and under foreachBatch the persisted cache is
        # not reliably hit across actions — an action executed after this
        # append would re-evaluate the gate against a registry that
        # already contains the batch's own files and misclassify them as
        # duplicates.
        #
        # r11: written PARTITIONED BY nite, so takedown/compaction can
        # rewrite only the matched nite partitions instead of the whole
        # relation (at 100 TB the registry is billions of rows; a
        # whole-relation rewrite per takedown was the r10 scale gap). A
        # registry that already exists UNPARTITIONED keeps appending
        # unpartitioned — mixing data files at the root with nite= dirs
        # would make the dataset unreadable; takedown's layout probe
        # handles either form.
        reg_writer = valid.select(
            F.col("data_name").alias("filename"),
            "md5sum",
            "filesize",
            "filetype",
            "nite",
            F.col("delivery_ts").alias("delivery_date"),
            "task_id",
        ).write.mode("append")
        spark = classified.sparkSession
        if _registry_partitioned(spark, cfg.registry_path):
            reg_writer = reg_writer.partitionBy("nite")
        reg_writer.parquet(cfg.registry_path)
        return IngestResult(
            archived=archived,
            quarantined=sum(by_reason.values()),
            by_reason=by_reason,
        )
    finally:
        classified.unpersist()


def ingest_batch(
    spark: SparkSession,
    cfg: IngestConfig,
    task_id: str | None = None,
    notify_df: DataFrame | None = None,
    batch_token: str | None = None,
) -> IngestResult:
    """One ingest pass over the stage-in area (the cron-invoked batch,
    ST1). Idempotent two ways: a second run after SUCCESS classifies
    everything as duplicates and appends nothing to archive or registry;
    a replay after a CRASH between the archive write and the registry
    append derives the same content-hash ``batch_token`` and its dynamic
    overwrite replaces the crashed attempt's archive rows (both tested
    in tests/test_ingest.py). Streaming derives the same content token
    (an explicit epoch-style token remains supported for callers with
    their own globally-unique batch ids, but epoch ids that can restart
    at 0 — checkpoint resets, multiple streams on one archive — must
    NOT be used: token reuse dynamic-overwrites a prior batch's
    partition)."""
    # Persist the paired batch: the valid/missing union and the
    # per-filetype metadata branches each re-derive from it, and without a
    # cache every branch re-reads the stage-in files (measured 3× file
    # I/O). MEMORY_AND_DISK (default) spills oversized batches; batch size
    # itself is bounded by the streaming trigger (maxFilesPerTrigger).
    pairs = read_stagein_pairs(
        spark, cfg.notify_dir, cfg.delivery_dir, notify_df=notify_df
    ).persist()
    try:
        classified = classify_pairs(spark, cfg, pairs)
        return _write_sinks(classified, cfg, task_id, batch_token=batch_token)
    finally:
        pairs.unpersist()


def start_ingest_stream(
    spark: SparkSession,
    cfg: IngestConfig,
    checkpoint_dir: str,
    task_id: str | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
    max_files_per_trigger: int | None = None,
):
    """Streaming front-end (ST1-ST4): notify files drive the stream; each
    micro-batch runs the same classify+fan-out core via foreachBatch.

    - trigger(availableNow=True) = the cron-compatible drain-and-exit mode;
      a `processing_time` trigger gives the long-running daemon mode.
    - the checkpoint dir is the reference's singleton lock (§2.9 ST1): one
      active query per checkpoint, restarts resume without reprocessing.
    - completeness (ST2): only the notify stream triggers work; the data
      file is picked up by the per-batch pairing join, so a data file with
      no notify is never touched.
    """
    reader = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", f"*{NOTIFY_SUFFIX}")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(cfg.notify_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        notify = parse_notify_binary(batch_df)
        # batch_token=None => the content-hash token (_batch_token) is
        # derived inside _write_sinks, exactly as in the cron path. The
        # epoch id (f"b{batch_id}") is NOT a safe token here: epoch ids
        # restart at 0 after a checkpoint reset, and two streams sharing
        # one archive root each count from 0 — a later batch writing the
        # same (filetype, nite, batch=b0) leaf would dynamic-overwrite
        # (silently DELETE) the earlier batch's archived rows while the
        # registry still listed them. The content token is globally
        # unique per batch content and still replay-stable (a crash
        # replay of the same epoch re-derives the same token).
        ingest_batch(spark, cfg, task_id=task_id, notify_df=notify)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def replay_quarantine(
    spark: SparkSession,
    cfg: IngestConfig,
    reasons: tuple[str, ...] | None = None,
    task_id: str | None = None,
) -> IngestResult:
    """Re-run the ingest gate over previously-quarantined files (the
    operator workflow behind the reference's DBB_BAD_FILE table: fix the
    cause — corrected notify metadata, registry cleanup, restored data
    file — then re-stage; bin/save_DBB_stagein_to_DBB.py:274-291 keeps
    the failure rows precisely so this is possible).

    Reads the quarantine table (optionally only ``reasons``), re-pairs
    the named files from the CURRENT stage-in area, and pushes them
    through the SAME classify + sinks path as a normal batch: files whose
    cause was fixed archive + register; files that fail again append a
    fresh quarantine row (new uniq name) — so replay is idempotent and
    the quarantine stays an append-only failure LOG (history is never
    rewritten; current-state queries use the latest row per filename,
    the keep-last dedup shape of q_window_dedup).

    Scale: the quarantine name set is small (failures, not the corpus) —
    it broadcasts into a semi-join against the re-scanned pairing, so
    the byte-carrying side never shuffles."""
    bad = spark.read.parquet(cfg.quarantine_path)
    if reasons:
        bad = bad.where(F.col("rejected_msg").isin(list(reasons)))
    names = bad.select(
        F.col("orig_filename").alias("data_name")
    ).distinct()
    pairs = (
        read_stagein_pairs(spark, cfg.notify_dir, cfg.delivery_dir)
        .join(F.broadcast(names), "data_name", "left_semi")
        .persist()
    )
    try:
        classified = classify_pairs(spark, cfg, pairs)
        return _write_sinks(classified, cfg, task_id)
    finally:
        pairs.unpersist()
