"""SparkSession construction with scale-oriented defaults.

The reference runs single-threaded Python (SURVEY.md §4); here all physical
concerns (vectorization, codegen, shuffle, spill, adaptive re-planning) are
delegated to Spark. The settings below are the ones that matter at 100 TB:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting,
  dynamic join-strategy demotion to broadcast),
- explicit shuffle-partition default sized for the local test harness
  (on a real cluster this is overridden; AQE coalesces the excess),
- Arrow enabled so pandas_udf extractors (SURVEY.md §2.10 U3) move data in
  columnar batches instead of row-at-a-time pickling,
- nanosAsLong so TIMESTAMP(NANOS) parquet (the `events` fixture) is
  readable; `tables.py` restores a proper TimestampType column.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs every entry point applies to whatever session it is
# handed (the verify driver owns session creation, so these must be settable
# on a live session — all of them are SQL runtime confs).
RUNTIME_CONFS: dict[str, str] = {
    # Deterministic time semantics: fixture timestamps are naive; interpret
    # them as UTC everywhere so date_format/unix-epoch math matches the
    # DuckDB oracle (which is timezone-naive).
    "spark.sql.session.timeZone": "UTC",
    # events.parquet stores TIMESTAMP(NANOS); Spark 4 refuses it unless
    # nanos are surfaced as long (tables.py converts back to timestamp).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Adaptive query execution: runtime shuffle coalescing + skew handling.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas_udf / toPandas boundaries.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # InferFiltersFromGenerate duplicates the generator's input expression
    # into a pre-Generate Filter (size(e)>0 AND isnotnull(e)). For cheap
    # array columns that's a win; for computed arrays (shingling, hashed
    # token transforms) it re-evaluates the whole interpreted transform per
    # row — measured 6× slowdown on the near-dedup operators. Our explode
    # inputs are always computed arrays, so exclude the rule.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
}


def _ship_package(spark: SparkSession) -> None:
    """Distribute the dbbspark package to Python workers via addPyFile.

    Arrow-batched operators (mapInPandas/applyInPandas closures) pickle
    module-level functions BY REFERENCE, so the worker process must be
    able to `import dbbspark` — true when the driver happens to run from
    the repo root, false for any external driver process (the verify
    harness, a spark-submit from elsewhere). Shipping the package as a
    zip is the production deployment step (--py-files) done lazily; in
    local mode it lands on the worker sys.path via SparkFiles. Guarded
    per-SparkContext (a second addPyFile of the same name would throw).
    """
    sc = spark.sparkContext
    if getattr(sc, "_dbbspark_shipped", False):
        return
    import tempfile
    import zipfile

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "dbbspark")
    fd, path = tempfile.mkstemp(suffix=".zip", prefix="dbbspark_pkg_")
    os.close(fd)
    with zipfile.ZipFile(path, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    sc.addPyFile(path)
    sc._dbbspark_shipped = True


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply deterministic/scale confs to an externally-created session."""
    try:
        _ship_package(spark)
    except Exception:
        # Shipping is best-effort: in-repo drivers work without it.
        pass
    confs = dict(RUNTIME_CONFS)
    # Small fixture files arrive as ONE split (< maxPartitionBytes), so
    # expression-heavy stages would run on a single core; a split floor
    # parallelizes MB-scale files. Round-4 measured three regimes
    # (one-split-per-core + 128 KB open cost, Spark defaults, and this
    # 8-split + 1 MB middle ground) INTERLEAVED within the same session
    # (diag_regression.py): per-query minima agree within 1-5% — the
    # apparent r3 per-query regressions were external machine
    # interference, not the confs. The middle ground is kept because it
    # creates the fewest tiny tasks while still splitting MB-scale
    # files; on real multi-file 100 TB inputs both values are no-ops
    # (files already exceed these floors).
    confs["spark.sql.files.minPartitionNum"] = "8"
    confs["spark.sql.files.openCostInBytes"] = str(1024 * 1024)
    for k, v in confs.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf locked down on this session build — leave as-is.
            pass
    return spark


def get_spark(app_name: str = "dbbspark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all local cores. On a real
    cluster the master/config come from spark-submit and this builder only
    contributes SQL confs.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.driver.memory", os.environ.get("DBBSPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
