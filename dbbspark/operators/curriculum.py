"""Curriculum data ordering — deterministic easy→hard training schedules
(training-pipeline closure operator C53).

Curriculum recipes feed a model "easier" documents first (shorter /
higher-quality / lower-perplexity) and harden over training. The naive
form — ``ORDER BY difficulty`` — is a full global sort AND destroys
within-band randomness (a model must not see score-sorted batches). The
engine form here:

1. band assignment by score against `stages` quantile cuts — the cuts
   come from ONE `approxQuantile` pass (or are PASSED IN pinned, the
   same replay discipline as `dsir_sample`'s cut), and the comparison is
   a map-only expression;
2. within each band, the order key is a seeded xxhash64 of the id — the
   deterministic shuffle `global_shuffle` uses, so batches inside a band
   are well-mixed and a different `seed` (epoch) yields a different
   within-band order while the band SCHEDULE stays fixed;
3. materializing the order is `repartitionByRange` on (stage, order key)
   + in-partition sort — a sampled range exchange, never a single-task
   global sort.

Output rides every input column plus ``stage`` (0-based band) and
``order_key``; consumers zip it straight into `pack_sequences` (whose
id ordering becomes (stage, order_key) position) or write it
partitioned by ``stage``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def curriculum_stages(
    docs: DataFrame,
    score_col: str,
    stages: int = 4,
    cuts: list[float] | None = None,
) -> tuple[DataFrame, list[float]]:
    """(docs + `stage`, cuts): band 0 = lowest scores (easiest under a
    difficulty score; pass a negated score for the reverse). ``cuts``
    (stages-1 ascending thresholds) are computed by approxQuantile when
    not given — pass the returned list back in for exact replay."""
    if stages < 1:
        raise ValueError("stages must be >= 1")
    if cuts is None:
        qs = [i / stages for i in range(1, stages)]
        cuts = docs.approxQuantile(score_col, qs, 0.001) if stages > 1 else []
    expr = F.lit(0)
    for c in cuts:
        expr = expr + (F.col(score_col) > F.lit(float(c))).cast("int")
    return docs.withColumn("stage", expr), list(cuts)


def curriculum_order(
    docs: DataFrame,
    score_col: str,
    stages: int = 4,
    id_col: str = "doc_id",
    seed: int = 0,
    cuts: list[float] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Docs in curriculum order: band by score quantile, seeded-hash
    shuffle within each band, materialized by a range exchange on
    (stage, order_key) + in-partition sort. Deterministic for a given
    (cuts, seed) across partitionings and cluster sizes."""
    staged, _cuts = curriculum_stages(docs, score_col, stages, cuts)
    keyed = staged.withColumn(
        "order_key",
        F.xxhash64(F.col(id_col).cast("string"), F.lit(int(seed))),
    )
    n = num_partitions or keyed.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(
        n, F.col("stage"), F.col("order_key"), F.col(id_col)
    ).sortWithinPartitions("stage", "order_key", id_col)
