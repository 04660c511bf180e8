"""Time-grid densification — filling the buckets that have no rows
(closure operator, SURVEY.md §2.11 C48).

Grouped time-series aggregates (ST6's tumbling windows, the monitor's
per-nite counts) silently OMIT empty buckets: a nite with zero arrivals
produces no row, and a downstream "count per nite" chart or lag/delta
window (W4) reads a gap as a skipped step instead of a zero. The
reference's monitor sidesteps this by iterating a driver-side nite range
(`bin/monitor_DBB_stagein.py:707-715` walks the last-N-nites list and
looks each nite up); the engine form is a SPINE JOIN:

1. per group, one tiny aggregate finds [min, max] bucket bounds
   (group-count rows, not data rows);
2. `sequence(min, max, step)` + explode generates the dense spine —
   parallel BY GROUP (each group's spine is its own row's explode, so
   no single-task global range and no driver loop);
3. left join data onto the spine; absent buckets surface with
   fill values (0 for counts, NULL for measures).

The spine explode is the one fan-out: its size is (range/step) rows per
group — the DENSE series a correct report must materialize anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def fill_time_gaps(
    aggregated: DataFrame,
    bucket_col: str,
    step: Column | str,
    group_cols: list[str] | None = None,
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """Densify an aggregated time series: one row per `step`-spaced
    bucket between each group's min and max bucket (inclusive).

    ``aggregated`` is the grouped result (e.g. window start + counts);
    ``bucket_col`` must be numeric or timestamp-like and step-aligned
    (the spine reproduces exactly the arithmetic sequence — rows off
    the grid would NOT join and is a caller bug). ``step`` is an
    INTERVAL expression string (e.g. "INTERVAL 1 DAY") for timestamps
    or a numeric step for numerics. ``fill`` maps measure columns to
    the value an empty bucket reports (unlisted columns fill NULL).
    Groups with a single bucket yield that bucket; an empty input
    yields an empty output (no global default range is invented).
    """
    group_cols = group_cols or []
    step_expr = F.expr(step) if isinstance(step, str) else step
    bounds = aggregated.groupBy(*group_cols).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    spine = bounds.select(
        *group_cols,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step_expr)).alias(
            bucket_col
        ),
    )
    # Null-SAFE join keys: a NULL group key is a legitimate group to
    # groupBy (the bounds row exists) but plain join equality can never
    # match it — the null group's REAL rows would silently come back as
    # fill values. The data side's keys are renamed before the join so
    # the eqNullSafe condition leaves no ambiguous attributes behind.
    keys = [*group_cols, bucket_col]
    data = aggregated
    for c in keys:
        data = data.withColumnRenamed(c, f"__k_{c}")
    cond = None
    for c in keys:
        e = spine[c].eqNullSafe(data[f"__k_{c}"])
        cond = e if cond is None else (cond & e)
    joined = spine.join(data, cond, "left").drop(*[f"__k_{c}" for c in keys])
    if fill:
        joined = joined.select(
            *group_cols,
            bucket_col,
            *[
                F.coalesce(F.col(c), F.lit(fill[c])).alias(c)
                if c in fill
                else F.col(c)
                for c in aggregated.columns
                if c != bucket_col and c not in group_cols
            ],
        )
    return joined
