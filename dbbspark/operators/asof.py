"""As-of (time-travel) join — SURVEY.md §2.3 J9, the two-table form.

Matches every left row to the LAST right row whose timestamp is ≤ the
left row's timestamp, per key — the standard market-data/"latest config
wins" join that Spark lacks natively.

Implementation: union-timeline. Right rows enter the timeline carrying
their value, left rows carry their payload; one window per key ordered by
(ts, side) propagates the last seen right value onto each left row
(right sorts before left at equal ts ⇒ inclusive match). Cost: ONE
shuffle of |L|+|R| rows on the key and a single window pass — no range
join, no per-row probe. The same shuffle also co-partitions perfectly at
100 TB (key-partitioned, time-sorted within partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every `left` row + the most recent `right`
    ``value_col`` with ``right_ts <= left_ts`` for the same ``on`` key
    (NULL when no prior right row exists).

    Ties inside `right` at identical (key, ts) are resolved
    last-wins-by-value (deterministic); pre-aggregate `right` if another
    rule is needed.

    NULL keys follow join semantics: an unknown key matches nothing, so
    a null-key left row comes back with a NULL ``out_col`` (it is never
    silently paired with null-key right rows — the union-timeline
    formulation would otherwise treat NULL as a real group, which no
    SQL join does). Null-key rows are also salted out of the key
    shuffle so they cannot pile onto one task.
    """
    out_col = out_col or f"asof_{value_col}"
    l_rows = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(dict(right.dtypes)[value_col]).alias("__val"),
        F.struct(*left.columns).alias("__payload"),
    )
    # null-key right rows can never be anyone's match — drop them from
    # the timeline instead of letting them form a NULL "group"
    r_rows = right.where(F.col(on).isNotNull()).select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(value_col).alias("__val"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{t}" for c, t in left.dtypes) + ">"
        ).alias("__payload"),
    )
    # null-key left rows: out_col is NULL by construction (no right rows
    # share their salted partition, and fellow left rows carry null
    # __val), so ANY salt yields the same result — spread them by
    # timestamp, which is deterministic under task retries
    salt = F.when(
        F.col("__key").isNull(), F.xxhash64("__ts")
    ).otherwise(F.lit(0))
    w = (
        Window.partitionBy("__key", salt)
        .orderBy("__ts", "__side", "__val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    timeline = l_rows.unionByName(r_rows).withColumn(
        out_col, F.last("__val", ignorenulls=True).over(w)
    )
    return timeline.where(F.col("__side") == 1).select("__payload.*", out_col)
