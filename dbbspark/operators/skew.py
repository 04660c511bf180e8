"""Skew handling: salted equi-join (SURVEY.md §7 scale pass).

A hot join key sends its entire partition to one reducer; AQE's skew-join
splitting (enabled in session.py) handles sort-merge skew transparently,
but when the skewed side joins a SMALL dimension the classic fix is
salting: replicate each dimension row `salt` times and scatter the big
side uniformly across the replicas, turning one hot partition into
`salt` even ones.

The salt value never reaches the result (it is dropped after the join),
so correctness is oracle-checkable against the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_equi_join(
    big: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join `big` to a small `dim` on `on`, scattering every (possibly
    hot) key across `salt` sub-partitions.

    Big side: uniform pseudorandom salt per row (seeded — rerun-stable at
    the partition level; the salt only balances, it never selects).
    Dim side: replicated salt 0..salt-1 via explode (|dim| × salt rows —
    the dimension must be small, which is exactly the skew scenario)."""
    big_s = big.withColumn("__salt", (F.rand(42) * salt).cast("int"))
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big_s.join(dim_s, [*on, "__salt"], how).drop("__salt")
