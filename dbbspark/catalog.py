"""Registry of declared queries.

Every operator in SURVEY.md §2 with a "Declared query" name registers here:
a Spark DataFrame builder plus (when SQL-expressible) the ANSI-SQL DuckDB
oracle the verify driver hash-compares against. `__spark_entry__.py` is a
thin re-export of this registry.

Contract reminders (driver semantics):
- compare is row-count + schema + order-insensitive value hash, with
  columns sorted by name → every computed column must carry the SAME alias
  in the Spark plan and the oracle SQL;
- float discipline: money-style sums go through DECIMAL(18,2) in BOTH
  engines (exact) and are cast back to double; outputs avoid raw
  accumulated floats wherever ordering suffices.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


CATALOG: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a declared query."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        CATALOG[name] = QuerySpec(name=name, builder=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return wrap


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return the
    full catalog."""
    from .queries import (  # noqa: F401
        scalars,
        filters,
        joins,
        aggregates,
        windows,
        sets,
        reconcile,
        dedup,
        similarity,
        text,
        streaming_batch,
        multimodal,
    )

    return CATALOG
