"""dbbspark — a PySpark-native analytics engine with the query and
data-processing capabilities of lsst-dm/ctrl_DBB_stagein_to_DBB.

The reference (see SURVEY.md) is a file-ingestion + metadata/provenance ETL
pipeline whose analytics are hand-rolled row-at-a-time Python. This package
re-expresses every one of its operators (SURVEY.md §2) as declarative
DataFrame/SQL plans that Catalyst can optimize, plus the LLM-data-pipeline
closure operators (dedup, similarity search, multimodal columns, text
analysis) designed for 100 TB scale.

Layout:
  session    — SparkSession construction with scale-tuned defaults
  tables     — fixture-table loading (nanos-timestamp handling, views)
  domain     — the reference's SISPI/DESDM/failure data model mapped onto
               the synthetic fixture tables (FIXTURES.md §3)
  catalog    — registry of declared queries + their DuckDB oracle SQL
  queries/   — one module per operator layer of SURVEY.md §2
  operators/ — reusable operators (dedup/clustering, similarity, asof,
               intervals, skew salting, bucketing)
  sources/   — notify-dir scan + pairing, kv/config, logs, HTTP index,
               multimodal binary + metadata extraction
  plans/     — plan-time helpers (Y/N/R keyword schemas)
  streaming/ — ingest front-end (batch + streaming, quarantine,
               provenance) and stateful analytics (watermarked windows,
               bounded-state dedup, applyInPandasWithState)
  monitor    — the reconciliation report composed end-to-end
  cli        — the reference's three executables as subcommands
"""

__version__ = "0.1.0"

from .session import apply_runtime_confs, get_spark  # noqa: E402
from .tables import load_table, register_views  # noqa: E402

__all__ = [
    "apply_runtime_confs",
    "get_spark",
    "load_table",
    "register_views",
    "__version__",
]
