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
  operators/ — reusable composite operators (reconcile, dedup, similarity,
               intervals, windows)
  sources/   — file-based sources (notify-dir scan, kv files, logs)
  plans/     — end-to-end pipelines (ingest, reconcile/report, provenance)
  streaming/ — Structured Streaming ingest front-end
"""

__version__ = "0.1.0"
