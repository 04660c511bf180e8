"""Curation funnel audit — per-stage drop accounting for a filter chain
(training-pipeline closure operator, SURVEY.md §2.11 C45).

A 100 TB curation run is tuned by its funnel ("exact dedup removed 8%,
the quality gate another 31%"), and debugged by per-document blame
("which stage killed this doc?"). Running the pipeline N times with one
stage toggled is N corpus passes; the audit instead evaluates ALL stage
predicates in one pass and assigns each document the FIRST stage that
would drop it — exactly the attribution the sequential pipeline
produces, because a document the sequential run drops at stage i was
never seen by stages > i, and first-match CASE ordering reproduces that.

Stage forms:
- a boolean Column (drop condition) — map-only, fuses into the scan;
- a DataFrame of ids to drop (how set-valued stages like the near-dup
  component drop express themselves) — joined as a flag; id-keyed joins
  share one shuffle partitioning across stages under AQE.

The summary (per-stage reached/dropped/survived + token mass) is ONE
aggregation over the first-drop label — ~n_stages rows — plus driver
arithmetic for the cumulative "reached" column.

The reference's quarantine path keeps per-file failure REASONS the same
way (`bin/save_DBB_stagein_to_DBB.py:212-215` routes each bad file with
its first failed check); this generalizes that bookkeeping to an
arbitrary stage chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dbbspark.session import cut_lineage

SURVIVED = "__survived__"


def funnel_blame(
    docs: DataFrame,
    stages: list[tuple[str, Column | DataFrame]],
    id_col: str = "doc_id",
) -> DataFrame:
    """Input + ``first_drop`` (stage name, or ``__survived__``).

    `stages` is the PIPELINE ORDER: earlier stages win the blame. A
    Column stage is the drop predicate (true ⇒ dropped); a DataFrame
    stage holds the ids its pipeline counterpart would remove — note a
    set-valued stage computed over the FULL corpus can name ids an
    earlier stage already dropped; first-match ordering charges those
    to the earlier stage, matching the sequential run.
    """
    out = docs
    flags: list[tuple[str, Column]] = []
    for i, (name, spec) in enumerate(stages):
        if isinstance(spec, DataFrame):
            flag = f"_hit_{i}"
            ids = spec.select(F.col(spec.columns[0]).alias(id_col)).distinct()
            out = out.join(
                ids.withColumn(flag, F.lit(True)), id_col, "left"
            )
            flags.append((name, F.coalesce(F.col(flag), F.lit(False))))
        else:
            flags.append((name, spec))
    blame = F.lit(SURVIVED)
    for name, cond in reversed(flags):
        blame = F.when(cond, F.lit(name)).otherwise(blame)
    out = out.withColumn("first_drop", blame)
    return out.drop(*[c for c in out.columns if c.startswith("_hit_")])


def funnel_summary(
    blamed: DataFrame,
    stage_order: list[str],
    token_col: str | None = None,
) -> list[dict]:
    """Ordered funnel rows: stage, reached, dropped, survived_after,
    drop_rate (of reached), plus tokens_dropped when `token_col` given.
    One small aggregation (≤ n_stages+1 rows) + driver arithmetic."""
    aggs = [F.count("*").alias("n")]
    if token_col is not None:
        aggs.append(F.sum(F.col(token_col).cast("bigint")).alias("toks"))
    rows = {r["first_drop"]: r for r in blamed.groupBy("first_drop").agg(*aggs).collect()}
    total = sum(r["n"] for r in rows.values())
    reached = total
    out = []
    for name in stage_order:
        r = rows.get(name)
        dropped = r["n"] if r else 0
        row = {
            "stage": name,
            "reached": reached,
            "dropped": dropped,
            "survived_after": reached - dropped,
            "drop_rate": (dropped / reached) if reached else 0.0,
        }
        if token_col is not None:
            row["tokens_dropped"] = int(r["toks"]) if r else 0
        out.append(row)
        reached -= dropped
    return out


def funnel_audit(
    docs: DataFrame,
    stages: list[tuple[str, Column | DataFrame]],
    id_col: str = "doc_id",
    token_col: str | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Blamed frame + ordered summary in one call. The blamed frame is
    localCheckpointed lazily so the summary aggregation and any caller
    reuse share one evaluation of the stage chain."""
    blamed = funnel_blame(docs, stages, id_col).transform(cut_lineage, eager=False)
    return blamed, funnel_summary(blamed, [n for n, _ in stages], token_col)
