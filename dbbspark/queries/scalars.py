"""Scalar-function layer (SURVEY.md §2.8 F1-F16).

Each query exercises one scalar family the reference uses row-at-a-time,
re-expressed as Column expressions (whole-stage codegen; no UDFs).

Round-2 consolidation: the external driver's correctness gate checks at
most 50 declared queries, so thin single-function queries are merged into
composite projections — same expressions, same oracle coverage, fewer
names. Each merged query's doc lists every SURVEY §2 row it covers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import query
from ..functions import compile_template
from ..operators.layout import zorder_col, zorder_oracle_sql
from ..operators.normalize import (
    DIRTY_PROBE,
    _sql_lit,
    normalize_oracle_sql,
    normalize_text,
)
from ..tables import load_table

# C41 fold coordinates (q_row_scalars): pinned declared ranges —
# replayable across scale factors (zorder_write's data-dependent
# add_zorder_key range pass is pinned separately in tests/test_layout).
# event_id % 1024 exercises every grid cell at any sf; `value` clamps
# at the declared ceiling, covering _scale_to_grid's clamp leg too.
# Column objects need an active SparkContext, so the Spark-side ranges
# are built lazily inside the query.
def _zkey_ranges():
    return [
        ((F.col("event_id") % 1024), 0, 1023),
        (F.col("value"), 0, 200),
    ]


_ZKEY_RANGES_SQL = [("(event_id % 1024)", 0, 1023), ("value", 0, 200)]

# C27 fold (q_string_funcs): the full normalize_text chain over a
# deterministic dirty injection (every mojibake + punctuation table
# entry, controls, whitespace runs — operators/normalize.DIRTY_PROBE)
# prefixed to each doc's head, so the canonicalization pass is
# value-checked entry-for-entry instead of vacuously over clean text.
_NORM_ORACLE = normalize_oracle_sql(
    f"({_sql_lit(DIRTY_PROBE)} || substr(text, 1, 24))"
)


@query(
    "q_string_funcs",
    oracle=f"""
    SELECT doc_id,
           printf('DECam_%08d.fits.fz', doc_id) AS fname,
           CAST(regexp_extract(printf('DECam_%08d.fits.fz', doc_id),
                               'DECam_(\\d+)\\.fits\\.fz', 1) AS BIGINT) AS expnum,
           regexp_extract('md5sum = ' || md5(text),
                          '^\\s*(\\S+)\\s*=(.+)\\s*$', 1) AS kv_key,
           trim(regexp_extract('md5sum = ' || md5(text),
                               '^\\s*(\\S+)\\s*=(.+)\\s*$', 2)) AS kv_val,
           regexp_replace(printf('DECam_%08d.fits.fz.dbb', doc_id),
                          '\\.dbb$', '') AS data_fname,
           regexp_replace(source || '-' || lang, '[ :-]', '', 'g') AS src_clean,
           substr(text, 1, 25) AS obj_short,
           substr(text, 15) AS tail_part,
           left(lang, 1) AS lang_initial,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           list_contains(string_split(text, ' '), 'data') AS has_data,
           array_to_string(string_split(text, ' ')[1:5], '-') AS head5,
           (regexp_matches(text, 'hash\\s+(scan|join)')
            OR text LIKE '%window window%') AS rx_match,
           concat_ws('/', source, lang, CAST(doc_id AS VARCHAR)) AS rel_path,
           printf('%s has %d chars', lang, n_chars) AS msg,
           source || '/' || lang || '/doc_' || doc_id || '.parquet' AS archive_path,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex,
           list_reduce(
             list_prepend(7::BIGINT,
               list_transform(string_split(text, ' ')[1:16],
                 t -> (ascii(t) * 7 + length(t))::BIGINT)),
             (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint,
           {_NORM_ORACLE} AS norm_text
    FROM documents
    """,
    doc="F1+F2+F3+F4+F6/U4+F13+P5+F11+C4-fingerprint (merged): "
    "regexp_extract — expnum from "
    "DECam filename (bin/monitor_DBB_stagein.py:844) and notify-file "
    "key=value parse (bin/save_DBB_stagein_to_DBB.py:49-56); "
    "regexp_replace — strip "
    "'.dbb' notify suffix (bin/save_DBB_stagein_to_DBB.py:318) and "
    "'[ :-]' seqid cleanup (bin/monitor_DBB_stagein.py:770); substring "
    "truncation (bin/monitor_DBB_stagein.py:374-379,257-260); array "
    "membership/size/join over token lists "
    "(bin/monitor_DBB_stagein.py:916,81); rlike predicate as a boolean "
    "column (bin/monitor_DBB_stagein.py:766,844,239,272); path building "
    "'%s/%s' (bin/save_DBB_stagein_to_DBB.py:78-79), formatted messages "
    "(bin/save_DBB_stagein_to_DBB.py:255-259), and the ${var} directory-"
    "pattern template compiled to a concat expression at plan time "
    "(replace_vars_single, bin/save_DBB_stagein_to_DBB.py:180-184; "
    "OPS_DIRECTORY_PATTERN bin/save_DBB_stagein_to_DBB.py:342-343). "
    "Round-4 fold (former q_content_hash): content checksums — md5 for "
    "the reference's verify (bin/save_DBB_stagein_to_DBB.py:93-97), "
    "sha256 for the dedup closure — plus the rolling polynomial document "
    "fingerprint over the first 16 tokens (integer arithmetic, "
    "engine-portable; the rolling-hash shape for shift-resistant dedup "
    "keys). FOLDED C27 (r12): `norm_text` runs operators/normalize.py "
    "normalize_text END TO END — mojibake repair, C0/C1 control strip, "
    "typographic punctuation fold, whitespace collapse — over a "
    "deterministic dirty injection covering every table entry "
    "(DIRTY_PROBE) prefixed to each doc's head, against the oracle's "
    "replace/regexp chain generated from the same tables "
    "(normalize_oracle_sql), so stage order and per-entry mappings are "
    "value-checked, not vacuously green on clean fixture text.",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fname = F.format_string("DECam_%08d.fits.fz", F.col("doc_id"))
    notify = F.format_string("DECam_%08d.fits.fz.dbb", F.col("doc_id"))
    kvline = F.concat(F.lit("md5sum = "), F.md5(F.col("text").cast("binary")))
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        fname.alias("fname"),
        F.regexp_extract(fname, r"DECam_(\d+)\.fits\.fz", 1).cast("bigint").alias("expnum"),
        F.regexp_extract(kvline, r"^\s*(\S+)\s*=(.+)\s*$", 1).alias("kv_key"),
        F.trim(F.regexp_extract(kvline, r"^\s*(\S+)\s*=(.+)\s*$", 2)).alias("kv_val"),
        F.regexp_replace(notify, r"\.dbb$", "").alias("data_fname"),
        F.regexp_replace(
            F.concat_ws("-", "source", "lang"), r"[ :-]", ""
        ).alias("src_clean"),
        F.substring("text", 1, 25).alias("obj_short"),
        F.expr("substring(text, 15)").alias("tail_part"),
        F.expr("left(lang, 1)").alias("lang_initial"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_contains(toks, "data").alias("has_data"),
        F.array_join(F.slice(toks, 1, 5), "-").alias("head5"),
        (
            F.col("text").rlike(r"hash\s+(scan|join)")
            | F.col("text").contains("window window")
        ).alias("rx_match"),
        F.concat_ws("/", "source", "lang", F.col("doc_id").cast("string")).alias(
            "rel_path"
        ),
        F.format_string("%s has %d chars", F.col("lang"), F.col("n_chars")).alias(
            "msg"
        ),
        compile_template("${source}/${lang}/doc_${doc_id}.parquet").alias(
            "archive_path"
        ),
        F.md5(F.col("text").cast("binary")).alias("md5_hex"),
        F.sha2(F.col("text").cast("binary"), 256).alias("sha256_hex"),
        F.aggregate(
            F.transform(
                F.slice(toks, 1, 16),
                lambda t: (F.ascii(t) * 7 + F.length(t)).cast("bigint"),
            ),
            F.lit(7).cast("bigint"),
            lambda acc, v: (acc * 31 + v) % 1000000007,
        ).alias("fingerprint"),
        # C27 fold: normalize_text end to end over the dirty probe —
        # mojibake repair, control strip, punctuation fold, whitespace
        # collapse — vs the oracle's replace chain generated from the
        # same tables (operators/normalize.normalize_oracle_sql)
        normalize_text(
            F.concat(F.lit(DIRTY_PROBE), F.substring("text", 1, 24))
        ).alias("norm_text"),
    )


@query(
    "q_row_scalars",
    oracle=f"""
    SELECT event_id,
           (ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/Chicago' AS ts_chicago,
           CAST(month(ts) AS INT) AS mm,
           CASE WHEN month(ts) > 7 THEN 2023 ELSE 2024 END AS inferred_year,
           event_id % 5 AS color_idx,
           ((event_id - 500) % 7 + 7) % 7 AS pm,
           CAST(floor(value / 10) AS BIGINT) AS decile,
           round(abs(value - 100), 2) AS dist,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           coalesce(nullif(event_type, 'error'), '(failed)') AS et_filled,
           (nullif(event_type, 'error') IS NULL) AS was_error,
           {zorder_oracle_sql(_ZKEY_RANGES_SQL, bits=12)} AS zkey
    FROM events
    """,
    doc="F9+F12+F14+F15 (merged): UTC→America/Chicago conversion + "
    "year-inference rule for yearless log stamps "
    "(bin/monitor_DBB_stagein.py:112-137); modulo row-coloring "
    "(bin/monitor_DBB_stagein.py:382), positive modulo, floor/abs/round; "
    "JSON field extraction (the snmanifest JSON plugin, "
    "bin/save_DBB_stagein_to_DBB.py:42-43); NULL discipline via "
    "nullif/coalesce (bin/monitor_DBB_stagein.py:370-372). "
    "FOLDED C41 (r12): `zkey` is operators/layout.py zorder_col — the "
    "Morton bit-interleaved clustering key zorder_write sorts on — over "
    "(event_id % 1024, value) with pinned declared ranges, so the "
    "scale-to-grid clamp arithmetic and the full shift/and/or "
    "interleave are value-checked against the oracle's independent "
    "re-derivation (pure integer/double math — bit-exact cross-engine).",
)
def q_row_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    et_null = F.nullif(F.col("event_type"), F.lit("error"))
    return ev.select(
        "event_id",
        F.from_utc_timestamp("ts", "America/Chicago").alias("ts_chicago"),
        F.month("ts").alias("mm"),
        F.when(F.month("ts") > 7, F.lit(2023)).otherwise(F.lit(2024)).alias("inferred_year"),
        (F.col("event_id") % 5).alias("color_idx"),
        F.pmod(F.col("event_id") - 500, F.lit(7)).alias("pm"),
        F.floor(F.col("value") / 10).cast("bigint").alias("decile"),
        F.round(F.abs(F.col("value") - 100), 2).alias("dist"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.coalesce(et_null, F.lit("(failed)")).alias("et_filled"),
        et_null.isNull().alias("was_error"),
        zorder_col(_zkey_ranges(), bits=12).alias("zkey"),
    )


@query(
    "q_date_range",
    oracle="""
    WITH b AS (SELECT max(CAST(ts AS DATE)) AS maxd FROM events),
    spine AS (
      SELECT CAST(unnest(generate_series(CAST(maxd - 13 AS TIMESTAMP),
                                         CAST(maxd AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS d
      FROM b),
    daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
      FROM events, b WHERE CAST(ts AS DATE) >= maxd - 13
      GROUP BY 1),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
    filled AS (
      SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                         CAST(hi AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds),
    dense AS (
      SELECT filled.d, CAST(coalesce(daily.n, 0) AS BIGINT) AS n_events
      FROM filled LEFT JOIN daily ON filled.d = daily.d)
    SELECT strftime(spine.d, '%Y-%m-%d') AS nite_date, dense.n_events
    FROM spine LEFT JOIN dense ON spine.d = dense.d
    """,
    doc="F8: nite-list generation — last 14 days ending at the newest event "
    "(bin/monitor_DBB_stagein.py:1147-1150). FOLDED C48 (r10): `n_events` "
    "is the per-nite event count DENSIFIED by fill_time_gaps "
    "(operators/timegrid.py) — empty nites inside the observed [min, max] "
    "date range report 0 (the fill), nites on the F8 spine outside it "
    "report NULL (no data range to fill) — so the spine-bounds aggregate, "
    "the sequence-explode spine, and the null-safe fill join-back are all "
    "value-checked against DuckDB's generate_series + LEFT JOIN "
    "re-derivation.",
)
def q_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timegrid import fill_time_gaps

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.max(F.to_date("ts")).alias("maxd"))
    spine = bounds.select(
        F.explode(F.sequence(F.date_sub(F.col("maxd"), 13), F.col("maxd"))).alias("d")
    )
    daily = (
        ev.crossJoin(F.broadcast(bounds))
        .where(F.to_date("ts") >= F.date_sub(F.col("maxd"), 13))
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n_events"))
    )
    dense = fill_time_gaps(
        daily, "d", "INTERVAL 1 DAY", fill={"n_events": 0}
    ).select("d", F.col("n_events").cast("bigint").alias("n_events"))
    return spine.join(dense, "d", "left").select(
        F.date_format("d", "yyyy-MM-dd").alias("nite_date"), "n_events"
    )
