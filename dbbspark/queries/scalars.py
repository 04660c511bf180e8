"""Scalar-function layer (SURVEY.md §2.8 F1-F16).

Each query exercises one scalar family the reference uses row-at-a-time,
re-expressed as Column expressions (whole-stage codegen; no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import query
from ..domain import NITE_SQL, nite_col
from ..functions import compile_template
from ..tables import load_table


@query(
    "q_regexp_extract",
    oracle="""
    SELECT event_id,
           printf('DECam_%08d.fits.fz', event_id) AS fname,
           CAST(regexp_extract(printf('DECam_%08d.fits.fz', event_id),
                               'DECam_(\\d+)\\.fits\\.fz', 1) AS BIGINT) AS expnum,
           regexp_extract('md5sum = ' || md5(event_type),
                          '^\\s*(\\S+)\\s*=(.+)\\s*$', 1) AS kv_key,
           trim(regexp_extract('md5sum = ' || md5(event_type),
                               '^\\s*(\\S+)\\s*=(.+)\\s*$', 2)) AS kv_val
    FROM events
    """,
    doc="F1: regexp_extract — expnum from DECam filename "
    "(bin/monitor_DBB_stagein.py:844) and notify-file key=value parse "
    "(bin/save_DBB_stagein_to_DBB.py:49-56).",
)
def q_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fname = F.format_string("DECam_%08d.fits.fz", F.col("event_id"))
    kvline = F.concat(F.lit("md5sum = "), F.md5(F.col("event_type")))
    return ev.select(
        "event_id",
        fname.alias("fname"),
        F.regexp_extract(fname, r"DECam_(\d+)\.fits\.fz", 1).cast("bigint").alias("expnum"),
        F.regexp_extract(kvline, r"^\s*(\S+)\s*=(.+)\s*$", 1).alias("kv_key"),
        F.trim(F.regexp_extract(kvline, r"^\s*(\S+)\s*=(.+)\s*$", 2)).alias("kv_val"),
    )


@query(
    "q_regexp_replace",
    oracle="""
    SELECT event_id,
           regexp_replace(printf('DECam_%08d.fits.fz.dbb', event_id),
                          '\\.dbb$', '') AS data_fname,
           regexp_replace(strftime(ts, '%Y-%m-%d %H:%M:%S'),
                          '[ :-]', '', 'g') AS seqid_clean
    FROM events
    """,
    doc="F2: regexp_replace — strip '.dbb' notify suffix "
    "(bin/save_DBB_stagein_to_DBB.py:318) and '[ :-]' seqid cleanup "
    "(bin/monitor_DBB_stagein.py:770).",
)
def q_regexp_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    notify = F.format_string("DECam_%08d.fits.fz.dbb", F.col("event_id"))
    stamp = F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    return ev.select(
        "event_id",
        F.regexp_replace(notify, r"\.dbb$", "").alias("data_fname"),
        F.regexp_replace(stamp, r"[ :-]", "").alias("seqid_clean"),
    )


@query(
    "q_substring",
    oracle="""
    SELECT doc_id,
           substr(text, 1, 25) AS obj_short,
           substr(text, 15) AS tail_part,
           left(lang, 1) AS lang_initial
    FROM documents
    """,
    doc="F3: substring truncation for display columns "
    "(bin/monitor_DBB_stagein.py:374-379) and positional tail slice "
    "(bin/monitor_DBB_stagein.py:257-260).",
)
def q_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.substring("text", 1, 25).alias("obj_short"),
        F.expr("substring(text, 15)").alias("tail_part"),
        F.expr("left(lang, 1)").alias("lang_initial"),
    )


@query(
    "q_concat_format",
    oracle="""
    SELECT doc_id,
           concat_ws('/', source, lang, CAST(doc_id AS VARCHAR)) AS rel_path,
           printf('%s has %d chars', lang, n_chars) AS msg
    FROM documents
    """,
    doc="F4: path building '%s/%s' (bin/save_DBB_stagein_to_DBB.py:78-79) "
    "and formatted messages (bin/save_DBB_stagein_to_DBB.py:255-259).",
)
def q_concat_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat_ws("/", "source", "lang", F.col("doc_id").cast("string")).alias("rel_path"),
        F.format_string("%s has %d chars", F.col("lang"), F.col("n_chars")).alias("msg"),
    )


@query(
    "q_path_template",
    oracle="""
    SELECT doc_id,
           source || '/' || lang || '/doc_' || doc_id || '.parquet' AS archive_path
    FROM documents
    """,
    doc="F6/U4: ${var} directory-pattern template compiled to a concat "
    "expression at plan time (replace_vars_single, "
    "bin/save_DBB_stagein_to_DBB.py:180-184; OPS_DIRECTORY_PATTERN "
    "bin/save_DBB_stagein_to_DBB.py:342-343).",
)
def q_path_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tmpl = compile_template("${source}/${lang}/doc_${doc_id}.parquet")
    return docs.select("doc_id", tmpl.alias("archive_path"))


@query(
    "q_nite_bucket",
    oracle=f"""
    SELECT {NITE_SQL} AS nite, COUNT(*) AS cnt
    FROM events GROUP BY 1
    """,
    doc="F7: the 'nite' day bucket — shift -15h then yyyyMMdd "
    "(bin/monitor_DBB_stagein.py:707-715).",
)
def q_nite_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(nite_col(F.col("ts")).alias("nite")).agg(F.count("*").alias("cnt"))


@query(
    "q_date_range",
    oracle="""
    WITH b AS (SELECT max(CAST(ts AS DATE)) AS maxd FROM events)
    SELECT strftime(unnest(generate_series(CAST(maxd - 13 AS TIMESTAMP),
                                           CAST(maxd AS TIMESTAMP),
                                           INTERVAL 1 DAY)), '%Y-%m-%d') AS nite_date
    FROM b
    """,
    doc="F8: nite-list generation — last 14 days ending at the newest event "
    "(bin/monitor_DBB_stagein.py:1147-1150).",
)
def q_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.max(F.to_date("ts")).alias("maxd"))
    return bounds.select(
        F.explode(F.sequence(F.date_sub(F.col("maxd"), 13), F.col("maxd"))).alias("d")
    ).select(F.date_format("d", "yyyy-MM-dd").alias("nite_date"))


@query(
    "q_tz_convert",
    oracle="""
    SELECT event_id,
           (ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/Chicago' AS ts_chicago,
           CAST(month(ts) AS INT) AS mm,
           CASE WHEN month(ts) > 7 THEN 2023 ELSE 2024 END AS inferred_year
    FROM events
    """,
    doc="F9: UTC→America/Chicago conversion + year-inference rule for "
    "yearless log stamps (bin/monitor_DBB_stagein.py:112-137).",
)
def q_tz_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_utc_timestamp("ts", "America/Chicago").alias("ts_chicago"),
        F.month("ts").alias("mm"),
        F.when(F.month("ts") > 7, F.lit(2023)).otherwise(F.lit(2024)).alias("inferred_year"),
    )


@query(
    "q_md5",
    oracle="""
    SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
    FROM documents
    """,
    doc="F11: content checksums — md5 for the reference's verify "
    "(bin/save_DBB_stagein_to_DBB.py:93-97), sha256 for the dedup closure.",
)
def q_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("md5_hex"),
        F.sha2(F.col("text").cast("binary"), 256).alias("sha256_hex"),
    )


@query(
    "q_math_mod",
    oracle="""
    SELECT event_id,
           event_id % 5 AS color_idx,
           ((event_id - 500) % 7 + 7) % 7 AS pm,
           CAST(floor(value / 10) AS BIGINT) AS decile,
           round(abs(value - 100), 2) AS dist
    FROM events
    """,
    doc="F12: modulo row-coloring (bin/monitor_DBB_stagein.py:382), "
    "positive modulo, floor/abs/round math.",
)
def q_math_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (F.col("event_id") % 5).alias("color_idx"),
        F.pmod(F.col("event_id") - 500, F.lit(7)).alias("pm"),
        F.floor(F.col("value") / 10).cast("bigint").alias("decile"),
        F.round(F.abs(F.col("value") - 100), 2).alias("dist"),
    )


@query(
    "q_array_map",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           list_contains(string_split(text, ' '), 'data') AS has_data,
           array_to_string(string_split(text, ' ')[1:5], '-') AS head5
    FROM documents
    """,
    doc="F13: array functions over token lists — membership/size/join "
    "(set handling in bin/monitor_DBB_stagein.py:916,81).",
)
def q_array_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_contains(toks, "data").alias("has_data"),
        F.array_join(F.slice(toks, 1, 5), "-").alias("head5"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
    doc="F14: JSON field extraction from the props column (the snmanifest "
    "JSON plugin, bin/save_DBB_stagein_to_DBB.py:42-43).",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


@query(
    "q_null_handling",
    oracle="""
    SELECT event_id,
           coalesce(nullif(event_type, 'error'), '(failed)') AS et_filled,
           (nullif(event_type, 'error') IS NULL) AS was_error
    FROM events
    """,
    doc="F15: NULL discipline — nullif/coalesce fallback chains "
    "(missing-key '&nbsp;' patching, bin/monitor_DBB_stagein.py:370-372).",
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    et_null = F.nullif(F.col("event_type"), F.lit("error"))
    return ev.select(
        "event_id",
        F.coalesce(et_null, F.lit("(failed)")).alias("et_filled"),
        et_null.isNull().alias("was_error"),
    )


@query(
    "q_case_state",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN 'fail'
                WHEN event_id % 5 = 0 AND event_id % 7 != 0 THEN 'extra'
                WHEN event_id % 5 != 0 AND event_id % 11 = 0 THEN 'not delivered'
                WHEN event_id % 5 != 0 AND event_id % 7 = 0 THEN 'missing'
                WHEN event_id % 5 != 0 THEN 'ok'
                ELSE 'unknown' END AS state
    FROM events
    """,
    doc="F16: the exposure state machine {fail, extra, not delivered, "
    "missing, ok} from presence flags (bin/monitor_DBB_stagein.py:342-366). "
    "Flags follow the domain model in dbbspark.domain.",
)
def q_case_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    in_sispi = F.col("event_id") % 5 != 0
    in_desdm = F.col("event_id") % 7 != 0
    delivered = F.col("event_id") % 11 != 0
    state = (
        F.when(F.col("event_type") == "error", "fail")
        .when(~in_sispi & in_desdm, "extra")
        .when(in_sispi & ~delivered, "not delivered")
        .when(in_sispi & ~in_desdm, "missing")
        .when(in_sispi, "ok")
        .otherwise("unknown")
    )
    return ev.select("event_id", state.alias("state"))
