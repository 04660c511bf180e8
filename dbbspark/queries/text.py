"""Text-analysis layer (SURVEY.md §2.11 C4) — language-ID heuristic,
quality scoring, token counting, document fingerprinting. All expression-
level (split / higher-order functions / regexp) — no UDFs, so the hot path
stays in whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import query
from ..tables import load_table

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_SW_SQL = "('" + "','".join(_STOPWORDS) + "')"


@query(
    "q_text_stats",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
    doc="C4: corpus statistics per (lang, source) — doc/char/token counts, "
    "the grouped profile a training-data pipeline reports per shard.",
    tags=("text", "closure"),
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(toks).cast("bigint")).alias("total_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "q_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), t -> t IN {_SW_SQL}))
               AS en_hits,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents)
    SELECT doc_id, CAST(en_hits AS BIGINT) AS en_hits,
           CASE WHEN en_hits * 10 >= n_tokens THEN 'en-like'
                ELSE 'other' END AS lang_guess
    FROM scored
    """,
    doc="C4: language-ID heuristic — stopword-hit density (≥10% English "
    "stopwords → 'en-like'). The n-gram-profile classifier shape, "
    "expression-only.",
    tags=("text", "closure"),
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    en_hits = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    d = docs.select(
        "doc_id",
        en_hits.alias("en_hits"),
        F.size(toks).alias("n_tokens"),
    )
    return d.select(
        "doc_id",
        F.col("en_hits").cast("bigint").alias("en_hits"),
        F.when(F.col("en_hits") * 10 >= F.col("n_tokens"), "en-like")
        .otherwise("other")
        .alias("lang_guess"),
    )


@query(
    "q_quality_score",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             n_chars,
             len(list_filter(string_split(text, ' '), t -> t IN {_SW_SQL}))
               AS sw_hits
      FROM documents)
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(CAST(n_chars AS DOUBLE) / n_tokens, 4) AS avg_token_len,
           round(CAST(sw_hits AS DOUBLE) / n_tokens, 4) AS stopword_ratio,
           (n_tokens BETWEEN 20 AND 1000
            AND CAST(n_chars AS DOUBLE) / n_tokens BETWEEN 3 AND 12) AS passes_quality
    FROM m
    """,
    doc="C4: quality scoring — length / avg-token-length / stopword-ratio "
    "gates (the Gopher-rules shape) as one projection.",
    tags=("text", "closure"),
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    m = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.col("n_chars"),
        F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS))).alias("sw_hits"),
    )
    atl = F.col("n_chars").cast("double") / F.col("n_tokens")
    return m.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(atl, 4).alias("avg_token_len"),
        F.round(F.col("sw_hits").cast("double") / F.col("n_tokens"), 4).alias("stopword_ratio"),
        (F.col("n_tokens").between(20, 1000) & atl.between(3, 12)).alias("passes_quality"),
    )


@query(
    "q_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                AS BIGINT) AS bpe_ish_tokens
    FROM documents
    """,
    doc="C4: token counting — whitespace split vs a BPE-ish regex "
    "(letter-runs | digit-runs | other) for budget estimation.",
    tags=("text", "closure"),
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0))
        .cast("bigint")
        .alias("bpe_ish_tokens"),
    )


@query(
    "q_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(7::BIGINT,
               list_transform(string_split(text, ' ')[1:16],
                 t -> (ascii(t) * 7 + length(t))::BIGINT)),
             (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
    FROM documents
    """,
    doc="C4: document fingerprint — rolling polynomial hash over the first "
    "16 tokens (integer arithmetic, engine-portable; the rolling-hash "
    "shape used for shift-resistant dedup keys).",
    tags=("text", "closure"),
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    head = F.slice(F.split(F.col("text"), " "), 1, 16)
    vals = F.transform(head, lambda t: (F.ascii(t) * 7 + F.length(t)).cast("bigint"))
    fp = F.aggregate(
        vals,
        F.lit(7).cast("bigint"),
        lambda acc, v: (acc * 31 + v) % 1000000007,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


@query(
    "q_stratified_sample",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
          % 100 <
          CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20 ELSE 10 END
    """,
    doc="Training-pipeline closure: deterministic stratified sampling — "
    "per-stratum rates applied via an md5 hash gate on the key, so the "
    "sample is reproducible across runs, engines, AND cluster sizes "
    "(unlike sampleBy's partition-dependent RNG) and is itself a pushdown-"
    "able filter: no shuffle, no state.",
    tags=("text", "sampling", "closure"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import md5_int_col

    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 50)
        .when(F.col("lang") == "de", 20)
        .otherwise(10)
    )
    gate = md5_int_col(F.col("doc_id").cast("string")) % 100
    return docs.where(gate < rate).select("doc_id", "lang")


@query(
    "q_embed_normalize",
    oracle="""
    SELECT vec_id,
           CAST(round(
             list_sum(list_transform(l2, x -> x * x)), 6
           ) AS DOUBLE) AS norm_sq
    FROM (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_sum(
                 list_transform(CAST(embedding AS DOUBLE[]), y -> y * y)))) AS l2
      FROM embeddings)
    """,
    doc="Training-pipeline closure: L2 embedding normalization as a pure "
    "array expression (no UDF, no shuffle); verified by the invariant "
    "that normalized vectors have unit squared norm (rounded to 1e-6 so "
    "both engines' fp accumulation orders agree).",
    tags=("similarity", "closure"),
)
def q_embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("e"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    l2 = F.transform(F.col("e"), lambda x: x / F.col("__norm"))
    normed = emb.withColumn("__norm", norm).select("vec_id", l2.alias("l2"))
    norm_sq = F.aggregate(
        F.transform(F.col("l2"), lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return normed.select("vec_id", F.round(norm_sq, 6).alias("norm_sq"))


@query(
    "q_training_pipeline",
    oracle=f"""
    WITH quality AS (
      SELECT doc_id, text, lang,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS atl
      FROM documents),
    passed AS (
      SELECT * FROM quality
      WHERE n_tokens BETWEEN 20 AND 1000 AND atl BETWEEN 3 AND 12),
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY sha256(text)
                                     ORDER BY doc_id) AS rn
        FROM passed) WHERE rn = 1),
    sampled AS (
      SELECT * FROM deduped
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) % 100 < 80)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS token_budget
    FROM sampled GROUP BY lang
    """,
    doc="Capstone composition: the canonical training-data pipeline — "
    "quality gate (Gopher-rules shape) → exact dedup keep-first → "
    "deterministic 80% hash sample → per-language token budget — as ONE "
    "Catalyst DAG: scan-side filters, a single dedup shuffle, a pushed "
    "sample filter, and a final partial-agg groupBy. The shape every "
    "100 TB corpus build runs; each stage is individually verified by "
    "its own declared query, and the composition is oracle-verified here.",
    tags=("text", "pipeline", "closure"),
)
def q_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import md5_int_col, sha_dedup_keep_first

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    quality = docs.select(
        "doc_id",
        "text",
        "lang",
        F.size(toks).alias("n_tokens"),
        (F.col("n_chars").cast("double") / F.size(toks)).alias("atl"),
    ).where(
        F.col("n_tokens").between(20, 1000) & F.col("atl").between(3, 12)
    )
    deduped = sha_dedup_keep_first(quality, "text", "doc_id")
    sampled = deduped.where(
        md5_int_col(F.col("doc_id").cast("string")) % 100 < 80
    )
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("token_budget"),
    )
