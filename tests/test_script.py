"""Unicode-script profiling (operators/script.py, SURVEY.md §2.11 C49)."""

from __future__ import annotations

from dbbspark.operators.script import script_profile


def _profile(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in script_profile(df).collect()}


def test_dominant_scripts(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "Это русский текст про погоду и море"),
        (3, "这是一个中文文档 关于天气"),
        (4, "これは日本語のテキストです"),
        (5, "한국어 문서입니다 날씨에 관한"),
        (6, "هذا نص عربي عن الطقس"),
        (7, "यह मौसम के बारे में हिंदी पाठ है"),
    ]
    got = _profile(spark, rows)
    assert got[1]["dominant_script"] == "latin"
    assert got[2]["dominant_script"] == "cyrillic"
    assert got[3]["dominant_script"] == "cjk"
    assert got[4]["dominant_script"] == "kana"
    assert got[5]["dominant_script"] == "hangul"
    assert got[6]["dominant_script"] == "arabic"
    assert got[7]["dominant_script"] == "devanagari"


def test_ratios_sum_to_one_over_letters(spark):
    got = _profile(spark, [(1, "abc где 123 !!!")])
    r = got[1]
    total = sum(
        v for k, v in r.asDict().items() if k.endswith("_ratio")
    )
    assert abs(total - 1.0) < 1e-9
    assert abs(r["latin_ratio"] - 0.5) < 1e-9  # 3 latin of 6 letters
    assert abs(r["cyrillic_ratio"] - 0.5) < 1e-9  # digits/punct excluded


def test_short_and_null_docs_unknown(spark):
    got = _profile(spark, [(1, "ab"), (2, None), (3, "1234567890 !!")])
    for i in (1, 2, 3):
        assert got[i]["dominant_script"] == "unknown"
    assert got[2]["n_chars"] == 0


def test_mixed_doc_majority_wins(spark):
    # 20 CJK chars vs 8 latin letters -> cjk dominates
    got = _profile(spark, [(1, "machine 学习模型的训练数据需要大量清洗和去重")])
    assert got[1]["dominant_script"] == "cjk"
    assert got[1]["latin_ratio"] < got[1]["cjk_ratio"]


def test_jvm_only_plan(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    from dbbspark.operators.script import script_profile as sp

    plan = sp(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
