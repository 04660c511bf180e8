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


def test_script_derivations_sql_equals_column_form(spark):
    """r14: script_derivations emits generated-SQL expressions; pin
    them value-equal to the original Column-built when/otherwise forms
    on a tie/short/empty/NULL-count-free probe matrix."""
    from pyspark.sql import functions as F

    from dbbspark.operators.script import SCRIPT_CLASSES, script_derivations

    letters = [n for n in SCRIPT_CLASSES if n != "digit"]
    rows = [
        tuple(r)
        for r in [
            [0] * len(letters),              # all-zero -> unknown, 0.0
            [5] + [0] * (len(letters) - 1),  # single class
            [3, 3] + [0] * (len(letters) - 2),  # exact tie -> decl order
            [1] * len(letters),              # below min_letters? sum>=5?
            [2] * len(letters),              # all equal above cutoff
        ]
    ]
    df = spark.createDataFrame(
        rows, ", ".join(f"n_{n} long" for n in letters)
    )
    ratio_cols, dominant = script_derivations(5)
    got = df.select(*ratio_cols, dominant).collect()

    # reference: the pre-r14 Column-built forms
    total = sum((F.col(f"n_{n}") for n in letters[1:]),
                F.col(f"n_{letters[0]}"))
    ref_ratios = [
        F.when(total > 0, F.col(f"n_{n}") / total).otherwise(F.lit(0.0))
        .alias(f"{n}_ratio")
        for n in letters
    ]
    mx = F.greatest(*[F.col(f"n_{n}") for n in letters])
    dom = F.lit("unknown")
    for n in reversed(letters):
        dom = F.when((total >= 5) & (F.col(f"n_{n}") == mx), F.lit(n)).otherwise(dom)
    want = df.select(*ref_ratios, dom.alias("dominant_script")).collect()
    assert got == want
