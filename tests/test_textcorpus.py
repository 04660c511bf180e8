"""JSONL/CSV corpus sources (sources/textcorpus.py): malformed lines
route to the rejected side with their raw text; accepted side stays
schema-clean; nothing is lost or duplicated."""

from __future__ import annotations

from dbbspark.sources.textcorpus import read_csv_docs, read_jsonl_docs


def test_jsonl_corrupt_routing(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "clean doc one"}',
                '{"doc_id": 2, "text": "clean doc two"}',
                '{"doc_id": broken json here',
                '{"doc_id": "not_a_number", "text": "type mismatch"}',
                '{"doc_id": 5, "text": "clean doc five"}',
            ]
        )
    )
    accepted, rejected = read_jsonl_docs(spark, str(p))
    acc = {(r["doc_id"], r["text"]) for r in accepted.collect()}
    assert acc == {
        (1, "clean doc one"),
        (2, "clean doc two"),
        (5, "clean doc five"),
    }
    rej = rejected.collect()
    assert len(rej) == 2
    raws = {r["raw_line"] for r in rej}
    assert any("broken json" in r for r in raws)
    assert any("not_a_number" in r for r in raws)
    # accounting: every input line is on exactly one side
    assert accepted.count() + rejected.count() == 5


def test_csv_corrupt_routing(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        "\n".join(
            [
                "doc_id,text",
                "1,clean doc one",
                "oops,no id here",
                "3,clean doc three",
            ]
        )
    )
    accepted, rejected = read_csv_docs(spark, str(p))
    assert {(r["doc_id"], r["text"]) for r in accepted.collect()} == {
        (1, "clean doc one"),
        (3, "clean doc three"),
    }
    rej = rejected.collect()
    assert len(rej) == 1 and "oops" in rej[0]["raw_line"]
