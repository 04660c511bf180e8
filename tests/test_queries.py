"""Every declared query hash-matches its DuckDB oracle (the driver's t2
gate, run locally at sf0.001 for speed; CI-style full run at sf0.01 via
DBBSPARK_TEST_SF_DIR)."""

from __future__ import annotations

import pytest

from dbbspark.catalog import load_all
from dbbspark.verify import compare_query

CATALOG = load_all()


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    res = compare_query(spark, duck, CATALOG[name], sf_dir)
    assert res["ok"], f"{name}: {res['status']} {res.get('detail', '')}"
    if CATALOG[name].oracle is not None:
        assert res["status"] == "match"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "cnt_missing" in df.columns


def test_contract_shapes():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(v) for v in q.values())
