"""Local oracle harness — mirrors the driver's correctness gate.

For each declared query: run the Spark builder and the DuckDB oracle SQL on
the same parquet tables, sort columns by name, canonicalize rows, and
compare row count + values order-insensitively. Used by tests and the
`python -m dbbspark.verify` CLI while iterating.
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

from .catalog import CATALOG, QuerySpec, load_all
from .tables import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Route spill outside the repo: in-memory DuckDB defaults its
    # temp_directory to ./.tmp, which at sf>=1 stages multi-GB scratch
    # files into the working tree (and, once, into git history).
    con.execute("SET temp_directory='/tmp/dbbspark_duckdb_spill'")
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_cell(v):
    """Canonical, hashable form of one cell (order-insensitive compare)."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        # round-trip repr keeps full precision; driver-style value hash
        return repr(v)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if hasattr(v, "tolist"):  # numpy scalar or array
        return _canon_cell(v.tolist())
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def _canon_frame(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    out.sort()
    return out


def _oracle_fetch(
    con: duckdb.DuckDBPyConnection, sql: str, timeout: float | None
) -> pd.DataFrame:
    """Run the oracle SQL, interrupting DuckDB if it exceeds `timeout`
    seconds. Needed for above-driver-scale runs (sf1): a handful of
    oracles are deliberately brute-force re-derivations (all-pairs
    cosine, theta joins) that DuckDB cannot finish at 10× — those
    queries downgrade to the driver's rows-only check instead of
    hanging the whole verification."""
    if not timeout:
        return con.execute(sql).fetchdf()
    import threading

    result: dict = {}

    def run() -> None:
        try:
            result["df"] = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            result["err"] = e

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout)
    if th.is_alive():
        con.interrupt()
        th.join(30)
        raise TimeoutError(f"oracle exceeded {timeout}s")
    if "err" in result:
        raise result["err"]
    return result["df"]


def compare_query(
    spark,
    con: duckdb.DuckDBPyConnection,
    spec: QuerySpec,
    sf_dir: str,
    oracle_timeout: float | None = None,
) -> dict:
    res: dict = {"name": spec.name}
    sdf = spec.builder(spark, sf_dir)
    spark_pd = sdf.toPandas()
    res["spark_rows"] = len(spark_pd)
    if spec.oracle is None:
        res["status"] = "rows_only"
        res["ok"] = len(spark_pd) >= 0
        return res
    try:
        oracle_pd = _oracle_fetch(con, spec.oracle, oracle_timeout)
    except (TimeoutError, duckdb.InterruptException):
        res["status"] = "oracle_timeout_rows_only"
        res["ok"] = len(spark_pd) >= 0
        return res
    res["oracle_rows"] = len(oracle_pd)
    if sorted(spark_pd.columns) != sorted(oracle_pd.columns):
        res["status"] = "column_mismatch"
        res["ok"] = False
        res["detail"] = f"spark={sorted(spark_pd.columns)} oracle={sorted(oracle_pd.columns)}"
        return res
    if len(spark_pd) != len(oracle_pd):
        res["status"] = "rowcount_mismatch"
        res["ok"] = False
        return res
    a, b = _canon_frame(spark_pd), _canon_frame(oracle_pd)
    if a == b:
        res["status"] = "match"
        res["ok"] = True
    else:
        res["status"] = "value_mismatch"
        res["ok"] = False
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        res["detail"] = f"{len(diffs)} differing rows; first: {diffs[0] if diffs else None}"
    return res


def main(argv: list[str]) -> int:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--sf", default="/root/testdata/sf0.001")
    p.add_argument(
        "--oracle-timeout", type=float, default=None,
        help="seconds before an oracle is interrupted and the query "
        "downgrades to a rows-only check (sf1 runs)",
    )
    p.add_argument("--json-out", default=None)
    p.add_argument("names", nargs="*")
    args = p.parse_args(argv)

    from .session import get_spark

    load_all()
    spark = get_spark("dbbspark-verify")
    con = duckdb_connect(args.sf)
    names = args.names or sorted(CATALOG)
    failed = 0
    results = []
    for name in names:
        spec = CATALOG[name]
        try:
            res = compare_query(
                spark, con, spec, args.sf, oracle_timeout=args.oracle_timeout
            )
        except Exception as e:  # noqa: BLE001
            res = {"name": name, "status": "error", "ok": False, "detail": f"{type(e).__name__}: {e}"}
        if res.get("status") == "oracle_timeout_rows_only":
            # the interrupted query's thread may still hold the old
            # connection (a long non-interruptible stretch); a FRESH
            # connection keeps one zombie oracle from serializing every
            # later query behind it
            con = duckdb_connect(args.sf)
        mark = "PASS" if res["ok"] else "FAIL"
        if not res["ok"]:
            failed += 1
        results.append(res)
        line = f"{mark} {name:28s} {res['status']:18s} rows={res.get('spark_rows', '?')}"
        if not res["ok"]:
            line += f"\n     {res.get('detail', '')[:500]}"
        print(line, flush=True)
    print(f"{len(names) - failed}/{len(names)} passed")
    if args.json_out:
        import json

        with open(args.json_out, "w") as f:
            json.dump({r["name"]: r for r in results}, f, indent=1, default=str)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
