#!/usr/bin/env python
"""Deterministic dataset up-scaler: build sfN from the driver's sf0.1
fixtures by key-shifted replication (VERDICT r10 item 1 — the catalog
has only ever executed at sf0.1; a super-linear row is invisible at
600k rows).

Why replication and not a fresh generator: the driver's generator is
not available (TESTDATA.md: fixtures are driver-written, read-only), so
the only faithful way to scale is to replicate its OWN output while
preserving the properties each operator's cost model depends on:

- **Join graph**: every copy shifts all PRIMARY and FOREIGN keys by the
  same stride, so each copy is a disjoint, internally-consistent copy of
  the star schema — joins scale exactly linearly, no cross-copy fan-out.
  Dimension tables (region, nation) stay fixed, like TPC-H itself.
- **Group structure**: non-key group columns (dates, types, segments)
  are kept, so aggregation queries see the same group count with 10×
  rows per group — the realistic shape of "same telescope, more nights'
  volume".
- **Near-dup structure**: copied document text is re-tokenized through a
  per-copy injective token map (token → pseudoword of similar length).
  A pure relabeling preserves within-copy Jaccard EXACTLY (the planted
  dup/near-dup families replicate), while cross-copy similarity drops
  to ~0 — without this, identical copies would grow every LSH bucket
  10× and the candidate volume 100×, a replication ARTIFACT that would
  masquerade as a super-linear operator.
- **Embedding geometry**: each copy applies a fixed per-copy dimension
  permutation — all within-copy norms/cosines are preserved exactly
  (ANN family structure replicates), cross-copy cosines decorrelate.

Copy 0 is byte-identical to the source tables. Output layout matches
the driver's (`<out>/<table>.parquet`, ONE file per table) so bench.py,
dbbspark.verify, and duckdb_connect work unchanged via --sf/-dir.

Usage: python scale_data.py --out .scale/sf1 [--copies 10]
                            [--src /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# one stride for every key space: far above any source key, so copies
# can never collide with each other or the originals
STRIDE = 100_000_000

# key columns shifted per copy, per table (PKs and the FKs that point at
# other REPLICATED tables; FKs into fixed dims — nationkey — are kept)
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]

_TOKEN_RE = re.compile(r"\S+")


def _token_map(vocab: list[str], copy: int) -> dict[str, str]:
    """Injective-by-construction token relabeling for one copy: each
    token maps to a pseudoword of similar length derived from
    md5(token|copy); collisions (astronomically unlikely at corpus vocab
    sizes) get a disambiguating suffix to KEEP the map injective — an
    accidental merge of two tokens would raise within-copy Jaccard."""
    out: dict[str, str] = {}
    used: set[str] = set()
    for t in vocab:
        h = hashlib.md5(f"{t}|{copy}".encode()).hexdigest()
        w = "q" + h[: max(2, min(len(t), 9) - 1)]
        while w in used:
            w += "x"
        used.add(w)
        out[t] = w
    return out


def _scale_documents(table: pa.Table, copies: int) -> list[pa.Table]:
    df = table.to_pandas()
    vocab = sorted(
        {t for text in df["text"] for t in _TOKEN_RE.findall(text)}
    )
    out = [table]
    for c in range(1, copies):
        m = _token_map(vocab, c)
        cp = df.copy()
        cp["doc_id"] = cp["doc_id"] + c * STRIDE
        cp["text"] = [
            _TOKEN_RE.sub(lambda g: m[g.group(0)], text)
            for text in df["text"]
        ]
        cp["n_chars"] = cp["text"].str.len().astype("int64")
        out.append(pa.Table.from_pandas(cp, schema=table.schema, preserve_index=False))
    return out


def _scale_embeddings(table: pa.Table, copies: int) -> list[pa.Table]:
    df = table.to_pandas()
    V = np.stack(df["embedding"].to_numpy()).astype(np.float32)
    dim = V.shape[1]
    out = [table]
    for c in range(1, copies):
        perm = np.random.default_rng(42 + c).permutation(dim)
        cp = df.copy()
        cp["vec_id"] = cp["vec_id"] + c * STRIDE
        Vp = V[:, perm]
        cp["embedding"] = [Vp[i] for i in range(len(cp))]
        out.append(pa.Table.from_pandas(cp, schema=table.schema, preserve_index=False))
    return out


def _scale_keyed(
    table: pa.Table, keys: list[str], copies: int,
    jitter_ts: list[str] | None = None,
) -> list[pa.Table]:
    out = [table]
    for c in range(1, copies):
        cols = []
        for name in table.schema.names:
            col = table.column(name)
            if name in keys:
                col = pa.compute.add(col, pa.scalar(c * STRIDE, type=col.type))
            elif jitter_ts and name in jitter_ts:
                # +c microseconds per copy: copies keep their temporal
                # structure (windows/sessions/nites unchanged at µs
                # shifts) but EXACT timestamp ties across copies are
                # broken — replicated identical timestamps would make
                # argmax-style aggregates (max_by, keep-last) genuinely
                # ambiguous, a replication artifact that reads as an
                # engine mismatch (the r11 sf1 run hit exactly that on
                # q_rollup's latest_event_id)
                col = pa.compute.add(
                    col, pa.scalar(c, type=pa.duration("us"))
                )
            cols.append(col)
        out.append(pa.Table.from_arrays(cols, schema=table.schema))
    return out


def scale_dir(src: str, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    for name in FIXED:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows (fixed dim)")
    for name, keys in KEYS.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        if name == "documents":
            parts = _scale_documents(t, copies)
        elif name == "embeddings":
            parts = _scale_embeddings(t, copies)
        elif name == "events":
            parts = _scale_keyed(t, keys, copies, jitter_ts=["ts"])
        else:
            parts = _scale_keyed(t, keys, copies)
        dest = os.path.join(out, f"{name}.parquet")
        with pq.ParquetWriter(dest, t.schema) as w:
            for p in parts:
                w.write_table(p)
        print(f"{name}: {t.num_rows} -> {t.num_rows * copies} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    scale_dir(args.src, args.out, args.copies)


if __name__ == "__main__":
    main()
