"""Sequence-packing operator: the distributed prefix sum must be exact
and bucketing-invariant, and the packing semantics (concat-and-chunk,
straddling allowed) must hold at the edges."""

from __future__ import annotations

from dbbspark.operators.packing import pack_sequences


def _pack(spark, rows, budget, num_buckets):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens bigint")
    out = pack_sequences(df, "doc_id", "n_tokens", budget, num_buckets)
    return {r["doc_id"]: (r["seq_first"], r["seq_last"], r["seq_offset"]) for r in out.collect()}


def test_packing_semantics(spark):
    # budget 10: doc0 fills [0,7), doc1 straddles seqs 0-1, doc2 sits in 1
    rows = [(0, 7), (1, 8), (2, 5)]
    got = _pack(spark, rows, budget=10, num_buckets=3)
    assert got[0] == (0, 0, 0)
    assert got[1] == (0, 1, 7)  # starts at token 7, ends at 14 → seqs 0..1
    assert got[2] == (1, 1, 5)  # starts at token 15
    # exact budget boundary: a doc ending exactly at a cut does NOT enter
    # the next sequence
    got = _pack(spark, [(0, 10), (1, 10)], budget=10, num_buckets=2)
    assert got[0] == (0, 0, 0)
    assert got[1] == (1, 1, 0)


def test_packing_bucket_invariance(spark):
    """num_buckets is a parallelism knob, never a semantics knob: any
    bucketing yields the identical global prefix sum."""
    rows = [(i, (i * 37) % 90 + 1) for i in range(200)]
    base = _pack(spark, rows, budget=256, num_buckets=1)
    for b in (3, 16, 64):
        assert _pack(spark, rows, budget=256, num_buckets=b) == base


def test_packing_no_unpartitioned_window(spark):
    """The scale contract: no Window over an empty partition spec (the
    single-task global-sort shape) anywhere in the plan."""
    df = spark.createDataFrame(
        [(i, i % 50 + 1) for i in range(100)], "doc_id long, n_tokens bigint"
    )
    plan = (
        pack_sequences(df, "doc_id", "n_tokens", 128, 4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan


def test_token_balanced_shards_balance_and_contiguity(spark):
    import random

    from dbbspark.operators.packing import token_balanced_shards

    rng = random.Random(13)
    rows = [(i, rng.randrange(1, 400)) for i in range(800)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens bigint")
    n_shards = 8
    got = token_balanced_shards(df, n_shards=n_shards, num_buckets=16).collect()
    total = sum(n for _, n in rows)
    budget = -(-total // n_shards)

    shard_of = {r["doc_id"]: r["shard"] for r in got}
    # contiguous id ranges, all shards in [0, n_shards)
    assert all(0 <= s < n_shards for s in shard_of.values())
    ordered = [shard_of[i] for i, _ in sorted(rows)]
    assert ordered == sorted(ordered), "shards must be contiguous id ranges"
    # token mass per shard within budget + one max doc
    mass = {}
    for i, n in rows:
        mass[shard_of[i]] = mass.get(shard_of[i], 0) + n
    max_doc = max(n for _, n in rows)
    assert all(m <= budget + max_doc for m in mass.values())
    assert sum(mass.values()) == total


def test_temperature_proportions_flattens():
    from dbbspark.operators.mixing import mixture_rates, temperature_proportions

    sizes = {"en": 1_000_000, "fr": 100_000, "sw": 1_000}
    nat = temperature_proportions(sizes, alpha=1.0)
    cool = temperature_proportions(sizes, alpha=0.3)
    # alpha=1 reproduces natural proportions
    assert abs(nat["en"] - 1_000_000 / 1_101_000) < 1e-12
    # alpha<1 upweights the small source but keeps the ordering
    assert cool["sw"] > nat["sw"] and cool["en"] < nat["en"]
    assert cool["en"] > cool["fr"] > cool["sw"]
    assert abs(sum(cool.values()) - 1.0) < 1e-12
    # feeds straight into mixture_rates without oversampling any source
    rates = mixture_rates(sizes, cool)
    assert max(rates.values()) <= 1.0 + 1e-9


def test_global_shuffle_deterministic_and_layout_invariant(spark):
    from dbbspark.operators.packing import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = [r["doc_id"] for r in global_shuffle(df, seed=1).collect()]
    b = [r["doc_id"] for r in global_shuffle(df.repartition(13), seed=1).collect()]
    assert a == b  # same global order regardless of input layout
    assert sorted(a) == list(range(500))  # a permutation, nothing lost
    assert a != list(range(500))  # actually shuffled
    c = [r["doc_id"] for r in global_shuffle(df, seed=2).collect()]
    assert c != a  # new epoch seed, new order


def test_global_shuffle_no_single_reducer(spark):
    from dbbspark.operators.packing import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = global_shuffle(df, num_partitions=7)
    assert out.rdd.getNumPartitions() == 7  # range-partitioned, not 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()


def test_global_shuffle_sort_tiebreaks_on_id(spark):
    """64-bit hash keys COLLIDE at corpus scale (birthday ≈ n²/2⁶⁵);
    without an id tiebreak in the partition sort, colliding docs'
    relative order follows scan order and the byte-identical-shards
    claim silently fails exactly at the scale it matters. Pin the sort
    order expression, since a real collision can't be staged cheaply."""
    from dbbspark.operators.packing import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    plan = (
        global_shuffle(df, "doc_id", seed=1)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    sort_line = next(ln for ln in plan.splitlines() if "Sort [" in ln)
    assert "__shuffle_key" in sort_line and "doc_id" in sort_line


def _py_chunks(text, max_tokens, overlap):
    toks = text.split(" ")
    stride = max_tokens - overlap
    if len(toks) <= max_tokens:
        return [" ".join(toks)]
    import math as m

    n_chunks = 1 + m.ceil((len(toks) - max_tokens) / stride)
    return [
        " ".join(toks[i * stride : i * stride + max_tokens])
        for i in range(n_chunks)
    ]


def test_chunking_matches_oracle_and_overlap_property(spark):
    from dbbspark.operators.packing import chunk_documents

    docs = [
        (1, " ".join(f"t{i}" for i in range(25))),   # multi-chunk
        (2, " ".join(f"u{i}" for i in range(10))),   # exactly max
        (3, "short doc"),                            # single chunk
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, max_tokens=10, overlap=3)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = (r["text"], r["n_tokens"])
    for doc_id, text in docs:
        expected = _py_chunks(text, 10, 3)
        chunks = [got[doc_id][i][0] for i in range(len(got[doc_id]))]
        assert chunks == expected, doc_id
        assert all(got[doc_id][i][1] == len(c.split(" ")) for i, c in enumerate(chunks))
    # consecutive full chunks share exactly `overlap` tokens
    c0, c1 = got[1][0][0].split(" "), got[1][1][0].split(" ")
    assert c0[-3:] == c1[:3]
    # every original token appears in the chunk union (nothing lost)
    union = set()
    for i in range(len(got[1])):
        union.update(got[1][i][0].split(" "))
    assert union == set(docs[0][1].split(" "))


def test_chunking_map_only(spark):
    from dbbspark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        chunk_documents(df, max_tokens=2, overlap=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_chunking_validates_params(spark):
    from dbbspark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    import pytest as _pt

    with _pt.raises(ValueError):
        chunk_documents(df, max_tokens=0)
    with _pt.raises(ValueError):
        chunk_documents(df, max_tokens=5, overlap=5)
