"""Time-semantics edge cases (SURVEY.md §7 "hard parts to watch").

The reference's nite bucket (15:00 boundary) and its UTC→America/Chicago
log-timestamp conversion are the two places subtle time bugs hide; DST
transitions are the canonical trap. These tests pin behavior on the 2026
US DST edges (spring-forward 2026-03-08, fall-back 2026-11-01) and
randomized template/nite round-trips against plain-Python models.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import Row, functions as F

from dbbspark.domain import nite_col
from dbbspark.functions import compile_template
from dbbspark.sources.logs import read_log


def test_nite_bucket_matches_python_model(spark):
    """nite = (ts - 15h) formatted yyyyMMdd, in the session's UTC frame —
    no DST involvement by design (the reference buckets in local naive
    time; we pin UTC so every engine agrees). Randomized sweep including
    both DST edges and the 15:00 boundary itself."""
    rng = random.Random(7)
    stamps = [
        datetime(2026, 3, 8, rng.randrange(24), rng.randrange(60), rng.randrange(60))
        for _ in range(50)
    ] + [
        datetime(2026, 11, 1, rng.randrange(24), rng.randrange(60), rng.randrange(60))
        for _ in range(50)
    ] + [
        datetime(2026, 6, 1, 15, 0, 0),  # exactly on the boundary → same day
        datetime(2026, 6, 1, 14, 59, 59),  # just before → previous nite
        datetime(2026, 6, 2, 0, 0, 0),
    ]
    df = spark.createDataFrame([Row(ts=t) for t in stamps])
    got = {
        r["ts"]: r["nite"]
        for r in df.select("ts", nite_col(F.col("ts")).alias("nite")).collect()
    }
    for t in stamps:
        assert got[t] == (t - timedelta(hours=15)).strftime("%Y%m%d"), t


def test_log_tz_convert_dst_edges(spark, tmp_path):
    """UTC log stamps crossing the America/Chicago DST transitions:
    offset must be -6h before spring-forward, -5h after (and vice versa in
    fall). Year inference interacts: a stamp whose month exceeds the
    current month belongs to the PREVIOUS year (the reference's rule,
    bin/monitor_DBB_stagein.py:128-133), so November stamps resolve into
    last year's DST calendar."""
    import zoneinfo
    from datetime import date

    p = str(tmp_path / "dst.log")
    today = date.today()
    # spring edge in the inferred year for March; fall edge inferred year
    # for November (previous year iff month > current month)
    spring_year = today.year - 1 if 3 > today.month else today.year
    fall_year = today.year - 1 if 11 > today.month else today.year
    chi = zoneinfo.ZoneInfo("America/Chicago")

    utc = zoneinfo.ZoneInfo("UTC")

    def transition_utc(year: int, month: int) -> datetime:
        # scan UTC hours (unambiguous — no DST fold) for the first instant
        # whose Chicago offset differs from the month's start
        t = datetime(year, month, 1, tzinfo=utc)
        base = t.astimezone(chi).utcoffset()
        while t.month == month:
            t += timedelta(hours=1)
            if t.astimezone(chi).utcoffset() != base:
                return t.replace(tzinfo=None)
        raise AssertionError("no transition found")

    spring = transition_utc(spring_year, 3)
    fall = transition_utc(fall_year, 11)
    lines = [
        f"{spring:%m%d} {spring - timedelta(minutes=30):%H:%M:%S} before spring-forward",
        f"{spring:%m%d} {spring + timedelta(minutes=30):%H:%M:%S} after spring-forward",
        f"{fall:%m%d} {fall - timedelta(minutes=30):%H:%M:%S} before fall-back",
        f"{fall:%m%d} {fall + timedelta(minutes=30):%H:%M:%S} after fall-back",
    ]
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    rows = {r["line"].split(" ", 2)[2]: r for r in read_log(spark, p).collect()}

    def offset_h(tag: str) -> float:
        r = rows[tag]
        return (r["ts_local"] - r["ts_utc"]).total_seconds() / 3600

    assert offset_h("before spring-forward") == -6
    assert offset_h("after spring-forward") == -5
    assert offset_h("before fall-back") == -5
    assert offset_h("after fall-back") == -6


def test_template_compiler_matches_python_model(spark):
    """compile_template == Python string substitution for randomized
    templates over randomized row values (one Spark job for all cases)."""
    rng = random.Random(13)
    cols = ["a", "b", "c"]
    templates = []
    for _ in range(20):
        parts = []
        for _ in range(rng.randrange(1, 6)):
            if rng.random() < 0.5:
                parts.append("${" + rng.choice(cols) + "}")
            else:
                parts.append(rng.choice(["/", "-", "x", "archive", ".parquet", "_"]))
        templates.append("".join(parts))
    rows = [
        Row(a=str(rng.randrange(100)), b=rng.choice(["u", "g", "r"]), c=str(rng.randrange(10)))
        for _ in range(10)
    ]
    df = spark.createDataFrame(rows)
    sel = df.select(
        "a", "b", "c",
        *[compile_template(t).alias(f"t{i}") for i, t in enumerate(templates)],
    )
    for r in sel.collect():
        for i, t in enumerate(templates):
            expect = (
                t.replace("${a}", r["a"]).replace("${b}", r["b"]).replace("${c}", r["c"])
            )
            assert r[f"t{i}"] == expect, (t, r)
