"""As-of join: union + running-last formulation vs hand-computed truth.

Semantics under test (operators/asof.py): for each left row, the single
most recent right row with right.ts <= left.ts (strict=True: <) within
the key; nulls when no prior right row; right-side ties at one
(key, ts) resolve to the greatest payload tuple.
"""

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            ("a", 10, "L1"),
            ("a", 20, "L2"),
            ("a", 5, "L0"),   # before any right row
            ("b", 30, "L3"),  # equal-ts right row exists
            ("c", 40, "L4"),  # key with no right rows at all
        ],
        "k string, ts bigint, tag string",
    )
    right = spark.createDataFrame(
        [
            ("a", 8, 100),
            ("a", 15, 200),
            ("a", 20, 300),   # equal to left L2's ts
            ("b", 30, 400),   # equal to left L3's ts
            ("b", 30, 401),   # tie at the same (key, ts): max payload wins
            ("b", 25, 350),
        ],
        "k string, ts bigint, v int",
    )
    return left, right


def _rows(df):
    return {
        (r.tag, r.ts_right, r.v_right)
        for r in df.select("tag", "ts_right", "v_right").collect()
    }


def test_asof_at_or_before(spark, sides):
    left, right = sides
    out = asof_join(left, right, key_col="k", ts_col="ts",
                    payload_cols=["v"], suffix="_right")
    assert set(out.columns) == {"k", "ts", "tag", "ts_right", "v_right"}
    assert _rows(out) == {
        ("L0", None, None),       # ts 5: no right row at or before
        ("L1", 8, 100),           # ts 10: right@8
        ("L2", 20, 300),          # ts 20: right@20 included (<=)
        ("L3", 30, 401),          # equal-ts tie -> greatest payload
        ("L4", None, None),       # key never appears on the right
    }


def test_asof_strictly_before(spark, sides):
    left, right = sides
    out = asof_join(left, right, key_col="k", ts_col="ts",
                    payload_cols=["v"], suffix="_right", strict=True)
    assert _rows(out) == {
        ("L0", None, None),
        ("L1", 8, 100),
        ("L2", 15, 200),          # right@20 no longer visible
        ("L3", 25, 350),          # both right@30 rows excluded
        ("L4", None, None),
    }


def test_asof_row_preservation_and_plan(spark, sides):
    """Left rows survive 1:1 (no pair explosion), and the physical plan
    is the union-window shape: no join node at all."""
    left, right = sides
    out = asof_join(left, right, key_col="k", ts_col="ts", payload_cols=["v"])
    assert out.count() == left.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


def test_asof_null_timestamps(spark):
    """Right rows with null ts are dropped (never 'most recent'); left
    rows with null ts sort before every right row and match nothing."""
    left = spark.createDataFrame(
        [("a", 10, "L1"), ("a", None, "LN")], "k string, ts bigint, tag string"
    )
    right = spark.createDataFrame(
        [("a", 8, 100), ("a", None, 999)], "k string, ts bigint, v int"
    )
    out = asof_join(left, right, key_col="k", ts_col="ts", payload_cols=["v"])
    rows = {(r.tag, r.ts_right, r.v_right) for r in out.collect()}
    assert rows == {("L1", 8, 100), ("LN", None, None)}


def test_asof_randomized_vs_bruteforce(spark):
    """Seeded random tables vs a pandas brute-force oracle: for every
    left row the match is the right row with max (ts, v) among
    right.ts <= left.ts in the key — including cross-side ts ties and
    keys missing from either side."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    nl, nr, nk = 1500, 1500, 40
    lpd = pd.DataFrame({
        "k": rng.integers(0, nk, nl),           # some keys right-only
        "ts": rng.integers(0, 500, nl),         # dense -> many ties
        "lid": np.arange(nl),
    })
    rpd = pd.DataFrame({
        "k": rng.integers(5, nk + 5, nr),       # some keys left-only
        "ts": rng.integers(0, 500, nr),
        "v": rng.integers(0, 10_000, nr),
    })
    left = spark.createDataFrame(lpd.astype("int64"))
    right = spark.createDataFrame(rpd.astype("int64"))
    out = asof_join(left, right, key_col="k", ts_col="ts", payload_cols=["v"])
    got = {r.lid: (r.ts_right, r.v_right) for r in out.collect()}
    assert len(got) == nl

    rgrp = {k: g.sort_values(["ts", "v"]) for k, g in rpd.groupby("k")}
    for row in lpd.itertuples():
        g = rgrp.get(row.k)
        exp = (None, None)
        if g is not None:
            elig = g[g["ts"] <= row.ts]
            if len(elig):
                best = elig.iloc[-1]           # max (ts, v): sorted order
                exp = (int(best["ts"]), int(best["v"]))
        assert got[row.lid] == exp, (row, got[row.lid], exp)


def test_interval_join_bounds_and_bins(spark):
    """Inclusive bounds on both ends, asymmetric windows, negative
    timestamps, and pairs that straddle a bin boundary."""
    from wills_columnar_format_spark.operators.asof import interval_join

    left = spark.createDataFrame(
        [("a", 100, "L1"), ("a", -50, "L2"), ("b", 7, "L3")],
        "k string, ts bigint, tag string",
    )
    right = spark.createDataFrame(
        [("a", 90, 1), ("a", 110, 2), ("a", 111, 3), ("a", -60, 4),
         ("b", 5, 5), ("c", 7, 6)],
        "k string, ts bigint, v int",
    )
    out = interval_join(left, right, key_col="k", ts_col="ts",
                        lower=-10, upper=10)
    got = {(r.tag, r.v_right) for r in out.collect()}
    assert got == {
        ("L1", 1),   # 90 == 100-10: lower bound inclusive
        ("L1", 2),   # 110 == 100+10: upper bound inclusive
        ("L2", 4),   # negative ts, straddles bin boundary at floor(-60/20)
        ("L3", 5),
    }  # 111 is out; key c never joins

    # asymmetric window [0, +15]: only rows at-or-after the left ts
    out2 = interval_join(left, right, key_col="k", ts_col="ts",
                         lower=0, upper=15)
    got2 = {(r.tag, r.v_right) for r in out2.collect()}
    assert got2 == {("L1", 2), ("L1", 3)}


def test_interval_join_randomized_vs_bruteforce(spark):
    """Seeded random tables vs a pandas brute-force inequality join."""
    import numpy as np
    import pandas as pd

    from wills_columnar_format_spark.operators.asof import interval_join

    rng = np.random.default_rng(11)
    nl, nr, nk = 800, 800, 25
    lpd = pd.DataFrame({"k": rng.integers(0, nk, nl),
                        "ts": rng.integers(-1000, 1000, nl),
                        "lid": np.arange(nl)})
    rpd = pd.DataFrame({"k": rng.integers(0, nk, nr),
                        "ts": rng.integers(-1000, 1000, nr),
                        "rid": np.arange(nr)})
    lo, hi = -13, 29
    out = interval_join(
        spark.createDataFrame(lpd.astype("int64")),
        spark.createDataFrame(rpd.astype("int64")),
        key_col="k", ts_col="ts", lower=lo, upper=hi,
    )
    got = {(r.lid, r.rid_right) for r in out.collect()}
    m = lpd.merge(rpd, on="k", suffixes=("_l", "_r"))
    m = m[(m.ts_r >= m.ts_l + lo) & (m.ts_r <= m.ts_l + hi)]
    exp = set(zip(m.lid.tolist(), m.rid.tolist()))
    assert got == exp and len(exp) > 100


def test_asof_null_keys_never_match(spark):
    """SQL join semantics: NULL keys never match (the window partition
    would otherwise group the NULL-key rows together)."""
    left = spark.createDataFrame(
        [(None, 10, "LN"), ("a", 10, "L1")], "k string, ts bigint, tag string"
    )
    right = spark.createDataFrame(
        [(None, 8, 100), ("a", 8, 200)], "k string, ts bigint, v int"
    )
    out = asof_join(left, right, key_col="k", ts_col="ts", payload_cols=["v"])
    rows = {(r.tag, r.v_right) for r in out.collect()}
    assert rows == {("LN", None), ("L1", 200)}


def test_interval_join_beyond_double_precision(spark):
    """Binning is exact int64 arithmetic: values >= 2^53 (where float64
    division misbins) still pair correctly."""
    from wills_columnar_format_spark.operators.asof import interval_join

    base = (1 << 53) + 1  # not representable gap-free in float64
    left = spark.createDataFrame(
        [("a", base, "L1")], "k string, ts bigint, tag string"
    )
    right = spark.createDataFrame(
        [("a", base - 3, 1), ("a", base + 7, 2), ("a", base + 11, 3)],
        "k string, ts bigint, v int",
    )
    out = interval_join(left, right, key_col="k", ts_col="ts",
                        lower=-5, upper=10)
    got = {r.v_right for r in out.collect()}
    assert got == {1, 2}
