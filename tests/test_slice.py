"""Row-subset decode (page skipping) + manifest key-range pruning.

The reference records per-page ``values_count``/``file_offset`` exactly
to enable "efficient row skipping" (V1 WIP,
wills-columnar-format.org:187-194; metadata src/lib.rs:68-73); its V0
decoder streams everything (src/decode.rs:52-66). Here we assert our
page-skipping decode returns bit-identical row ranges for every codec,
at every alignment, including ranges inside an RLE run.
"""

import numpy as np
import pytest

from wills_columnar_format_spark.column import (
    decode_column,
    decode_column_slice,
    encode_column,
)
from wills_columnar_format_spark.format import read_footer


def _int_column(n=50_000, seed=7):
    rng = np.random.default_rng(seed)
    # runs + narrow ranges so every codec is viable
    vals = np.repeat(rng.integers(0, 1000, n // 10), 10)[:n].astype(np.int64)
    return vals


@pytest.mark.parametrize("codec", ["plain", "rle", "dict", "for_bitpack", "delta", "dict_rle", "auto"])
@pytest.mark.parametrize(
    "rng_", [(0, 100), (4_990, 5_010), (49_900, 50_000), (0, 50_000), (12_345, 12_346), (7, 7)]
)
def test_slice_int_codecs(codec, rng_):
    vals = _int_column()
    blob, _ = encode_column(vals, codec=codec, target_page_size=4096)
    start, stop = rng_
    out = decode_column_slice(blob, start, stop, dtype=np.int64)
    assert np.array_equal(out.vals, vals[start:stop])


@pytest.mark.parametrize("codec", ["plain", "rle", "dict", "fsst", "dict_rle", "auto"])
def test_slice_string_codecs(codec):
    vals = [f"val-{i % 37:04d}" for i in range(3000) for _ in range(3)]
    blob, _ = encode_column(vals, codec=codec, target_page_size=2048)
    for start, stop in [(0, 10), (4321, 4400), (8990, 9000), (0, 9000)]:
        out = decode_column_slice(blob, start, stop, dtype="string")
        assert out.to_pylist() == vals[start:stop]


def test_slice_touches_only_covering_pages():
    """The point of page skipping: a small range must not decode the
    whole column. We verify via the footer that the range spans few pages
    and that a sliced decode equals the sliced full decode."""
    vals = _int_column()
    blob, _ = encode_column(vals, codec="plain", target_page_size=4096)
    footer = read_footer(blob)
    assert len(footer.pages) > 10  # multi-page column
    full = decode_column(blob, dtype=np.int64)
    out = decode_column_slice(blob, 25_000, 25_050, dtype=np.int64)
    assert np.array_equal(out.vals, full.vals[25_000:25_050])


def test_slice_out_of_range_clamps():
    vals = np.arange(100, dtype=np.int64)
    blob, _ = encode_column(vals, codec="plain")
    assert decode_column_slice(blob, 90, 10_000, dtype=np.int64).vals.tolist() == list(range(90, 100))
    assert decode_column_slice(blob, 500, 600, dtype=np.int64).n == 0


def test_decode_table_key_range_prunes_chunks(spark):
    """Manifest zone-map pruning: a key-range decode touches only chunks
    whose [min_key, max_key] intersects, and returns exactly the rows a
    plain filter would."""
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import decode_table, encode_table

    df = spark.range(0, 20_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("int").alias("v"),
        F.concat(F.lit("s"), (F.col("id") % 13).cast("string")).alias("s"),
    )
    m = encode_table(df, key_col="k", codec="auto", num_partitions=8,
                     partitioner="range", chunk_rows=1024).cache()
    n_chunks_all = m.select("chunk_key").distinct().count()
    lo, hi = 5_000, 5_200
    pruned = m.filter((F.col("max_key_num") >= lo) & (F.col("min_key_num") <= hi))
    n_chunks_hit = pruned.select("chunk_key").distinct().count()
    assert n_chunks_hit < n_chunks_all / 4  # pruning actually skipped most chunks

    dec = decode_table(m, df.schema, key_range=(lo, hi), key_col="k")
    got = sorted(r.k for r in dec.select("k").collect())
    assert got == list(range(lo, hi + 1))
    # values survive the pruned path bit-identically
    bad = (dec.alias("d").join(df.alias("o"), "k")
           .filter((F.col("d.v") != F.col("o.v")) | (F.col("d.s") != F.col("o.s"))).count())
    assert bad == 0
    m.unpersist()


def test_checkpointed_manifest_filter_pushes_to_parquet(spark, tmp_path_factory):
    """On a CHECKPOINTED manifest the zone-map filter must reach the
    parquet scan (PushedFilters) so row-group stats prune I/O — the
    at-scale point-lookup path (a 10^12-row encode's manifest is itself a
    big table)."""
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import decode_table, encode_table

    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("int").alias("v")
    )
    ckpt = str(tmp_path_factory.mktemp("ckpt_push") / "m")
    encode_table(df, key_col="k", num_partitions=4, partitioner="range",
                 chunk_rows=512).write.parquet(ckpt)
    manifest = spark.read.parquet(ckpt)
    dec = decode_table(manifest, df.schema, key_range=(1000, 1100), key_col="k")
    plan = dec._jdf.queryExecution().toString()
    assert "PushedFilters" in plan
    assert "min_key_num" in plan.split("PushedFilters")[1][:400] or \
           "max_key_num" in plan.split("PushedFilters")[1][:400]
    got = sorted(r.k for r in dec.select("k").collect())
    assert got == list(range(1000, 1101))


def test_nan_zone_maps_kept_conservatively(spark):
    """Pre-round-2 encoders stored NaN (not NULL) in min/max_key_num for
    non-numeric keys; Spark evaluates NaN <= hi as false, so a numeric
    key_range against such an old manifest drops every chunk unless the
    opt-in ``legacy_nan_zonemaps`` keep is on (opt-in because isnan is
    not parquet-translatable and would forfeit PushedFilters pruning on
    current-format checkpoints — see the pushdown test above)."""
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import decode_table, encode_table

    df = spark.range(0, 2_000).select(
        F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("k"),
        F.col("id").cast("int").alias("v"),
    )
    m = encode_table(df, key_col="k", num_partitions=2, chunk_rows=256)
    # simulate the old encoder's manifest: NaN zone maps on every chunk
    nan = F.lit(float("nan"))
    m_old = (m.withColumn("min_key_num", nan)
              .withColumn("max_key_num", nan)).localCheckpoint(eager=True)
    dec = decode_table(m_old, df.schema, key_range=(100, 199), key_col="v",
                       legacy_nan_zonemaps=True)
    got = sorted(r.v for r in dec.select("v").collect())
    assert got == list(range(100, 200))
    # without the flag the NaN chunks are (documentedly) pruned away
    dec0 = decode_table(m_old, df.schema, key_range=(100, 199), key_col="v")
    assert dec0.count() == 0


def test_numeric_range_on_string_keyed_manifest_not_silently_empty(spark):
    """A numeric key_range against a manifest whose key column is a
    STRING (zone maps NULL) must keep chunks conservatively and
    exact-filter after decode — not silently return nothing."""
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import decode_table, encode_table

    df = spark.range(0, 2_000).select(
        F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("k"),
        F.col("id").cast("int").alias("v"),
    )
    m = encode_table(df, key_col="k", num_partitions=2, chunk_rows=256)
    # numeric range with a numeric VALUE column as post-filter target:
    # zone maps are NULL (string key), so every chunk is kept; the exact
    # post-filter on v selects the rows
    dec = decode_table(m, df.schema, key_range=(100, 199), key_col="v")
    got = sorted(r.v for r in dec.select("v").collect())
    assert got == list(range(100, 200))


def test_value_range_decode_prunes_and_is_exact(spark):
    """Value zone maps on a NON-key column: when the data is clustered
    on that column (here: v monotone in the range-partitioned key), a
    value_range decode touches a fraction of the chunks and returns
    exactly the rows a plain filter would."""
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import (
        _value_range_keys,
        decode_table,
        encode_table,
    )

    df = spark.range(0, 20_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),          # monotone in k: clustered
        (F.col("id") % 13).cast("int").alias("w"),
    )
    m = encode_table(df, key_col="k", num_partitions=8, partitioner="range",
                     chunk_rows=1024).cache()
    try:
        n_all = m.select("chunk_key").distinct().count()
        lo, hi = 30_000, 30_600  # v in [30000, 30600] -> k in [10000, 10200]
        n_hit = (_value_range_keys(m, ("v", lo, hi))
                 .select("chunk_key").distinct().count())
        assert n_hit < n_all / 4  # pruning really skipped most chunks
        dec = decode_table(m, df.schema, value_range=("v", lo, hi))
        got = sorted(r.v for r in dec.select("v").collect())
        assert got == [v for v in range(0, 60_000, 3) if lo <= v <= hi]
        # full rows survive (the non-filtered column too)
        bad = (dec.alias("d").join(df.alias("o"), "k")
               .filter(F.col("d.w") != F.col("o.w")).count())
        assert bad == 0
    finally:
        m.unpersist()


def test_value_range_on_uncorrelated_column_still_exact(spark):
    """On a column uncorrelated with the layout the zone maps prune
    nothing — the decode must degrade to a plain filter, never drop or
    duplicate rows."""
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import decode_table, encode_table

    df = spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("int").alias("v")
    )
    m = encode_table(df, key_col="k", num_partitions=4, partitioner="range",
                     chunk_rows=512)
    dec = decode_table(m, df.schema, value_range=("v", 10, 12))
    assert dec.count() == df.filter((F.col("v") >= 10) & (F.col("v") <= 12)).count()


def test_value_range_requires_column_in_output(spark):
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import decode_table, encode_table

    df = spark.range(0, 100).select(F.col("id").alias("k"), F.col("id").alias("v"))
    m = encode_table(df, key_col="k", num_partitions=2)
    import pytest as _pt

    with _pt.raises(KeyError, match="value_range"):
        decode_table(m, df.schema, columns=["k"], value_range=("v", 0, 10))


def test_value_range_extremes_never_lose_rows(spark):
    """Zone-map widening at the edges: huge int64s (beyond float64's
    exact range), negatives, and NaN floats must never cause a
    value_range decode to DROP matching rows (conservative-keep is the
    invariant; extra chunks are removed by the exact post-filter)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import decode_table, encode_table

    rng = np.random.default_rng(5)
    n = 4_000
    big = rng.integers(2**62, 2**63 - 1, n // 4, dtype=np.int64)
    neg = rng.integers(-(2**62), 0, n // 4, dtype=np.int64)
    mid = rng.integers(-1000, 1000, n // 2, dtype=np.int64)
    v = np.concatenate([big, neg, mid])
    f = rng.standard_normal(n)
    pdf = pd.DataFrame({
        "k": np.arange(n, dtype=np.int64),
        "v": v,
        "f": f,
    })
    # NaN must be injected Spark-side: createDataFrame turns pandas NaN
    # into NULL, which the null-free default format rejects
    df = spark.createDataFrame(pdf).withColumn(
        "f", F.when(F.col("k") % 20 == 0, F.lit(float("nan"))).otherwise(F.col("f"))
    )
    f = np.where(np.arange(n) % 20 == 0, np.nan, f)
    m = encode_table(df, key_col="k", num_partitions=4, partitioner="range",
                     chunk_rows=256).cache()
    try:
        for lo, hi in [
            (int(v.min()), int(v.min()) + 10),          # at the low edge
            (2**62 + 5, 2**63 - 1),                      # huge positives
            (-50, 50),                                   # dense middle
        ]:
            dec = decode_table(m, df.schema, value_range=("v", lo, hi))
            got = sorted(r.v for r in dec.select("v").collect())
            exp = sorted(int(x) for x in v[(v >= lo) & (v <= hi)])
            assert got == exp, (lo, hi)
        # float column with NaNs: range filter never returns NaN rows and
        # never loses finite matches
        dec = decode_table(m, df.schema, value_range=("f", -0.5, 0.5))
        got = sorted(r.f for r in dec.select("f").collect())
        fin = f[~np.isnan(f)]
        exp = sorted(float(x) for x in fin[(fin >= -0.5) & (fin <= 0.5)])
        assert got == exp
    finally:
        m.unpersist()


def test_value_range_on_timestamp_column(spark):
    """Temporal columns ride the integer codecs as epoch micros, and
    their zone maps are queryable: value_range with naive datetime
    bounds on a TIMESTAMP_NTZ column equals the plain filter (the shift
    through the session timezone cancels)."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import decode_table, encode_table

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", "event_type"
    )
    m = encode_table(df, key_col="event_id", num_partitions=2,
                     chunk_rows=512).cache()
    try:
        lo, hi = datetime(2024, 1, 5, 0, 0), datetime(2024, 1, 7, 12, 0)
        dec = decode_table(m, df.schema, value_range=("ts", lo, hi))
        exp = df.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
        assert dec.count() == exp.count()
        if exp.count():
            bad = (dec.alias("d").join(exp.alias("o"), "event_id")
                   .filter(F.col("d.ts") != F.col("o.ts")).count())
            assert bad == 0
    finally:
        m.unpersist()
    # unsupported types (list columns) fail loudly, not silently; and
    # string bounds on a string column must be rejected only for
    # non-str bound values
    import pytest as _pt

    toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mt = encode_table(toks.select("doc_id", "text", "n_chars"),
                      key_col="doc_id", num_partitions=2)
    with _pt.raises(TypeError, match="value_range"):
        decode_table(m, df.schema, value_range=("ts", "a", "b"))
    with _pt.raises(TypeError, match="str bounds"):
        decode_table(mt, toks.select("doc_id", "text", "n_chars").schema,
                     value_range=("text", 1, 2))


def test_value_range_ntz_bounds_survive_session_timezone(spark):
    """The NTZ exact-filter literals must be timezone-free: with the
    session timezone set away from the driver's, lit(naive).cast(ntz)
    would shift the bounds by the tz offset and silently drop boundary
    rows. The string->NTZ construction involves no timezone, so the
    result must match a driver-side Python filter exactly under ANY
    session tz (regression for ADVICE r3 high)."""
    from datetime import datetime

    from wills_columnar_format_spark.engine import decode_table, encode_table

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts"
    )
    # driver-side ground truth: NTZ collects as naive wall datetimes,
    # independent of session timezone
    rows = {r["event_id"]: r["ts"] for r in df.collect()}
    lo, hi = datetime(2024, 1, 5, 0, 0), datetime(2024, 1, 7, 12, 0)
    expected = {k for k, ts in rows.items() if lo <= ts <= hi}
    assert expected, "bounds must hit some rows for the test to bite"

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("America/Los_Angeles", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            m = encode_table(df, key_col="event_id", num_partitions=2,
                             chunk_rows=512).cache()
            try:
                got = {
                    r["event_id"]
                    for r in decode_table(
                        m, df.schema, value_range=("ts", lo, hi)
                    ).collect()
                }
            finally:
                m.unpersist()
            assert got == expected, f"NTZ bounds shifted under session tz {tz}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_value_range_string_column(spark):
    """String value zone maps (VERDICT r3 #6): a value_range with str
    bounds prunes chunks by val_min_str/val_max_str and exact-filters
    the decoded rows — equal to a plain string-range filter."""
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import (
        _value_range_keys,
        decode_table,
        encode_table,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    m = encode_table(df, key_col="doc_id", num_partitions=2, chunk_rows=64).cache()
    try:
        dec = decode_table(m, df.schema, value_range=("lang", "de", "fr"))
        got = sorted(r["doc_id"] for r in dec.collect())
        exp = sorted(
            r["doc_id"]
            for r in df.filter((F.col("lang") >= "de") & (F.col("lang") <= "fr")).collect()
        )
        assert got == exp and got
    finally:
        m.unpersist()


def test_value_range_string_prunes_correlated_layout(spark, tmp_path):
    """With a string column correlated to the key order (range layout),
    the string zone maps prune most chunks — and on a checkpoint the
    decode schedules fewer files, still zero Exchange."""
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import (
        _value_range_keys,
        decode_checkpoint,
        encode_table,
    )

    df = spark.range(0, 20_000).select(
        F.col("id").alias("k"),
        F.format_string("s%08d", F.col("id")).alias("s"),
    )
    m = encode_table(df, key_col="k", num_partitions=8, partitioner="range",
                     chunk_rows=1024).cache()
    try:
        n_all = m.select("chunk_key").distinct().count()
        n_hit = (_value_range_keys(m, ("s", "s00001000", "s00001500"))
                 .select("chunk_key").distinct().count())
        assert n_hit < n_all / 4
    finally:
        m.unpersist()
    path = str(tmp_path / "ckpt_str")
    encode_table(df, key_col="k", num_partitions=8, partitioner="range",
                 chunk_rows=1024).write.parquet(path)
    full = decode_checkpoint(spark, path, df.schema)
    hit = decode_checkpoint(spark, path, df.schema,
                            value_range=("s", "s00001000", "s00001500"))
    assert "Exchange" not in hit._jdf.queryExecution().executedPlan().toString()
    assert hit.rdd.getNumPartitions() < full.rdd.getNumPartitions()
    got = sorted(r["s"] for r in hit.collect())
    assert got == [f"s{i:08d}" for i in range(1000, 1501)]


def test_string_bound_truncation_conservative(spark):
    """Bounds longer than 256 chars: min stores a prefix (valid lower
    bound), max stores NULL (+inf) — a range beyond the prefix must
    still KEEP the chunk (no false drops), and the exact filter stays
    correct."""
    import pandas as pd
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import decode_table, encode_table

    long_a = "a" * 500
    long_z = "z" * 500
    pdf = pd.DataFrame({
        "k": list(range(6)),
        "s": [long_a, "mmm", long_z, "qqq", "bbb", "yyy"],
    })
    df = spark.createDataFrame(pdf)
    m = encode_table(df, key_col="k", num_partitions=1, chunk_rows=3).cache()
    try:
        row = m.filter(F.col("column") == "s").select("val_min_str", "val_max_str").collect()
        # at least one chunk holds a >256-char max -> NULL upper bound
        assert any(r["val_max_str"] is None for r in row)
        assert all(r["val_min_str"] is None or len(r["val_min_str"]) <= 256 for r in row)
        # the long_z row sorts above every storable bound: must survive
        dec = decode_table(m, df.schema, value_range=("s", "z", "zzzzzz" * 200))
        assert [r["s"] for r in dec.collect()] == [long_z]
    finally:
        m.unpersist()


def test_persisted_manifest_value_range_skips_materialization(spark, tmp_path, monkeypatch):
    """A persisted manifest (parquet scan + the done-marker filter) must
    NOT be localCheckpoint-ed by the value_range path: pinning it would
    materialize every blob into executor storage for nothing. An
    in-flight manifest (encode lineage) MUST be pinned (nondeterministic
    range sampling would otherwise yield different chunk keys between
    the hit subquery and the main pass)."""
    from wills_columnar_format_spark.engine import (
        _cheap_rescan, decode_table, encode_table)

    df = spark.range(0, 2000).selectExpr("id as k", "id % 97 as v")
    path = str(tmp_path / "m")
    encode_table(df, key_col="k", num_partitions=2, chunk_rows=256).write.parquet(path)

    persisted = spark.read.parquet(path)
    # patch the CONCRETE class (pyspark.sql.classic overrides the base)
    cls = type(persisted)
    calls = []
    orig = cls.localCheckpoint

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(cls, "localCheckpoint", spy)
    dec = decode_table(persisted, df.schema, value_range=("v", 10, 20))
    n = dec.count()
    assert n == df.filter("v between 10 and 20").count()
    assert not calls, "persisted manifest was needlessly localCheckpoint-ed"

    inflight = encode_table(df, key_col="k", num_partitions=2, chunk_rows=256)
    decode_table(inflight, df.schema, value_range=("v", 10, 20)).count()
    assert calls, "in-flight manifest must be pinned before the hit subquery"

    # the gate itself: scan+deterministic-filter is cheap, rand() is not
    assert _cheap_rescan(persisted.filter("column <> '__done__'"))
    assert not _cheap_rescan(persisted.filter("rand() > 0.5"))
    assert not _cheap_rescan(inflight)


def test_value_range_conjunction(spark):
    """A LIST of value ranges AND-combines: one aggregate keeps chunks
    whose zone maps satisfy every predicate; exact filters for all.
    Two predicates on the SAME column intersect correctly (the range
    index, not the column, is what's counted)."""
    from wills_columnar_format_spark.engine import (
        _conjunctive_hit_keys, _prepare_value_range, decode_table,
        encode_table)

    df = spark.range(0, 20000).selectExpr(
        "id as k", "id % 97 as v", "cast(id / 100 as bigint) as w")
    m = encode_table(df, key_col="k", num_partitions=4, chunk_rows=512,
                     partitioner="hash").localCheckpoint(eager=True)
    got = decode_table(m, df.schema,
                       value_range=[("v", 10, 20), ("w", 50, 60)]).count()
    assert got == df.filter("v between 10 and 20 and w between 50 and 60").count()
    got2 = decode_table(m, df.schema,
                        value_range=[("v", 10, 40), ("v", 30, 90)]).count()
    assert got2 == df.filter("v between 30 and 40").count()
    # conjunction prunes at least as tightly as the tighter predicate
    # (w is key-correlated: w in [50,60] hits ~1/18 of chunks)
    import pyarrow as pa
    schema = pa.schema([pa.field("k", pa.int64()), pa.field("v", pa.int64()),
                        pa.field("w", pa.int64())])
    vrs = [_prepare_value_range(schema, ("v", 10, 20)),
           _prepare_value_range(schema, ("w", 50, 60))]
    n_both = _conjunctive_hit_keys(m, vrs).count()
    n_w = _conjunctive_hit_keys(m, vrs[1:]).count()
    n_all = m.select("chunk_key").distinct().count()
    assert n_both <= n_w < n_all


def test_keys_point_set_lookup(spark):
    """keys=[...] decodes the union of matching chunks and exact-filters
    to the set; misses and empty sets behave."""
    from wills_columnar_format_spark.engine import decode_table, encode_table

    df = spark.range(0, 20000).selectExpr("id as k", "id % 97 as v")
    m = encode_table(df, key_col="k", num_partitions=4, chunk_rows=512,
                     partitioner="hash").localCheckpoint(eager=True)
    got = sorted(r["k"] for r in
                 decode_table(m, df.schema, keys=[5, 777, 19999, 123456],
                              key_col="k").collect())
    assert got == [5, 777, 19999]
    assert decode_table(m, df.schema, keys=[], key_col="k").count() == 0
    # without key_col: chunk-granular superset containing all hits —
    # on a RANGE layout key 5 lives in one tight chunk, so the superset
    # is small; the hash layout above has domain-wide chunk ranges and
    # would keep most chunks (pruning is layout-dependent by design)
    mr = encode_table(df, key_col="k", num_partitions=4, chunk_rows=512,
                      partitioner="range").localCheckpoint(eager=True)
    loose = decode_table(mr, df.schema, keys=[5]).count()
    assert 0 < loose <= 512 * 2


def test_keys_checkpoint_prunes_files(spark, tmp_path):
    """Multi-point lookup on a checkpoint: file-level pruning schedules
    fewer tasks, zero Exchange, pushed per-key containment filter."""
    from wills_columnar_format_spark.engine import (
        decode_checkpoint, encode_table)

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang", "n_chars")
    ck = str(tmp_path / "m")
    encode_table(docs, key_col="doc_id", num_partitions=4, chunk_rows=64,
                 partitioner="range").write.parquet(ck)
    want = [r["doc_id"] for r in docs.orderBy("doc_id").limit(5).collect()]
    dec = decode_checkpoint(spark, ck, docs.schema, keys=want,
                            key_col="doc_id")
    assert "Exchange" not in dec._jdf.queryExecution().executedPlan().toString()
    assert sorted(r["doc_id"] for r in dec.collect()) == sorted(want)
    full = decode_checkpoint(spark, ck, docs.schema)
    assert dec.rdd.getNumPartitions() < full.rdd.getNumPartitions()


def test_keys_mixed_types_raise_and_casts_work(spark):
    """A mixed key set must raise loudly (one stray string would flip
    numeric keys into lexicographic containment and silently prune real
    matches); >1000 int keys against a DOUBLE key column must cast, not
    trip createDataFrame's type verifier."""
    from wills_columnar_format_spark.engine import decode_table, encode_table

    df = spark.range(0, 3000).selectExpr("cast(id as double) as k",
                                         "id % 7 as v")
    m = encode_table(df, key_col="k", num_partitions=2,
                     chunk_rows=256).localCheckpoint(eager=True)
    with pytest.raises(TypeError, match="all-numeric or all-string"):
        decode_table(m, df.schema, keys=[7, "x"], key_col="k").count()
    big = list(range(0, 1001))  # > _KEY_SET_ISIN_MAX -> semi-join path
    got = decode_table(m, df.schema, keys=big, key_col="k").count()
    assert got == 1001


def test_keys_plus_value_range_persisted_skips_materialization(
        spark, tmp_path, monkeypatch):
    """keys= must not defeat the persisted-manifest _cheap_rescan gate:
    combining it with value_range= on a parquet manifest still runs with
    zero localCheckpoint calls (the keys join applies after the gate)."""
    from wills_columnar_format_spark.engine import decode_table, encode_table

    df = spark.range(0, 5000).selectExpr("id as k", "id % 97 as v")
    path = str(tmp_path / "m")
    encode_table(df, key_col="k", num_partitions=2,
                 chunk_rows=512).write.parquet(path)
    persisted = spark.read.parquet(path)
    cls = type(persisted)
    calls = []
    orig = cls.localCheckpoint

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(cls, "localCheckpoint", spy)
    got = sorted(r["k"] for r in decode_table(
        persisted, df.schema, keys=[10, 20, 4999],
        value_range=("v", 0, 96), key_col="k").collect())
    assert got == [10, 20, 4999]
    assert not calls


def test_keys_value_range_and_projection_compose_on_checkpoint(spark, tmp_path):
    """All three pruning/projection axes at once on the shuffle-free
    path: keys= x value_range= x columns= — results equal the plain
    filters, zero Exchange."""
    from wills_columnar_format_spark.engine import (
        decode_checkpoint, encode_table)

    df = spark.range(0, 10000).selectExpr(
        "id as k", "id % 97 as v", "id % 13 as w")
    ck = str(tmp_path / "m")
    encode_table(df, key_col="k", num_partitions=4, chunk_rows=512,
                 partitioner="range").write.parquet(ck)
    dec = decode_checkpoint(
        spark, ck, df.schema, keys=list(range(0, 10000, 500)), key_col="k",
        value_range=[("v", 0, 50)], columns=["k", "v"])
    assert "Exchange" not in dec._jdf.queryExecution().executedPlan().toString()
    assert dec.columns == ["k", "v"]
    exp = sorted(r["k"] for r in df.filter(
        "k % 500 = 0 and v between 0 and 50").collect())
    assert sorted(r["k"] for r in dec.collect()) == exp and exp


def test_temporal_point_lookup_keys(spark, tmp_path):
    """keys= with naive datetime values on a TIME-KEYED manifest: the
    probes canonicalize to epoch micros for zone-map/bloom pruning and
    the exact filter joins timezone-free against the decoded NTZ
    column — correct even when session tz != driver tz (the lit()
    hazard), on both decode paths, and pruning engages."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import (
        _prune_by_key_set,
        decode_checkpoint,
        decode_table,
        encode_table,
        write_checkpoint,
    )

    df = spark.sql(
        """
        SELECT timestamp_ntz'2024-01-01 00:00:00'
                   + make_interval(0,0,0,0,0,0,id * 60) AS ts,
               id AS v
        FROM range(20000)
        """
    )
    want = [datetime(2024, 1, 1, 1, 0), datetime(2024, 1, 3, 5, 7),
            datetime(2024, 1, 9, 0, 0)]
    exp = sorted(
        (r["ts"], r["v"]) for r in df.filter(
            F.col("ts").isin([w.strftime("%Y-%m-%d %H:%M:%S") for w in want])
        ).collect()
    )
    assert len(exp) == 3  # minute grid: every probe hits exactly one row

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        m = encode_table(df, key_col="ts", num_partitions=4,
                         partitioner="range", chunk_rows=1024).cache()
        try:
            # pruning engages: the probe keeps a strict subset of chunks
            n_all = m.select("chunk_key").distinct().count()
            n_hit = (_prune_by_key_set(
                m, [int((w - datetime(1970, 1, 1)).total_seconds() * 1_000_000)
                    for w in want])
                .select("chunk_key").distinct().count())
            assert 0 < n_hit < n_all / 2

            dec = decode_table(m, df.schema, keys=want, key_col="ts")
            got = sorted((r["ts"], r["v"]) for r in dec.collect())
            assert got == exp

            ckpt = str(tmp_path / "tsckpt")
            write_checkpoint(m, ckpt, schema=df.schema)
        finally:
            m.unpersist()
        dec2 = decode_checkpoint(spark, ckpt, keys=want, key_col="ts")
        got2 = sorted((r["ts"], r["v"]) for r in dec2.collect())
        assert got2 == exp
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)

    # tz-aware probes and temporal key_range bounds are refused loudly
    import pytest as _pytest
    from datetime import timezone

    with _pytest.raises(TypeError, match="NAIVE"):
        decode_table(m, df.schema,
                     keys=[want[0].replace(tzinfo=timezone.utc)], key_col="ts")
    with _pytest.raises(TypeError, match="value_range"):
        decode_table(m, df.schema, key_range=(want[0], want[1]), key_col="ts")


def test_temporal_point_lookup_bloom_hash_layout(spark, tmp_path):
    """datetime keys= on a HASH-layout time-keyed manifest: zone maps
    keep everything (every chunk spans the full time range), so the
    per-chunk key blooms must prune — probes hash the canonicalized
    epoch micros, matching what the encode-side bloom build saw."""
    from datetime import datetime

    from wills_columnar_format_spark.engine import (
        _bloom_keep_chunks,
        decode_table,
        encode_table,
    )

    df = spark.sql(
        """
        SELECT timestamp_ntz'2024-01-01 00:00:00'
                   + make_interval(0,0,0,0,0,0,id * 60) AS ts,
               id AS v
        FROM range(8000)
        """
    )
    want = [datetime(2024, 1, 2, 3, 4)]
    m = encode_table(df, key_col="ts", num_partitions=4,
                     partitioner="hash", chunk_rows=1024).cache()
    try:
        epoch = [int((want[0] - datetime(1970, 1, 1)).total_seconds() * 1e6)]
        keep = _bloom_keep_chunks(
            m.filter("column = 'ts'"), epoch, "ts")
        assert keep is not None
        n_all = m.select("chunk_key").distinct().count()
        assert 0 < len(keep) < n_all  # blooms pruned hash-layout chunks
        dec = decode_table(m, df.schema, keys=want, key_col="ts")
        rows = dec.collect()
        assert len(rows) == 1 and rows[0]["ts"] == want[0]
    finally:
        m.unpersist()
