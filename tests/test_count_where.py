"""COUNT pushdown (``count_where``): SELECT count(*) WHERE <ranges>
answered hybrid — chunks the zone maps prove fully inside every range
contribute their metadata row counts (zero blob bytes), provable misses
contribute nothing, and only boundary chunks decode. Pins: exact
equality with a plain filtered count in every configuration; the
metadata side genuinely engages on clustered layouts; every soundness
degrade (nullable columns, NaN floats, deletion masks, histogram-less
floats, past-2^53 ints) routes to the decode side and stays exact;
input validation fails loudly."""

import math

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.engine import (
    _count_where_classify,
    count_where,
    delete_keys,
    encode_table,
)


def _n(df_out):
    return df_out.collect()[0]["n_rows"]


def _cls_counts(m, schema, specs):
    from pyspark.sql.pandas.types import to_arrow_schema

    cls = _count_where_classify(m, to_arrow_schema(schema), specs)
    out = {r["__cls"]: r["n"] for r in
           cls.groupBy("__cls").agg(F.count("*").alias("n")).collect()}
    return {k: out.get(k, 0) for k in ("out", "in", "dec")}


@pytest.fixture(scope="module")
def clustered(spark):
    # v rides monotone with the range-partitioned key: tight per-chunk
    # zones, the shape the metadata side is built for
    df = spark.createDataFrame(
        [(i, i * 3 + (i % 7), float((i * 13) % 2000) / 4.0)
         for i in range(2000)],
        "id long, v long, f double")
    m = encode_table(df, key_col="id", num_partitions=4, chunk_rows=128,
                     histograms=True).localCheckpoint(eager=True)
    return df, m


def test_exact_vs_filter_all_ranges(spark, clustered):
    df, m = clustered
    for spec in [("v", 100, 3000), ("v", 0, 10**9), ("v", -5, -1),
                 ("f", 10.0, 250.0), ("f", 499.75, 499.75)]:
        c, lo, hi = spec
        exp = df.filter(F.col(c).between(lo, hi)).count()
        assert _n(count_where(m, df.schema, spec)) == exp


def test_multi_range_and(spark, clustered):
    df, m = clustered
    specs = [("v", 1000, 4000), ("f", 50.0, 400.0)]
    exp = df.filter(F.col("v").between(1000, 4000)
                    & F.col("f").between(50.0, 400.0)).count()
    assert _n(count_where(m, df.schema, specs)) == exp


def test_metadata_side_engages_on_clustered(spark, clustered):
    df, m = clustered
    # v is clustered: an interior range must certify interior chunks
    # from metadata and decode only the two boundary chunks' worth
    cc = _cls_counts(m, df.schema, [("v", 1000, 4000)])
    assert cc["in"] > 0 and cc["out"] > 0
    assert cc["dec"] <= 4
    # full-table range: everything certifies 'in', zero decodes
    cc_full = _cls_counts(m, df.schema, [("v", -10**6, 10**7)])
    assert cc_full["dec"] == 0 and cc_full["out"] == 0


def test_nullable_column_decodes_and_counts_exact(spark):
    df = spark.createDataFrame(
        [(i, None if i % 5 == 0 else i * 2) for i in range(1000)],
        "id long, v long")
    m = encode_table(df, key_col="id", num_partitions=2, chunk_rows=128,
                     histograms=True, allow_nulls=True
                     ).localCheckpoint(eager=True)
    # NULL rows never satisfy: SQL semantics
    exp = df.filter(F.col("v").between(100, 900)).count()
    assert _n(count_where(m, df.schema, ("v", 100, 900))) == exp
    # soundness routing: nullable column never certifies 'in'
    cc = _cls_counts(m, df.schema, [("v", -10**6, 10**7)])
    assert cc["in"] == 0


def test_nan_floats_never_count(spark):
    rows = [(i, float("nan") if i % 7 == 0 else float(i))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, f double")
    for hist in (True, False):
        m = encode_table(df, key_col="id", num_partitions=2,
                         chunk_rows=128, histograms=hist
                         ).localCheckpoint(eager=True)
        exp = sum(1 for _, f in rows
                  if not math.isnan(f) and 0.0 <= f <= 1000.0)
        assert _n(count_where(m, df.schema, ("f", 0.0, 1000.0))) == exp
        # NaN-bearing chunks carry no histogram -> never 'in'
        cc = _cls_counts(m, df.schema, [("f", -1e9, 1e9)])
        assert cc["in"] == 0


def test_float_without_histograms_decodes(spark, clustered):
    df, _ = clustered
    m = encode_table(df, key_col="id", num_partitions=4, chunk_rows=128,
                     histograms=False).localCheckpoint(eager=True)
    cc = _cls_counts(m, df.schema, [("f", -1e9, 1e9)])
    assert cc["in"] == 0  # no histogram certificate -> decode
    exp = df.filter(F.col("f").between(10.0, 250.0)).count()
    assert _n(count_where(m, df.schema, ("f", 10.0, 250.0))) == exp
    # ints need no histogram: same manifest still certifies v
    assert _cls_counts(m, df.schema, [("v", -10**6, 10**7)])["in"] > 0


def test_deletion_mask_routes_to_decode(spark, clustered):
    df, m = clustered
    m2 = delete_keys(m, list(range(500, 520)), key_col="id")
    m2 = m2.localCheckpoint(eager=True)
    exp = (df.filter(~F.col("id").between(500, 519))
           .filter(F.col("v").between(0, 10**9)).count())
    assert _n(count_where(m2, df.schema, ("v", 0, 10**9))) == exp
    # masked chunks must not certify 'in'; untouched chunks still do
    cc = _cls_counts(m2, df.schema, [("v", -10**6, 10**7)])
    assert cc["dec"] >= 1 and cc["in"] > 0


def test_big_int64_bounds_route_to_decode(spark):
    big = 2 ** 60
    df = spark.createDataFrame(
        [(i, big + i) for i in range(500)], "id long, v long")
    m = encode_table(df, key_col="id", num_partitions=2, chunk_rows=128
                     ).localCheckpoint(eager=True)
    # |zone bounds| > 2^53: float64 manifest slots round — never trust
    cc = _cls_counts(m, df.schema, [("v", 0, 2 ** 62)])
    assert cc["in"] == 0 and cc["out"] == 0
    assert _n(count_where(m, df.schema, ("v", big + 10, big + 20))) == 11


def test_struct_leaf_range(spark):
    df = spark.createDataFrame(
        [(i, {"a": i * 2, "b": float(i)}) for i in range(600)],
        "id long, s struct<a:long, b:double>")
    m = encode_table(df, key_col="id", num_partitions=2, chunk_rows=128,
                     histograms=True).localCheckpoint(eager=True)
    exp = df.filter(F.col("s.a").between(100, 400)).count()
    assert _n(count_where(m, df.schema, ("s#f:a", 100, 400))) == exp


def test_empty_and_validation(spark, clustered):
    df, m = clustered
    assert _n(count_where(m, df.schema, ("v", 10**7, 10**8))) == 0
    with pytest.raises(ValueError):
        count_where(m, df.schema, [])
    with pytest.raises(TypeError):
        count_where(m, df.schema, ("id", "a", "z"))
    with pytest.raises(TypeError):
        count_where(m, df.schema, ("v", 0, float("nan")))
    with pytest.raises(TypeError):
        count_where(m, df.schema, ("v", 0, float("inf")))
    with pytest.raises(TypeError):
        count_where(m, df.schema, ("v", True, 10))
    with pytest.raises(KeyError):
        count_where(m, df.schema, ("nope", 0, 1))


def test_where_in_string_and_numeric(spark):
    df = spark.createDataFrame(
        [(i, ["en", "fr", "de", "es"][i % 4], i * 3) for i in range(2000)],
        "id long, lang string, v long")
    cl = (df.repartitionByRange(4, "lang", "id")
          .sortWithinPartitions("lang", "id"))
    m = encode_table(cl, key_col="id", partitioner="none", chunk_rows=128
                     ).localCheckpoint(eager=True)
    got = count_where(m, df.schema,
                      where_in=("lang", ["en", "fr"])).collect()[0]["n_rows"]
    assert got == df.filter(F.col("lang").isin("en", "fr")).count()
    # the lang-pure chunks certify from metadata on this layout
    from pyspark.sql.pandas.types import to_arrow_schema
    cls = _count_where_classify(m, to_arrow_schema(df.schema), [],
                                [("lang", ["en", "fr"])])
    dist = {r["__cls"]: r["n"] for r in
            cls.groupBy("__cls").agg(F.count("*").alias("n")).collect()}
    assert dist.get("in", 0) > 0 and dist.get("out", 0) > 0
    # combined range + IN; numeric IN; validation
    got2 = count_where(m, df.schema, ("v", 600, 4000),
                       ("lang", ["en"])).collect()[0]["n_rows"]
    assert got2 == df.filter(F.col("v").between(600, 4000)
                             & (F.col("lang") == "en")).count()
    got3 = count_where(m, df.schema,
                       where_in=("v", [300, 600, 5])).collect()[0]["n_rows"]
    assert got3 == df.filter(F.col("v").isin(300, 600, 5)).count()
    got4 = count_where(m, df.schema,
                       where_in=("lang", ["zz"])).collect()[0]["n_rows"]
    assert got4 == 0
    with pytest.raises(ValueError):
        count_where(m, df.schema)
    with pytest.raises(ValueError):
        count_where(m, df.schema, where_in=("lang", []))
    with pytest.raises(TypeError):
        count_where(m, df.schema, where_in=("lang", [1]))
    with pytest.raises(TypeError):
        count_where(m, df.schema, where_in=("v", [float("nan")]))


def test_where_in_nullable_lang_exact(spark):
    df = spark.createDataFrame(
        [(i, None if i % 7 == 0 else ["en", "fr"][i % 2], i)
         for i in range(1000)],
        "id long, lang string, v long")
    m = encode_table(df, key_col="id", num_partitions=2, chunk_rows=128,
                     allow_nulls=True).localCheckpoint(eager=True)
    got = count_where(m, df.schema,
                      where_in=("lang", ["en"])).collect()[0]["n_rows"]
    assert got == df.filter(F.col("lang") == "en").count()


def test_unpinned_inflight_manifest_is_exact(spark):
    # the classifier and the decode semi-join on content-derived
    # chunk_keys: an in-flight encode with the nondeterministic range
    # sampler MUST be pinned internally (review finding, round 4) —
    # no caller-side localCheckpoint here on purpose
    df = spark.createDataFrame(
        [(i, i * 3) for i in range(3000)], "id long, v long")
    m = encode_table(df, key_col="id", num_partitions=4, chunk_rows=128)
    exp = df.filter(F.col("v").between(1000, 5000)).count()
    assert _n(count_where(m, df.schema, ("v", 1000, 5000))) == exp


def test_out_of_int64_bounds_never_crash(spark, clustered):
    df, m = clustered
    # a range entirely past int64: provably empty, and the literal
    # must never be built (F.lit(2^63) raises NumberFormatException)
    assert _n(count_where(m, df.schema, ("v", 2**63, 2**64))) == 0
    assert _n(count_where(m, df.schema, ("v", -(2**64), -(2**63) - 1))) == 0
    # one bound out of range, range still satisfiable: clamps, exact
    assert _n(count_where(m, df.schema, ("v", -(2**70), 2**70))) \
        == df.count()
    # IN probes outside int64 drop (can't match); all-dropped -> 0
    assert _n(count_where(m, df.schema,
                          where_in=("v", [2**63 + 5]))) == 0
    assert _n(count_where(m, df.schema,
                          where_in=("v", [2**63 + 5, 300]))) \
        == df.filter(F.col("v") == 300).count()
