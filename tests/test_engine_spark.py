"""End-to-end Spark engine tests: encode the synthetic token table,
decode, assert per-row token-array equality (the BASELINE.json
``input_hint`` invariant) and compressed size <= the plain-equivalent
baseline (the reference-equivalent encoding, BASELINE.md).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.data import ensure_token_table
from wills_columnar_format_spark.engine import (
    decode_table,
    encode_table,
    manifest_summary,
)

N_ROWS = 10_000


@pytest.fixture(scope="module")
def token_df(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tok") / "token_table")
    ensure_token_table(path, N_ROWS, seed=42)
    return spark.read.parquet(path)


@pytest.fixture(scope="module")
def manifest(spark, token_df):
    m = encode_table(token_df, key_col="doc_id", codec="auto", num_partitions=8,
                     chunk_rows=4096, weight_col="n_tok", snapshot_id="test-snap-1")
    m = m.cache()
    m.count()
    return m


def test_manifest_shape(manifest):
    cols = {r.column for r in manifest.select("column").distinct().collect()}
    assert cols == {"doc_id", "tokens#lengths", "tokens#values", "n_tok", "source"}
    row = manifest.first()
    assert row.snapshot_id == "test-snap-1"
    assert row.checksum and row.min_key <= row.max_key


def test_roundtrip_token_array_equality(spark, token_df, manifest):
    """The input_hint per-row invariant: decoded token arrays bit-identical."""
    decoded = decode_table(manifest, token_df.schema)
    joined = (
        decoded.alias("d")
        .join(token_df.alias("o"), "doc_id", "inner")
        .select(
            F.col("doc_id"),
            (F.col("d.tokens") == F.col("o.tokens")).alias("tok_eq"),
            (F.col("d.n_tok") == F.col("o.n_tok")).alias("ntok_eq"),
            (F.col("d.source") == F.col("o.source")).alias("src_eq"),
        )
    )
    agg = joined.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("tok_eq") & F.col("ntok_eq") & F.col("src_eq"), 0).otherwise(1)).alias("bad"),
    ).first()
    assert agg.n == N_ROWS
    assert agg.bad == 0


def test_compressed_size_beats_plain_baseline(spark, token_df, manifest):
    """Auto-selected compressed size <= plain-bincode-equivalent codec on
    identical data/partitioning (the operative reference baseline,
    BASELINE.md 'compressed size')."""
    plain = encode_table(token_df, key_col="doc_id", codec="plain", num_partitions=8,
                         chunk_rows=4096, weight_col="n_tok")
    auto_bytes = manifest.agg(F.sum("bytes_out")).first()[0]
    plain_bytes = plain.agg(F.sum("bytes_out")).first()[0]
    assert auto_bytes <= plain_bytes
    # and it genuinely compresses vs raw input bytes
    bytes_in = manifest.agg(F.sum("bytes_in")).first()[0]
    assert auto_bytes < bytes_in


def test_manifest_summary(manifest):
    summary = manifest_summary(manifest).collect()
    by_col = {r.column: r for r in summary if r.column == "n_tok"}
    total_vals = sum(r.n_values for r in summary if r.column == "n_tok")
    assert total_vals == N_ROWS


def test_values_count_consistency(token_df, manifest):
    """tokens#values logical count equals sum(n_tok) — the reference's
    values_count bookkeeping (org:726-728) at table level."""
    n_tokens = token_df.agg(F.sum("n_tok")).first()[0]
    enc_tokens = (
        manifest.filter(F.col("column") == "tokens#values").agg(F.sum("n_values")).first()[0]
    )
    assert enc_tokens == n_tokens


def test_decode_subset_columns(spark, token_df):
    """Column pruning on the encoded side: decoding only some columns reads
    only their blobs."""
    m = encode_table(token_df.select("doc_id", "source"), key_col="doc_id",
                     num_partitions=4, chunk_rows=4096)
    sub_schema = token_df.select("doc_id", "source").schema
    out = decode_table(m.filter(F.col("column").isin("doc_id", "source")), sub_schema)
    assert out.count() == N_ROWS
    orig = dict(token_df.select("doc_id", "source").collect())
    got = dict(out.collect())
    assert got == orig


def test_empty_dataframe(spark, token_df):
    empty = token_df.limit(0)
    m = encode_table(empty, key_col="doc_id", num_partitions=2)
    assert m.count() == 0
    out = decode_table(m, token_df.schema)
    assert out.count() == 0


def test_temporal_columns_roundtrip(spark):
    """Timestamps/dates ride the integer codecs as epoch ints and are
    restored to their logical type by the output schema on decode."""
    from wills_columnar_format_spark.engine import decode_table, encode_table

    df = spark.sql(
        """
        SELECT id AS k,
               timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts,
               date_add(date'2020-06-01', CAST(id % 365 AS INT)) AS d
        FROM range(5000)
        """
    )
    m = encode_table(df, key_col="k", num_partitions=4, chunk_rows=1024)
    dec = decode_table(m, df.schema)
    assert dec.count() == 5000
    from pyspark.sql import functions as F

    bad = (
        dec.alias("x").join(df.alias("o"), "k")
        .filter((F.col("x.ts") != F.col("o.ts")) | (F.col("x.d") != F.col("o.d")))
        .count()
    )
    assert bad == 0
    assert dict(dec.dtypes)["ts"] == "timestamp" and dict(dec.dtypes)["d"] == "date"


def test_boolean_columns_roundtrip(spark):
    """Booleans ride the integer codecs as uint8 and are restored to
    bool by the output schema on decode — plain, nullable (#valid
    mask), and list<bool> element shapes."""
    from wills_columnar_format_spark.engine import decode_table, encode_table

    df = spark.sql(
        """
        SELECT id AS k,
               id % 3 = 0 AS flag,
               CASE WHEN id % 7 = 0 THEN NULL ELSE id % 2 = 0 END AS maybe,
               array(id % 2 = 0, id % 3 = 0, id % 5 = 0) AS flags
        FROM range(3000)
        """
    )
    m = encode_table(df, key_col="k", num_partitions=4, chunk_rows=512,
                     allow_nulls=True)
    dec = decode_table(m, df.schema)
    assert dict(dec.dtypes)["flag"] == "boolean"
    assert dict(dec.dtypes)["flags"] == "array<boolean>"
    got = sorted(
        (r["k"], r["flag"], r["maybe"], tuple(r["flags"])) for r in dec.collect()
    )
    exp = sorted(
        (r["k"], r["flag"], r["maybe"], tuple(r["flags"])) for r in df.collect()
    )
    assert got == exp


def test_logical_key_columns(spark):
    """key_col may be a logical type: bool and timestamp keys normalize
    to their integer form before chunk checksums / zone maps / blooms
    (same rule as value sub-columns), so flag- or time-keyed encodes
    work instead of raising UnsupportedDataType."""
    from wills_columnar_format_spark.engine import decode_table, encode_table

    df = spark.sql(
        """
        SELECT timestamp'2024-01-01 00:00:00'
                   + make_interval(0,0,0,0,0,0,id) AS ts,
               id % 2 = 0 AS flag,
               id AS v
        FROM range(2000)
        """
    )
    for key in ("ts", "flag"):
        m = encode_table(df, key_col=key, num_partitions=2, chunk_rows=512)
        dec = decode_table(m, df.schema)
        got = sorted((r["ts"], r["flag"], r["v"]) for r in dec.collect())
        exp = sorted((r["ts"], r["flag"], r["v"]) for r in df.collect())
        assert got == exp, f"key_col={key}"


def test_decode_fast_path_equals_slow_path(spark, token_df):
    """assume_unique+arranged skips the decode shuffle entirely; rows must
    still be bit-identical to the input."""
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import decode_table, encode_table

    m = encode_table(token_df, key_col="doc_id", num_partitions=4, chunk_rows=2048)
    dec = decode_table(m, token_df.schema, assume_unique=True, arranged=True)
    assert dec.count() == N_ROWS
    bad = (
        dec.alias("d").join(token_df.alias("o"), "doc_id")
        .filter(
            ~(
                (F.col("d.tokens") == F.col("o.tokens"))
                & (F.col("d.n_tok") == F.col("o.n_tok"))
                & (F.col("d.source") == F.col("o.source"))
            )
        )
        .count()
    )
    assert bad == 0


def test_load_table_adapter(spark, token_df, tmp_path_factory):
    """Source adapter: parquet path -> (df, None, 'parquet'); registered
    catalog table -> readable with snapshot_id None (no Iceberg jars in
    sandbox, SURVEY.md §7.0)."""
    import pyarrow.parquet  # noqa: F401

    from wills_columnar_format_spark.sources import load_table

    path = str(tmp_path_factory.mktemp("src") / "t.parquet")
    token_df.limit(100).write.parquet(path)
    df, snap, kind = load_table(spark, path)
    assert kind == "parquet" and snap is None and df.count() == 100

    token_df.limit(50).createOrReplaceTempView("src_adapter_view")
    df2, snap2, kind2 = load_table(spark, "src_adapter_view")
    assert df2.count() == 50 and snap2 is None and kind2 in ("catalog", "iceberg")


def test_nullable_columns_optin_roundtrip(spark):
    """allow_nulls=True: nullable scalar columns roundtrip with a
    name#valid sub-column; the default path still rejects nulls (the
    reference's no-Option<T> contract, src/lib.rs:59-66)."""
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import decode_table, encode_table

    df = spark.sql(
        """
        SELECT id AS k,
               CASE WHEN id % 3 = 0 THEN NULL ELSE CAST(id * 2 AS INT) END AS v,
               CASE WHEN id % 5 = 0 THEN NULL ELSE concat('s', CAST(id % 7 AS STRING)) END AS s,
               CASE WHEN id % 4 = 0 THEN NULL
                    ELSE timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) END AS ts
        FROM range(8000)
        """
    )
    m = encode_table(df, key_col="k", num_partitions=4, chunk_rows=1024, allow_nulls=True)
    dec = decode_table(m, df.schema, assume_unique=True, arranged=True)
    assert dec.count() == 8000
    bad = (
        dec.alias("d").join(df.alias("o"), "k")
        .filter(
            ~F.col("d.v").eqNullSafe(F.col("o.v"))
            | ~F.col("d.s").eqNullSafe(F.col("o.s"))
            | ~F.col("d.ts").eqNullSafe(F.col("o.ts"))
        )
        .count()
    )
    assert bad == 0
    # null counts preserved exactly
    import math
    nn = dec.agg(
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("nv"),
        F.sum(F.when(F.col("s").isNull(), 1).otherwise(0)).alias("ns"),
    ).collect()[0]
    assert nn.nv == len([i for i in range(8000) if i % 3 == 0])
    assert nn.ns == len([i for i in range(8000) if i % 5 == 0])

    # default path still rejects
    import pytest as _pt
    with _pt.raises(Exception, match="null"):
        encode_table(df, key_col="k", num_partitions=2).count()


def test_nullable_list_columns_optin_roundtrip(spark):
    """allow_nulls=True extends to list columns: a null tokens entry gets a
    #valid mask + empty-list fill; the default path raises instead of
    silently desyncing lengths/values (the corruption ADVICE.md flagged)."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import decode_table, encode_table

    df = spark.sql(
        """
        SELECT id AS k,
               CASE WHEN id % 7 = 0 THEN NULL
                    ELSE transform(sequence(0, CAST(id % 5 AS INT)), x -> CAST(x * id AS INT))
               END AS tokens
        FROM range(6000)
        """
    )
    m = encode_table(df, key_col="k", num_partitions=4, chunk_rows=1024, allow_nulls=True)
    dec = decode_table(m, df.schema, assume_unique=True, arranged=True)
    assert dec.count() == 6000
    bad = (
        dec.alias("d").join(df.alias("o"), "k")
        .filter(~F.col("d.tokens").eqNullSafe(F.col("o.tokens")))
        .count()
    )
    assert bad == 0
    n_null = dec.filter(F.col("tokens").isNull()).count()
    assert n_null == len([i for i in range(6000) if i % 7 == 0])

    # default path: loud rejection, not silent corruption
    with _pt.raises(Exception, match="null"):
        encode_table(df, key_col="k", num_partitions=2).count()


def test_decode_column_pruning(spark):
    """decode_table(columns=[...]) touches only the requested fields'
    blobs (manifest-level projection pushdown) and returns the projected
    schema in the requested order."""
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import decode_table, encode_table

    df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    m = encode_table(df, key_col="doc_id", num_partitions=4)
    dec = decode_table(m, df.schema, assume_unique=True, arranged=True,
                       columns=["doc_id", "lang"])
    assert dec.columns == ["doc_id", "lang"]
    got = {r.doc_id: r.lang for r in dec.collect()}
    want = {r.doc_id: r.lang for r in df.select("doc_id", "lang").collect()}
    assert got == want

    # pruning must reach the checkpointed manifest's parquet scan
    import pytest as _pt

    with _pt.raises(KeyError):
        decode_table(m, df.schema, columns=["doc_id", "nope"])

    ckpt = "/tmp/wcfs_prune_ckpt"
    import shutil
    shutil.rmtree(ckpt, ignore_errors=True)
    m.write.parquet(ckpt)
    m2 = spark.read.parquet(ckpt)
    dec2 = decode_table(m2, df.schema, columns=["doc_id", "n_chars"])
    plan = dec2._jdf.queryExecution().toString()
    assert "PushedFilters" in plan and "doc_id" in plan.split("PushedFilters")[1][:600]
    assert dec2.count() == df.count()


def test_nation_revenue_broadcasts_small_sides(spark):
    """The decoded codec views carry no stats (mapInArrow output), so the
    dimension sides of nation_revenue must be declared broadcast — no
    SortMergeJoin may appear against the lineitem fact side."""
    from wills_columnar_format_spark.operators.registry import REGISTRY

    fn, _ = REGISTRY["nation_revenue"]
    df = fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert df.count() == 25


def test_region_part_revenue_broadcasts_dims(spark):
    """The Q9-style snowflake joins every dimension side as a broadcast
    (decoded views have no stats) — the lineitem fact side never enters
    a SortMergeJoin."""
    from wills_columnar_format_spark.operators.registry import REGISTRY

    fn, _ = REGISTRY["region_part_revenue"]
    df = fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert df.count() > 0


def test_column_stats_metadata_pushdown(spark):
    """engine.column_stats: MIN/MAX/COUNT from zone maps alone must equal
    the real aggregates for clean numeric columns, and must EXCLUDE (not
    mis-report) nullable columns, all-NaN-chunk floats, and strings."""
    import math

    from wills_columnar_format_spark.engine import column_stats, encode_table

    df = spark.sql(
        """
        SELECT id AS k,
               CAST(id * 3 - 7000 AS INT) AS v,
               CAST(id AS DOUBLE) / 8 AS f,
               CASE WHEN id % 3 = 0 THEN NULL ELSE CAST(id AS INT) END AS nv,
               concat('s', CAST(id % 7 AS STRING)) AS s,
               array(CAST(id AS INT), CAST(id + 1 AS INT)) AS arr
        FROM range(8000)
        """
    )
    m = encode_table(df, key_col="k", num_partitions=4, chunk_rows=1024,
                     allow_nulls=True).cache()
    stats = {r.column_name: r for r in column_stats(m).collect()}
    # clean numeric columns: exact
    for col, lo, hi in (("k", 0, 7999), ("v", -7000, 7999 * 3 - 7000),
                        ("f", 0.0, 7999 / 8)):
        r = stats[col]
        assert (r.v_min, r.v_max, r.n_values) == (float(lo), float(hi), 8000), r
    # nullable column excluded (its filler would pollute the extremes)
    assert "nv" not in stats and "nv#valid" not in stats
    # string column has no numeric maps -> excluded
    assert "s" not in stats
    # physical sub-columns of the list column are internals: #values
    # counts ELEMENTS not rows, #lengths would report filler extremes
    # on nullable lists — none may leak into the stats (struct leaves,
    # name#f:field, are the one sanctioned # shape — row-aligned)
    assert not any(
        ("#" in name) and not all(
            seg.startswith("f:") for seg in name.split("#")[1:])
        for name in stats
    ), stats
    assert "arr" not in stats  # list parent has no scalar zone maps
    m.unpersist()

    # a float column where SOME chunk is all-NaN: the min over chunks
    # would silently miss that chunk's (nonexistent) map — the whole
    # column must therefore be excluded, while clean columns survive
    df2 = spark.sql(
        """
        SELECT id AS k,
               CASE WHEN id < 2000 THEN CAST('NaN' AS DOUBLE)
                    ELSE CAST(id AS DOUBLE) END AS g
        FROM range(8000)
        """
    )
    m2 = encode_table(df2, key_col="k", num_partitions=4, chunk_rows=1024,
                      partitioner="range")
    stats2 = {r.column_name: r for r in column_stats(m2).collect()}
    assert "g" not in stats2 and stats2["k"].n_values == 8000


def test_topk_per_group_window_group_limit(spark):
    """topk_per_group's rank-filter form must let Spark insert
    WindowGroupLimit: each map task keeps only its local top-3 per group
    BEFORE the shuffle, so the exchange carries O(groups * k) rows per
    task instead of the corpus — the difference between a per-group sort
    of 100 TB and a bounded merge."""
    from wills_columnar_format_spark.operators.registry import REGISTRY

    fn, _ = REGISTRY["topk_per_group"]
    df = fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    rows = df.collect()
    assert len(rows) == 60  # 20 sources x top-3
    per = {}
    for r in rows:
        per.setdefault(r.source, []).append((r.rk, r.n_tokens))
    for src, rs in per.items():
        rs.sort()
        assert [rk for rk, _ in rs] == [1, 2, 3]
        toks = [t for _, t in rs]
        assert toks == sorted(toks, reverse=True)


def test_split_train_eval_is_shuffle_free_and_stratified(spark):
    """The hash split is a pure per-row function: the physical plan may
    contain NO Exchange, and re-running yields the identical assignment
    (determinism is what makes the split resumable and cluster-size
    independent)."""
    from wills_columnar_format_spark.operators.registry import REGISTRY

    fn, _ = REGISTRY["split_train_eval"]
    df = fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    a = {r.doc_id: r.split for r in df.collect()}
    b = {r.doc_id: r.split for r in fn(spark, "/root/testdata/sf0.001").collect()}
    assert a == b and len(a) > 0
    from collections import Counter
    c = Counter(a.values())
    # ~90/5/5 with hex-prefix thresholds; loose bounds at tiny scale
    assert c["train"] > 0.8 * len(a)
    assert 0 < c["val"] + c["test"] < 0.2 * len(a)


def test_dedup_keep_best_is_window_free(spark):
    """Keep-best selection must compile to partial-aggregating groupBys +
    an equi-join — no Window node (a window would force a full per-group
    sort with no map-side combine). The kept doc is the longest, min
    doc_id on ties, and n_dups counts the whole fingerprint group."""
    from wills_columnar_format_spark.operators.registry import REGISTRY

    fn, _ = REGISTRY["dedup_keep_best"]
    df = fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "HashAggregate" in plan
    rows = df.collect()
    assert len(rows) > 0
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").collect()
    import hashlib
    groups = {}
    for r in docs:
        fp = hashlib.md5(r.text.strip().lower().encode()).hexdigest()
        groups.setdefault(fp, []).append((r.n_chars, r.doc_id))
    for r in rows:
        grp = groups[r.fp]
        assert r.n_dups == len(grp)
        best = max(c for c, _ in grp)
        assert (r.doc_id == min(d for c, d in grp if c == best))
    assert len(rows) == len(groups)
