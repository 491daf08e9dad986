"""count_where / sum_where over PERSISTED checkpoints: the metadata
side reads a blob-free manifest projection; only boundary chunks'
files open, through decode_checkpoint's zero-Exchange reader with an
explicit chunk restriction. Pins: exactness vs a plain filtered
aggregate in every configuration; the restriction map is genuinely
small on clustered layouts (and empty for chunk-aligned predicates);
deletion sidecars, as_of time travel, the over-cap degrade, and the
torn-layout fallback all stay exact."""

import os

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark import engine
from wills_columnar_format_spark.engine import (
    _collect_chunk_files,
    _count_where_classify,
    count_where_checkpoint,
    delete_keys_checkpoint,
    encode_table,
    sum_where_checkpoint,
    write_checkpoint,
    write_checkpoint_schema,
)


@pytest.fixture(scope="module")
def ckpt(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(i, i * 3 + (i % 7), float((i * 13) % 2000) / 4.0)
         for i in range(2000)],
        "id long, v long, f double")
    clustered = df.repartitionByRange(4, "v").sortWithinPartitions("v")
    m = encode_table(clustered, key_col="id", partitioner="none",
                     chunk_rows=128, histograms=True)
    d = str(tmp_path_factory.mktemp("where_ckpt") / "m")
    write_checkpoint(m, d, schema=df.schema)
    return df, d


def _count(spark, d, where, **kw):
    return count_where_checkpoint(spark, d, where, **kw).collect()[0]["n_rows"]


def _sum(spark, d, col, where, **kw):
    r = sum_where_checkpoint(spark, d, col, where, **kw).collect()[0]
    return (r["n_rows"], r["n_nonnull"],
            None if r["sum_val"] is None else int(r["sum_val"]),
            r["avg_val"])


def test_count_exact(spark, ckpt):
    df, d = ckpt
    for spec in [("v", 1000, 4000), ("f", 50.0, 400.0),
                 ("v", 10**7, 10**8), ("v", -10**6, 10**9)]:
        exp = df.filter(F.col(spec[0]).between(spec[1], spec[2])).count()
        assert _count(spark, d, spec) == exp
    specs = [("v", 500, 5000), ("f", 10.0, 450.0)]
    exp = df.filter(F.col("v").between(500, 5000)
                    & F.col("f").between(10.0, 450.0)).count()
    assert _count(spark, d, specs) == exp


def test_sum_exact(spark, ckpt):
    df, d = ckpt
    r = _sum(spark, d, "v", ("v", 1000, 4000))
    e = df.filter(F.col("v").between(1000, 4000)).agg(
        F.count(F.lit(1)), F.count("v"), F.sum("v"), F.avg("v")
    ).collect()[0]
    assert r[0] == e[0] and r[1] == e[1] and r[2] == int(e[2])
    assert abs(r[3] - e[3]) < 1e-9


def test_restriction_map_is_small(spark, ckpt):
    df, d = ckpt
    from pyspark.sql.pandas.types import to_arrow_schema

    mdf = spark.read.parquet(d)
    schema = to_arrow_schema(df.schema)
    # interior range on the clustered column: boundary chunks only
    cls = _count_where_classify(mdf, schema, [("v", 1000, 4000)])
    rc = _collect_chunk_files(mdf, cls.filter(F.col("__cls") == "dec"))
    assert rc is not None
    assert sum(len(v) for v in rc.values()) <= 4
    # chunk-aligned full range: nothing decodes at all
    cls2 = _count_where_classify(mdf, schema, [("v", -10**6, 10**9)])
    rc2 = _collect_chunk_files(mdf, cls2.filter(F.col("__cls") == "dec"))
    assert rc2 == {}


def test_deletes_and_as_of(spark, ckpt):
    df, d = ckpt
    delete_keys_checkpoint(spark, d, list(range(500, 520)), key_col="id")
    live = df.filter(~F.col("id").between(500, 519))
    exp = live.filter(F.col("v").between(0, 10**9)).count()
    assert _count(spark, d, ("v", 0, 10**9)) == exp
    s = _sum(spark, d, "v", ("v", 0, 10**9))
    e = live.agg(F.count(F.lit(1)), F.count("v"), F.sum("v")).collect()[0]
    assert s[:3] == (e[0], e[1], int(e[2]))
    # as_of=0 — the pre-delete snapshot
    assert _count(spark, d, ("v", 0, 10**9), as_of=0) == df.count()
    s0 = _sum(spark, d, "v", ("v", 0, 10**9), as_of=0)
    e0 = df.agg(F.count(F.lit(1)), F.sum("v")).collect()[0]
    assert s0[0] == e0[0] and s0[2] == int(e0[1])


def test_over_cap_degrades_exact(spark, ckpt, monkeypatch):
    df, d = ckpt
    monkeypatch.setattr(engine, "VALUE_PRUNE_MAX_KEYS", 1)
    exp = (df.filter(~F.col("id").between(500, 519))
           .filter(F.col("v").between(1000, 4000)).count())
    assert _count(spark, d, ("v", 1000, 4000)) == exp
    s = _sum(spark, d, "v", ("v", 1000, 4000))
    assert s[0] == exp


def test_torn_checkpoint_falls_back_exact(spark, ckpt, tmp_path):
    df, d = ckpt
    # duplicate every manifest row across two writes: the clustered
    # gate must fail and the restricted shuffling fallback still
    # answers exactly (metadata side dedups (chunk_key, column))
    torn = str(tmp_path / "torn")
    src = spark.read.parquet(d)
    src.write.mode("overwrite").parquet(torn)
    src.write.mode("append").parquet(torn)
    write_checkpoint_schema(torn, df.schema)
    live = df.filter(~F.col("id").between(500, 519))
    exp = live.filter(F.col("v").between(1000, 4000)).count()
    with pytest.warns(UserWarning, match="not chunk-clustered"):
        assert _count(spark, torn, ("v", 1000, 4000)) == exp


def test_missing_sidecar_and_validation(spark, ckpt, tmp_path):
    df, d = ckpt
    bare = str(tmp_path / "bare")
    spark.read.parquet(d).write.parquet(bare)
    with pytest.raises(ValueError, match="_table_schema"):
        count_where_checkpoint(spark, bare, ("v", 0, 1))
    assert _count(spark, bare, ("v", 10, 5), out_schema=df.schema) == 0
    with pytest.raises(TypeError):
        sum_where_checkpoint(spark, d, "f", ("v", 0, 1))


def test_unknown_as_of_refused(spark, ckpt):
    df, d = ckpt
    # same contract as decode_checkpoint: an unknown commit seq raises
    with pytest.raises(ValueError, match="not a commit"):
        _count(spark, d, ("v", 0, 10**9), as_of=-1)
    with pytest.raises(ValueError, match="not a commit"):
        _sum(spark, d, "v", ("v", 0, 10**9), as_of=-1)


def test_pending_marker_refused(spark, ckpt, tmp_path):
    import json

    df, d = ckpt
    pend = str(tmp_path / "pend")
    spark.read.parquet(d).write.parquet(pend)
    write_checkpoint_schema(pend, df.schema)
    with open(os.path.join(pend, "_mutation_pending"), "w") as f:
        f.write(json.dumps({"action": "delete", "generation": "g",
                            "before": []}))
    with pytest.raises(IOError, match="_mutation_pending"):
        count_where_checkpoint(spark, pend, ("v", 0, 1))


def test_restriction_map_excludes_sidecar_files(spark, ckpt):
    # deletion sidecars share the chunk_key of their target chunk; the
    # restriction map must never route a sidecar FILE into the per-file
    # data reader (sidecars are delivered out-of-band)
    from pyspark.sql.pandas.types import to_arrow_schema

    df, d = ckpt  # the module fixture already has deletes appended
    mdf = spark.read.parquet(d)
    schema = to_arrow_schema(df.schema)
    cls = _count_where_classify(mdf, schema, [("v", 0, 10**9)])
    rc = _collect_chunk_files(mdf, cls.filter(F.col("__cls") != "out"))
    assert rc
    sidecar_files = {
        r["f"] for r in
        mdf.filter(F.col("column").startswith("__deletes__"))
        .select(F.input_file_name().alias("f")).distinct().collect()}
    assert sidecar_files  # fixture really has sidecars
    assert not (set(rc) & sidecar_files)


def test_added_default_column_predicate_counts(spark, ckpt, tmp_path):
    from wills_columnar_format_spark.engine import (
        add_column_checkpoint, checkpoint_history)

    df, d = ckpt
    dst = str(tmp_path / "added")
    write_checkpoint(spark.read.parquet(d).filter(
        ~F.col("column").startswith("__deletes__")), dst,
        schema=df.schema)
    add_column_checkpoint(dst, "flag", "long", default=5)
    # predicate purely on the metadata-only added column: every chunk
    # decodes (no manifest rows), the projection must self-anchor with
    # a stored column instead of tripping the all-added guard
    n = df.count()
    assert _count(spark, dst, ("flag", 0, 10)) == n
    assert _count(spark, dst, ("flag", 6, 10)) == 0
    s = _sum(spark, dst, "flag", ("flag", 0, 10))
    assert s[:3] == (n, n, 5 * n)
