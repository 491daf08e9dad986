"""Co-located checkpoint join (engine.join_checkpoints).

Two checkpoints encoded on the same key join with ZERO Exchange: file-
level key ranges from the manifests' zone maps pair each left manifest
file with its overlapping right files, and one task per left file
decodes both sides locally and joins in Arrow (surrogate-index Acero
join + take, so list/binary payloads ride through).
"""

import shutil

import pyspark.sql.functions as F
import pytest

from wills_columnar_format_spark.engine import (
    delete_keys_checkpoint,
    encode_table,
    join_checkpoints,
    write_checkpoint_schema,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .withColumnRenamed("vec_id", "doc_id"))


def _ckpt(df, path, key="doc_id", **kw):
    shutil.rmtree(path, ignore_errors=True)
    m = encode_table(df, key_col=key, **kw)
    m.write.parquet(path)
    write_checkpoint_schema(path, df.schema)
    return path


def _rows(df):
    return sorted(map(tuple, df.collect()), key=str)


def test_inner_join_exact_and_shuffle_free(spark, sf_dir, tmp_path):
    docs, emb = _docs(spark, sf_dir), _emb(spark, sf_dir)
    lp = _ckpt(docs, str(tmp_path / "l"), num_partitions=4, chunk_rows=64)
    rp = _ckpt(emb, str(tmp_path / "r"), num_partitions=6, chunk_rows=32)
    j = join_checkpoints(spark, lp, rp, "doc_id")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert _rows(j) == _rows(docs.join(emb, "doc_id").select(*j.columns))


def test_left_join_fills_nulls(spark, sf_dir, tmp_path):
    docs, emb = _docs(spark, sf_dir), _emb(spark, sf_dir)
    emb_half = emb.filter(F.col("doc_id") % 3 == 0)
    lp = _ckpt(docs, str(tmp_path / "l"), num_partitions=3, chunk_rows=64)
    rp = _ckpt(emb_half, str(tmp_path / "r"), num_partitions=2,
               chunk_rows=32)
    j = join_checkpoints(spark, lp, rp, "doc_id", how="left")
    assert _rows(j) == _rows(
        docs.join(emb_half, "doc_id", "left").select(*j.columns))


def test_one_to_many_right(spark, tmp_path):
    left = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv"))
    right = spark.range(600).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("rv"))
    lp = _ckpt(left, str(tmp_path / "l"), key="k", num_partitions=3,
               chunk_rows=32)
    rp = _ckpt(right, str(tmp_path / "r"), key="k", num_partitions=4,
               chunk_rows=32)
    j = join_checkpoints(spark, lp, rp, "k")
    assert _rows(j) == _rows(left.join(right, "k").select(*j.columns))


def test_string_key_join(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    left = docs.select("lang", "doc_id", "n_chars")
    right = (docs.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("lang_total")))
    lp = _ckpt(left, str(tmp_path / "l"), key="lang", num_partitions=3,
               chunk_rows=32)
    rp = _ckpt(right, str(tmp_path / "r"), key="lang", num_partitions=2,
               chunk_rows=8)
    j = join_checkpoints(spark, lp, rp, "lang")
    assert _rows(j) == _rows(left.join(right, "lang").select(*j.columns))


def test_join_respects_deletion_vectors(spark, sf_dir, tmp_path):
    docs, emb = _docs(spark, sf_dir), _emb(spark, sf_dir)
    lp = _ckpt(docs, str(tmp_path / "l"), num_partitions=3, chunk_rows=64)
    rp = _ckpt(emb, str(tmp_path / "r"), num_partitions=3, chunk_rows=64)
    victims = [r.doc_id for r in docs.limit(30).collect()]
    delete_keys_checkpoint(spark, lp, victims, "doc_id")
    j = join_checkpoints(spark, lp, rp, "doc_id")
    want = (docs.filter(~F.col("doc_id").isin(victims))
            .join(emb, "doc_id").select(*j.columns))
    assert _rows(j) == _rows(want)


def test_fallback_on_unclustered_side(spark, sf_dir, tmp_path):
    """A duplicated (resume-merged) manifest fails the clustered gate:
    the join must warn, fall back to the shuffling path, and still be
    exact."""
    docs, emb = _docs(spark, sf_dir), _emb(spark, sf_dir)
    lp = str(tmp_path / "l")
    shutil.rmtree(lp, ignore_errors=True)
    m = encode_table(docs, key_col="doc_id", num_partitions=2,
                     chunk_rows=64)
    m.write.parquet(lp)
    m.write.mode("append").parquet(lp)  # duplicate every chunk
    write_checkpoint_schema(lp, docs.schema)
    rp = _ckpt(emb, str(tmp_path / "r"), num_partitions=2, chunk_rows=64)
    with pytest.warns(UserWarning, match="not chunk-clustered"):
        j = join_checkpoints(spark, lp, rp, "doc_id")
    assert _rows(j) == _rows(docs.join(emb, "doc_id").select(*j.columns))


def test_empty_right_side(spark, sf_dir, tmp_path):
    docs, emb = _docs(spark, sf_dir), _emb(spark, sf_dir)
    lp = _ckpt(docs, str(tmp_path / "l"), num_partitions=2, chunk_rows=64)
    rp = _ckpt(emb.filter(F.lit(False)), str(tmp_path / "r"),
               num_partitions=2, chunk_rows=64)
    assert join_checkpoints(spark, lp, rp, "doc_id").count() == 0
    jl = join_checkpoints(spark, lp, rp, "doc_id", how="left")
    assert jl.count() == docs.count()
    assert jl.filter(F.col("label").isNotNull()).count() == 0


def test_validation_errors(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    lp = _ckpt(docs, str(tmp_path / "l"), num_partitions=2)
    rp = _ckpt(docs.select("doc_id", "lang"), str(tmp_path / "r"),
               num_partitions=2)
    with pytest.raises(ValueError, match="exist on both sides"):
        join_checkpoints(spark, lp, rp, "doc_id")
    with pytest.raises(ValueError, match="inner.*left|left.*inner"):
        join_checkpoints(spark, lp, rp, "doc_id", how="full")
    rp2 = _ckpt(
        docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                    F.col("n_chars").alias("nc2")),
        str(tmp_path / "r2"), num_partitions=2)
    with pytest.raises(TypeError, match="types differ"):
        join_checkpoints(spark, lp, rp2, "doc_id")


def test_left_side_streams_in_slices(spark, monkeypatch, tmp_path):
    """The left side never materializes whole: force tiny join slices
    and check the result is still exact across slice boundaries."""
    import wills_columnar_format_spark.engine as eng

    monkeypatch.setattr(eng, "JOIN_SLICE_ROWS", 50)
    left = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("lv"))
    right = spark.range(0, 1000, 3).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("rv"))
    lp = _ckpt(left, str(tmp_path / "l"), key="k", num_partitions=2,
               chunk_rows=64)
    rp = _ckpt(right, str(tmp_path / "r"), key="k", num_partitions=2,
               chunk_rows=64)
    for how in ("inner", "left"):
        j = join_checkpoints(spark, lp, rp, "k", how=how)
        assert _rows(j) == _rows(
            left.join(right, "k", how).select(*j.columns))


def test_projection_pushdown(spark, sf_dir, tmp_path):
    """left_columns/right_columns prune the decode on each side (the
    key always rides); the joined output carries only those fields."""
    docs, emb = _docs(spark, sf_dir), _emb(spark, sf_dir)
    lp = _ckpt(docs, str(tmp_path / "l"), num_partitions=2, chunk_rows=64)
    rp = _ckpt(emb, str(tmp_path / "r"), num_partitions=2, chunk_rows=64)
    j = join_checkpoints(spark, lp, rp, "doc_id",
                         left_columns=["lang"], right_columns=["label"])
    assert j.columns == ["doc_id", "lang", "label"]
    assert _rows(j) == _rows(
        docs.join(emb, "doc_id").select("doc_id", "lang", "label"))
