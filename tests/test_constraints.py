"""Table constraints (``add_constraint_checkpoint``) — Delta's CHECK /
NOT NULL, validated metadata-first.

ADD CONSTRAINT validates existing data via the value zone maps (only
admit-failed chunks decode, with deletion masks applied); every
subsequent write path — append, upsert, merge, update — re-validates
before anything lands: single appends check their STAGED manifest
files (zone-proof first) and refuse before the move, multi-append
mutations pre-check the batch rows so mask sidecars never land without
their replacements.
"""

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.engine import (
    add_constraint_checkpoint,
    checkpoint_history,
    decode_checkpoint,
    delete_keys_checkpoint,
    drop_column_checkpoint,
    drop_constraint_checkpoint,
    encode_table,
    merge_checkpoint,
    rename_column_checkpoint,
    table_constraints,
    update_where_checkpoint,
    upsert_checkpoint,
    write_checkpoint,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"src{i % 3}", i % 97) for i in range(300)],
        "doc_id long, source string, n_chars long",
    )


@pytest.fixture()
def ckpt(spark, docs, tmp_path):
    path = str(tmp_path / "m")
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=4,
                     chunk_rows=64),
        path, schema=docs.schema)
    return path


def test_check_range_add_and_enforce(spark, docs, ckpt):
    seq = add_constraint_checkpoint(spark, ckpt, "chars_band",
                                    check=("n_chars", 0, 200))
    assert seq == 1
    assert table_constraints(ckpt) == {
        "chars_band": {"kind": "check", "spec": ["n_chars", 0, 200]}}
    # compliant append lands
    ok = spark.createDataFrame(
        [(1000, "a", 150)], "doc_id long, source string, n_chars long")
    write_checkpoint(encode_table(ok, key_col="doc_id",
                                  num_partitions=1), ckpt, mode="append")
    assert decode_checkpoint(spark, ckpt).count() == 301
    # violating append refuses and leaves NOTHING behind
    n_hist = checkpoint_history(spark, ckpt).count()
    bad = spark.createDataFrame(
        [(2000, "b", 100), (2001, "b", 9999)],
        "doc_id long, source string, n_chars long")
    with pytest.raises(ValueError, match="chars_band"):
        write_checkpoint(encode_table(bad, key_col="doc_id",
                                      num_partitions=1),
                         ckpt, mode="append")
    assert decode_checkpoint(spark, ckpt).count() == 301
    assert checkpoint_history(spark, ckpt).count() == n_hist


def test_add_refuses_violating_existing_data(spark, docs, ckpt):
    with pytest.raises(ValueError, match="existing data violates"):
        add_constraint_checkpoint(spark, ckpt, "tight",
                                  check=("n_chars", 0, 50))
    assert table_constraints(ckpt) == {}
    # ... unless the violating rows are deletion-masked
    bad_keys = [i for i in range(300) if i % 97 > 50]
    delete_keys_checkpoint(spark, ckpt, bad_keys, "doc_id")
    add_constraint_checkpoint(spark, ckpt, "tight",
                              check=("n_chars", 0, 50))
    assert "tight" in table_constraints(ckpt)


def test_not_null(spark, ckpt, tmp_path):
    add_constraint_checkpoint(spark, ckpt, "src_nn", not_null="source")
    bad = spark.createDataFrame(
        [(3000, None, 10)], "doc_id long, source string, n_chars long")
    with pytest.raises(ValueError, match="src_nn"):
        write_checkpoint(
            encode_table(bad, key_col="doc_id", num_partitions=1,
                         allow_nulls=True),
            ckpt, mode="append")
    # a fresh checkpoint with masked nulls accepts NOT NULL
    df = spark.createDataFrame(
        [(1, "a", 1), (2, None, 2), (3, "c", 3)],
        "doc_id long, source string, n_chars long")
    p2 = str(tmp_path / "nn")
    write_checkpoint(
        encode_table(df, key_col="doc_id", num_partitions=1,
                     allow_nulls=True),
        p2, schema=df.schema)
    with pytest.raises(ValueError, match="existing data violates"):
        add_constraint_checkpoint(spark, p2, "nn", not_null="source")
    delete_keys_checkpoint(spark, p2, [2], "doc_id")
    add_constraint_checkpoint(spark, p2, "nn", not_null="source")
    assert "nn" in table_constraints(p2)


def test_in_list_upsert_merge_update(spark, docs, ckpt):
    add_constraint_checkpoint(spark, ckpt, "src_enum",
                              check=("source", ["src0", "src1", "src2"]))
    bad = spark.createDataFrame(
        [(5, "rogue", 10)], "doc_id long, source string, n_chars long")
    n0 = decode_checkpoint(spark, ckpt).count()
    with pytest.raises(ValueError, match="src_enum"):
        upsert_checkpoint(spark, ckpt, bad, "doc_id")
    with pytest.raises(ValueError, match="src_enum"):
        merge_checkpoint(spark, ckpt, bad, "doc_id")
    with pytest.raises(ValueError, match="src_enum"):
        update_where_checkpoint(spark, ckpt, ("n_chars", 0, 5),
                                {"source": "rogue"}, "doc_id")
    out = decode_checkpoint(spark, ckpt)
    assert out.count() == n0  # nothing landed, no masked-row loss
    assert out.filter(F.col("source") == "rogue").count() == 0
    ok = bad.withColumn("source", F.lit("src1"))
    upsert_checkpoint(spark, ckpt, ok, "doc_id")
    assert decode_checkpoint(spark, ckpt) \
        .filter(F.col("doc_id") == 5).first().source == "src1"


def test_rename_follows_and_drop_guard(spark, docs, ckpt):
    add_constraint_checkpoint(spark, ckpt, "band",
                              check=("n_chars", 0, 200))
    rename_column_checkpoint(ckpt, "n_chars", "length")
    assert table_constraints(ckpt)["band"]["spec"][0] == "length"
    with pytest.raises(ValueError, match="constraint 'band'"):
        drop_column_checkpoint(spark, ckpt, "length")
    # enforcement still live through the rename
    bad = spark.createDataFrame(
        [(4000, "a", 9999)], "doc_id long, source string, length long")
    with pytest.raises(ValueError, match="band"):
        upsert_checkpoint(spark, ckpt, bad, "doc_id")
    drop_constraint_checkpoint(ckpt, "band")
    assert table_constraints(ckpt) == {}
    upsert_checkpoint(spark, ckpt, bad, "doc_id")  # now allowed
    assert decode_checkpoint(spark, ckpt) \
        .filter(F.col("doc_id") == 4000).first().length == 9999


def test_constraint_api_refusals(spark, docs, ckpt):
    with pytest.raises(ValueError, match="exactly one"):
        add_constraint_checkpoint(spark, ckpt, "x")
    with pytest.raises(ValueError, match="exactly one"):
        add_constraint_checkpoint(spark, ckpt, "x",
                                  check=("n_chars", 0, 1),
                                  not_null="source")
    with pytest.raises(ValueError, match="LIST of allowed"):
        add_constraint_checkpoint(spark, ckpt, "x", check=("source", "a"))
    with pytest.raises(ValueError, match="unknown column"):
        add_constraint_checkpoint(spark, ckpt, "x", check=("zzz", 0, 1))
    add_constraint_checkpoint(spark, ckpt, "dup",
                              check=("n_chars", 0, 200))
    with pytest.raises(ValueError, match="already exists"):
        add_constraint_checkpoint(spark, ckpt, "dup",
                                  check=("n_chars", 0, 300))
    with pytest.raises(ValueError, match="does not exist"):
        drop_constraint_checkpoint(ckpt, "ghost")
