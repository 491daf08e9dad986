"""The `wcfs` Spark Python DataSource: SQL-native reads/writes over
columnar checkpoints (datasource.py). Covers the write->read roundtrip,
the default always-correct mode under mixed query sequences (the Spark
4.1 readInfo-cache hazard), opt-in pushdown pruning, overwrite
semantics, deletion vectors, and the clustered-layout refusal."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark import data
from wills_columnar_format_spark.datasource import register


@pytest.fixture(scope="module")
def token_df(spark):
    register(spark)
    t = data.token_table_arrow(3000, seed=21)
    return spark.createDataFrame(t.to_pandas()).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def table_dir(spark, token_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wcfs") / "tbl")
    (token_df.repartition(4, "doc_id").sortWithinPartitions("doc_id")
     .write.format("wcfs").mode("append").option("key_col", "doc_id")
     .option("chunk_rows", "256").option("value_blooms", "true").save(d))
    return d


def test_write_read_roundtrip(spark, token_df, table_dir):
    r = spark.read.format("wcfs").load(table_dir)
    assert r.count() == token_df.count()
    bad = (r.alias("a").join(token_df.alias("b"), "doc_id")
           .filter((F.col("a.tokens") != F.col("b.tokens"))
                   | (F.col("a.n_tok") != F.col("b.n_tok"))
                   | (F.col("a.source") != F.col("b.source"))).count())
    assert bad == 0
    # self-describing: the writer left a _table_schema sidecar
    assert r.schema == token_df.schema


def test_default_mode_safe_under_mixed_queries(spark, token_df, table_dir):
    # the Spark 4.1 hazard sequence: filtered plan, then filterless on
    # the SAME DataFrame/view — default mode must not lose rows
    r = spark.read.format("wcfs").load(table_dir)
    n_flt = token_df.where("n_tok > 1500").count()
    assert r.where("n_tok > 1500").count() == n_flt
    assert r.count() == token_df.count()
    r.createOrReplaceTempView("wcfs_tok")
    a = spark.sql("SELECT source, COUNT(*) AS n, SUM(n_tok) AS s "
                  "FROM wcfs_tok GROUP BY source ORDER BY source").collect()
    b = (token_df.groupBy("source")
         .agg(F.count("*").alias("n"), F.sum("n_tok").alias("s"))
         .orderBy("source").collect())
    assert [tuple(x) for x in a] == [tuple(x) for x in b]


def test_pushdown_prunes_and_stays_exact(spark, token_df, table_dir):
    key = token_df.select("doc_id").orderBy("doc_id").first()[0]
    rp = spark.read.format("wcfs").option("pushdown", "true").load(table_dir)
    q = rp.where(F.col("doc_id") == key)
    rows = q.collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == key
    # range-partitioned on doc_id + bloom: the point query touches
    # fewer than the 4 written files
    assert q.rdd.getNumPartitions() < 4
    # fresh load per query shape (the documented pushdown contract)
    rp2 = spark.read.format("wcfs").option("pushdown", "true").load(table_dir)
    got = sorted(r["doc_id"] for r in
                 rp2.where(F.col("source").isin("wiki", "code"))
                 .select("doc_id").collect())
    exp = sorted(r["doc_id"] for r in
                 token_df.where(F.col("source").isin("wiki", "code"))
                 .select("doc_id").collect())
    assert got == exp
    rp3 = spark.read.format("wcfs").option("pushdown", "true").load(table_dir)
    assert rp3.where("n_tok >= 1000").count() == \
        token_df.where("n_tok >= 1000").count()


def test_overwrite_replaces_snapshot(spark, token_df, tmp_path):
    d = str(tmp_path / "tbl")
    (token_df.repartition(2).write.format("wcfs").mode("append")
     .option("key_col", "doc_id").save(d))
    (token_df.limit(100).repartition(1).write.format("wcfs")
     .mode("overwrite").option("key_col", "doc_id").save(d))
    assert spark.read.format("wcfs").load(d).count() == 100


def test_deletion_vectors_apply(spark, token_df, tmp_path):
    from wills_columnar_format_spark.engine import delete_keys_checkpoint

    d = str(tmp_path / "tbl")
    (token_df.repartition(2, "doc_id").sortWithinPartitions("doc_id")
     .write.format("wcfs").mode("append").option("key_col", "doc_id")
     .option("chunk_rows", "256").save(d))
    victims = [r["doc_id"] for r in
               token_df.select("doc_id").orderBy("doc_id").limit(7).collect()]
    delete_keys_checkpoint(spark, d, victims, "doc_id")
    r = spark.read.format("wcfs").load(d)
    assert r.count() == token_df.count() - 7
    assert r.filter(F.col("doc_id").isin(victims)).count() == 0


def test_non_clustered_refused(spark, token_df, tmp_path, table_dir):
    d = str(tmp_path / "tbl")
    shutil.copytree(table_dir, d)
    # duplicate a data file -> duplicated chunks -> torn layout
    files = [f for f in os.listdir(d)
             if f.endswith(".parquet") and not f.startswith("_")]
    shutil.copy(os.path.join(d, files[0]), os.path.join(d, "part-dup.parquet"))
    with pytest.raises(Exception, match="not chunk-clustered"):
        spark.read.format("wcfs").load(d).count()


def test_missing_sidecar_and_key_col_errors(spark, token_df, tmp_path):
    d = str(tmp_path / "empty")
    os.makedirs(d)
    with pytest.raises(Exception, match="_table_schema"):
        spark.read.format("wcfs").load(d).count()
    with pytest.raises(Exception, match="key_col"):
        (token_df.write.format("wcfs").mode("append")
         .option("key_col", "nope").save(str(tmp_path / "w")))


def test_stream_sink_writes_and_replays_idempotent(spark, token_df, tmp_path):
    # end-to-end: writeStream.format("wcfs") drains a file source into a
    # readable checkpoint; a second drain appends the new arrivals
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "stream_ckpt")
    os.makedirs(src)
    token_df.limit(500).write.parquet(os.path.join(src, "p1"))
    def drain():
        q = (spark.readStream.schema(token_df.schema).parquet(src + "/*")
             .writeStream.format("wcfs").outputMode("append")
             .option("key_col", "doc_id").option("chunk_rows", "128")
             .option("path", dst).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
    drain()
    r1 = spark.read.format("wcfs").load(dst)
    assert r1.count() == 500
    # new file lands; second drain appends exactly the new rows
    (token_df.orderBy("doc_id").limit(800).subtract(token_df.limit(500))
     .write.parquet(os.path.join(src, "p2")))
    n2 = spark.read.parquet(os.path.join(src, "p2")).count()
    drain()
    assert spark.read.format("wcfs").load(dst).count() == 500 + n2
    # every committed batch left its marker
    marks = os.listdir(os.path.join(dst, "_stream_commits"))
    assert len(marks) >= 2


def test_stream_sink_replayed_batch_drops_duplicates(spark, token_df,
                                                     tmp_path):
    # unit-level replay: commit the SAME batchId twice — the second
    # attempt's files must be deleted, not duplicated
    from pyspark.sql.pandas.types import to_arrow_schema
    from wills_columnar_format_spark.datasource import WcfsStreamWriter

    d = str(tmp_path / "tbl")
    batches = token_df.limit(200).toArrow().to_batches()
    w1 = WcfsStreamWriter(token_df.schema, {"path": d,
                                            "key_col": "doc_id"}, False)
    m1 = w1.write(iter(batches))
    w1.commit([m1], 7)
    files_after_first = sorted(
        f for f in os.listdir(d) if f.endswith(".parquet"))
    w2 = WcfsStreamWriter(token_df.schema, {"path": d,
                                            "key_col": "doc_id"}, False)
    m2 = w2.write(iter(batches))
    w2.commit([m2], 7)  # replay of batch 7
    assert sorted(f for f in os.listdir(d)
                  if f.endswith(".parquet")) == files_after_first
    assert spark.read.format("wcfs").load(d).count() == 200


def test_as_of_time_travel_reads(spark, token_df, tmp_path):
    # option("as_of", seq): plan over the ledger's historical file set
    # — later commits' data AND mask sidecars never enter the scan
    from wills_columnar_format_spark.engine import (
        delete_keys_checkpoint, encode_table, write_checkpoint)

    d = str(tmp_path / "tt")
    write_checkpoint(
        encode_table(token_df, key_col="doc_id", codec="auto",
                     num_partitions=4),
        d, schema=token_df.schema)
    dead = [r["doc_id"] for r in
            token_df.select("doc_id").limit(40).collect()]
    delete_keys_checkpoint(spark, d, dead, "doc_id")
    now = spark.read.format("wcfs").load(d)
    assert now.count() == token_df.count() - 40
    old = spark.read.format("wcfs").option("as_of", "0").load(d)
    assert old.count() == token_df.count()
    assert old.exceptAll(token_df).count() == 0
    at1 = spark.read.format("wcfs").option("as_of", "1").load(d)
    assert at1.count() == token_df.count() - 40
    with pytest.raises(Exception, match="not a commit"):
        spark.read.format("wcfs").option("as_of", "9").load(d).count()


def test_as_of_needs_ledger(spark, token_df, table_dir):
    # batch-writer dirs carry no _commits log: as_of must say so
    with pytest.raises(Exception, match="_commits"):
        spark.read.format("wcfs").option("as_of", "0") \
            .load(table_dir).count()


def test_added_default_column_reads(spark, token_df, tmp_path):
    # the Spark<->Arrow schema round trip drops arrow field metadata;
    # the reader must take added-column defaults from the _table_schema
    # sidecar or pre-add chunks die with a missing-sub-column error
    from wills_columnar_format_spark.engine import (
        add_column_checkpoint, encode_table, write_checkpoint)

    d = str(tmp_path / "addcol")
    write_checkpoint(
        encode_table(token_df, key_col="doc_id", codec="auto",
                     num_partitions=2),
        d, schema=token_df.schema)
    add_column_checkpoint(d, "weight", "double", default=2.5)
    r = spark.read.format("wcfs").load(d)
    assert "weight" in r.columns
    assert r.count() == token_df.count()
    assert r.filter(F.col("weight") == 2.5).count() == token_df.count()


def test_batch_writer_keeps_logged_dirs_attributed(spark, token_df,
                                                   tmp_path):
    # a logged dir must stay fully attributed: batch appends record an
    # `append` commit, overwrite records a `replace`; unlogged dirs
    # keep the plain-dir behavior (no ledger)
    from wills_columnar_format_spark.engine import (
        encode_table, read_commit_log, write_checkpoint)

    d = str(tmp_path / "logged")
    write_checkpoint(
        encode_table(token_df.limit(300), key_col="doc_id", codec="auto",
                     num_partitions=2),
        d, schema=token_df.schema)
    extra = token_df.filter(~F.col("doc_id").isin(
        [r["doc_id"] for r in token_df.limit(300).collect()])).limit(100)
    (extra.repartition(1).write.format("wcfs").mode("append")
     .option("key_col", "doc_id").save(d))
    log = read_commit_log(d)
    assert [r["action"] for r in log] == ["create", "append"]
    # ledger attribution works: as_of=0 is the pre-append snapshot
    assert spark.read.format("wcfs").option("as_of", "0") \
        .load(d).count() == 300
    assert spark.read.format("wcfs").load(d).count() == 400
    # overwrite cannot be represented in a ledger history ('replace'
    # means content-identical to log readers): refused up front,
    # nothing deleted
    with pytest.raises(Exception, match="ledger-backed"):
        (token_df.limit(50).repartition(1).write.format("wcfs")
         .mode("overwrite").option("key_col", "doc_id").save(d))
    assert spark.read.format("wcfs").load(d).count() == 400


def test_batch_append_keeps_sidecar_metadata(spark, token_df, tmp_path):
    # the writer must never clobber a sidecar carrying add_column
    # defaults: a frame-schema overwrite would strip the default
    # markers and break decode of pre-add chunks
    from wills_columnar_format_spark.engine import (
        add_column_checkpoint, encode_table, write_checkpoint)

    d = str(tmp_path / "keepmeta")
    write_checkpoint(
        encode_table(token_df.limit(200), key_col="doc_id", codec="auto",
                     num_partitions=2),
        d, schema=token_df.schema)
    add_column_checkpoint(d, "weight", "double", default=2.5)
    extra = token_df.filter(~F.col("doc_id").isin(
        [r["doc_id"] for r in token_df.limit(200).collect()])).limit(50)
    (extra.repartition(1).write.format("wcfs").mode("append")
     .option("key_col", "doc_id").save(d))
    r = spark.read.format("wcfs").load(d)
    assert r.count() == 250
    # pre-add chunks fill the default; the appended chunks (written
    # without the column) do too
    assert r.filter(F.col("weight") == 2.5).count() == 250
