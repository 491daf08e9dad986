"""Predicate deletion (``delete_where`` / ``delete_where_checkpoint``).

Pins: numeric / string / prefix / temporal range deletes equal the
relational filter; masks compose with delete_keys and upserts; the
spec-derived generation makes replay idempotent; nullable, list, and
unknown predicate columns are refused loudly; the checkpoint variant
logs a delete commit (time travel to the pre-delete snapshot intact).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.engine import (
    decode_checkpoint,
    decode_table,
    delete_keys,
    delete_where,
    delete_where_checkpoint,
    encode_table,
    read_commit_log,
    write_checkpoint,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"src{i % 12}", f"text {i}", (i * 7) % 500)
         for i in range(600)],
        "doc_id long, source string, text string, n_chars long",
    )


def _mask(df, keep_expr):
    return {r["doc_id"] for r in df.filter(keep_expr).collect()}


def test_numeric_range_delete(spark, docs):
    m = encode_table(docs, key_col="doc_id", num_partitions=3,
                     chunk_rows=64)
    out = decode_table(delete_where(m, ("n_chars", 100, 300)),
                       docs.schema)
    expect = docs.filter(~F.col("n_chars").between(100, 300))
    assert out.count() == expect.count()
    assert out.exceptAll(expect).count() == 0


def test_string_and_prefix_delete(spark, docs):
    m = encode_table(docs, key_col="doc_id", num_partitions=2,
                     chunk_rows=128)
    # closed string range
    out = decode_table(
        delete_where(m, ("source", "src3", "src5")), docs.schema)
    expect = docs.filter(~F.col("source").between("src3", "src5"))
    assert out.count() == expect.count()
    assert out.exceptAll(expect).count() == 0
    # LIKE-prefix: 'src1' matches src1, src10, src11 — straddles 'src2'
    out2 = decode_table(delete_where(m, ("source", "src1")), docs.schema)
    expect2 = docs.filter(~F.col("source").startswith("src1"))
    assert out2.count() == expect2.count()
    assert out2.exceptAll(expect2).count() == 0


def test_temporal_range_delete(spark):
    rows = [(i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), i % 50)
            for i in range(500)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, val long")
    m = encode_table(df, key_col="event_id", num_partitions=2,
                     chunk_rows=64)
    lo, hi = dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 10)
    out = decode_table(delete_where(m, ("ts", lo, hi)), df.schema)
    expect = df.filter(~F.col("ts").between(lo, hi))
    assert out.count() == expect.count()
    assert out.exceptAll(expect).count() == 0


def test_delete_where_composes_and_replays(spark, docs):
    m = encode_table(docs, key_col="doc_id", num_partitions=2,
                     chunk_rows=64)
    m = delete_keys(m, [1, 2, 3], "doc_id")
    m = delete_where(m, ("n_chars", 0, 50))
    m = delete_where(m, ("n_chars", 0, 50))  # replay: idempotent
    out = decode_table(m, docs.schema)
    expect = docs.filter(~F.col("doc_id").isin([1, 2, 3])
                         & ~F.col("n_chars").between(0, 50))
    assert out.count() == expect.count()
    assert out.exceptAll(expect).count() == 0


def test_refusals(spark, docs):
    m = encode_table(docs, key_col="doc_id", num_partitions=1)
    with pytest.raises(TypeError, match="no encoded sub-column"):
        delete_where(m, ("nope", 1, 2))
    nullable = docs.withColumn(
        "maybe", F.when(F.col("doc_id") % 3 == 0, F.col("n_chars")))
    mn = encode_table(nullable, key_col="doc_id", num_partitions=1,
                      allow_nulls=True)
    with pytest.raises(TypeError, match="NULLABLE"):
        delete_where(mn, ("maybe", 0, 10))
    lists = spark.createDataFrame(
        [(i, [i, i + 1]) for i in range(50)],
        "doc_id long, toks array<int>")
    ml = encode_table(lists, key_col="doc_id", num_partitions=1)
    with pytest.raises(TypeError, match="LIST"):
        delete_where(ml, ("toks", 1, 2))
    with pytest.raises(TypeError, match="mix"):
        delete_where(m, ("n_chars", 1, "x"))
    import decimal
    with pytest.raises(TypeError, match="bounds take"):
        delete_where(m, ("n_chars", decimal.Decimal(1),
                         decimal.Decimal(2)))


def test_delete_where_checkpoint_logs_commit(spark, docs, tmp_path):
    ckpt = str(tmp_path / "m")
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=2,
                     chunk_rows=64),
        ckpt, schema=docs.schema)
    gen = delete_where_checkpoint(spark, ckpt, ("source", "src7"))
    assert gen
    log = read_commit_log(ckpt)
    assert [(r["seq"], r["action"]) for r in log] == \
        [(0, "create"), (1, "delete")]
    live = decode_checkpoint(spark, ckpt)
    expect = docs.filter(~F.col("source").startswith("src7"))
    assert live.count() == expect.count()
    assert live.exceptAll(expect).count() == 0
    # pre-delete snapshot intact
    assert decode_checkpoint(spark, ckpt, as_of=0).count() == 600


# ---------------------------------------------------------------------------
# IN-list deletes: delete_where((col, [v1, v2, ...]))
# ---------------------------------------------------------------------------


def test_in_delete_numeric_and_string(spark, docs):
    m = encode_table(docs, key_col="doc_id", num_partitions=2,
                     chunk_rows=64)
    out = decode_table(delete_where(m, ("n_chars", [7, 49, 140])),
                       docs.schema)
    expect = docs.filter(~F.col("n_chars").isin(7, 49, 140))
    assert out.count() == expect.count()
    assert out.exceptAll(expect).count() == 0
    out2 = decode_table(delete_where(m, ("source", ["src3", "src11"])),
                        docs.schema)
    expect2 = docs.filter(~F.col("source").isin("src3", "src11"))
    assert out2.count() == expect2.count() == 500
    assert out2.exceptAll(expect2).count() == 0


def test_in_delete_permuted_replay_idempotent(spark, docs):
    """A permuted value list mints the SAME generation (set semantics),
    so replaying it masks identically — no double deletion."""
    m = encode_table(docs, key_col="doc_id", num_partitions=1,
                     chunk_rows=128).localCheckpoint(eager=True)
    once = delete_where(m, ("n_chars", [7, 140, 49]))
    twice = delete_where(once, ("n_chars", [49, 7, 140]))
    a = decode_table(once, docs.schema)
    b = decode_table(twice, docs.schema)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    gens = {r["column"] for r in twice.select("column").distinct()
            .collect() if r["column"].startswith("__deletes__")}
    assert len(gens) == 1  # identical generation, collapsed masks


def test_in_delete_refusals(spark, docs):
    m = encode_table(docs, key_col="doc_id", num_partitions=1)
    with pytest.raises(Exception, match="empty value set"):
        delete_where(m, ("n_chars", []))
    with pytest.raises(Exception, match="mixes string"):
        delete_where(m, ("n_chars", [1, "x"]))


def test_delete_refuses_entry_internals(spark):
    """Map/list INTERNAL sub-columns store flattened ENTRY positions:
    committing those as row deletion vectors would poison the
    checkpoint or silently delete wrong rows (review finding) —
    refused before any work happens."""
    df = spark.createDataFrame(
        [(i, {"a": i}, [i, i + 1]) for i in range(50)],
        "k long, m map<string,long>, xs array<long>")
    man = encode_table(df, key_col="k", num_partitions=1)
    for vcol in ("m#mk", "m#mv", "xs#values", "m#lengths"):
        with pytest.raises(TypeError,
                           match="internal|LIST|entries"):
            delete_where(man, (vcol, 0, 10))


def test_in_delete_checkpoint_logs_commit(spark, docs, tmp_path):
    ckpt = str(tmp_path / "in")
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=2,
                     chunk_rows=64),
        ckpt, schema=docs.schema)
    gen = delete_where_checkpoint(spark, ckpt, ("source", ["src5"]))
    assert gen
    live = decode_checkpoint(spark, ckpt)
    expect = docs.filter(F.col("source") != "src5")
    assert live.count() == expect.count() == 550
    assert live.exceptAll(expect).count() == 0
    log = read_commit_log(ckpt)
    assert [(r["seq"], r["action"]) for r in log] == \
        [(0, "create"), (1, "delete")]
    assert decode_checkpoint(spark, ckpt, as_of=0).count() == 600


# ---------------------------------------------------------------------------
# update_where_checkpoint: UPDATE ... SET ... WHERE
# ---------------------------------------------------------------------------


from wills_columnar_format_spark.engine import (  # noqa: E402
    read_changes,
    update_where_checkpoint,
)


def test_update_where_expression(spark, docs, tmp_path):
    ckpt = str(tmp_path / "u")
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=2,
                     chunk_rows=64),
        ckpt, schema=docs.schema)
    stats = update_where_checkpoint(
        spark, ckpt, ("n_chars", 100, 300),
        {"n_chars": -F.col("n_chars"), "source": "flagged"},
        "doc_id", num_partitions=1)
    n_hit = docs.filter(F.col("n_chars").between(100, 300)).count()
    assert stats["updated"] == n_hit and stats["gen"]
    live = decode_checkpoint(spark, ckpt)
    expect = docs.withColumns({
        "n_chars": F.when(F.col("n_chars").between(100, 300),
                          -F.col("n_chars")).otherwise(F.col("n_chars")),
        "source": F.when(F.col("n_chars").between(100, 300),
                         F.lit("flagged")).otherwise(F.col("source")),
    })
    assert live.count() == 600
    assert live.exceptAll(expect).count() == 0
    log = read_commit_log(ckpt)
    assert [(r["seq"], r["action"]) for r in log] == \
        [(0, "create"), (1, "upsert")]
    # the change feed sees the update as delete+insert of the hit keys
    feed = read_changes(spark, ckpt, since=0, key_col="doc_id")
    assert feed.filter("_change_type = 'delete'").count() == n_hit
    ins = feed.filter("_change_type = 'insert'")
    assert ins.count() == n_hit
    assert ins.filter(F.col("source") != "flagged").count() == 0


def test_update_where_zero_hits_and_refusals(spark, docs, tmp_path):
    ckpt = str(tmp_path / "z")
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=1),
        ckpt, schema=docs.schema)
    stats = update_where_checkpoint(
        spark, ckpt, ("n_chars", 10_000, 20_000), {"source": "x"},
        "doc_id")
    assert stats == {"updated": 0, "gen": ""}
    assert len(read_commit_log(ckpt)) == 1  # no phantom commit
    with pytest.raises(ValueError, match="key column"):
        update_where_checkpoint(spark, ckpt, ("n_chars", 0, 1),
                                {"doc_id": 1}, "doc_id")
    with pytest.raises(ValueError, match="not in the table"):
        update_where_checkpoint(spark, ckpt, ("n_chars", 0, 1),
                                {"nope": 1}, "doc_id")
    with pytest.raises(ValueError, match="empty set_map"):
        update_where_checkpoint(spark, ckpt, ("n_chars", 0, 1), {},
                                "doc_id")


def test_update_where_typed_literals(spark, tmp_path):
    """SET literals reconcile to the table column's own type (review
    finding): a Decimal('1.5') on DECIMAL(10,2) must land 1.50 (a bare
    lit would store unscaled 15 ≡ 0.15 through the scale-2 schema) and
    a naive datetime on TIMESTAMP_NTZ must keep its WALL value (string
    parse, never a session-tz instant)."""
    import datetime as dt
    import decimal

    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("price", T.DecimalType(10, 2), False),
        T.StructField("ts", T.TimestampNTZType(), False),
    ])
    df = spark.createDataFrame(
        [(i, decimal.Decimal(f"{i}.25"),
          dt.datetime(2024, 1, 1) + dt.timedelta(hours=i))
         for i in range(100)], schema)
    ckpt = str(tmp_path / "tl")
    write_checkpoint(
        encode_table(df, key_col="k", num_partitions=1, chunk_rows=32),
        ckpt, schema=schema)
    wall = dt.datetime(2030, 6, 1, 12, 34, 56)
    stats = update_where_checkpoint(
        spark, ckpt, ("k", 10, 19),
        {"price": decimal.Decimal("1.5"), "ts": wall}, "k")
    assert stats["updated"] == 10
    live = decode_checkpoint(spark, ckpt)
    hit = live.filter(F.col("k").between(10, 19))
    assert hit.filter(F.col("price") != decimal.Decimal("1.50")).count() == 0
    assert {r["ts"] for r in hit.select("ts").collect()} == {wall}
    # untouched rows intact
    assert live.filter(~F.col("k").between(10, 19))\
        .exceptAll(df.filter(~F.col("k").between(10, 19))).count() == 0


def test_update_where_in_spec(spark, docs, tmp_path):
    """UPDATE ... WHERE col IN (...): the spec routes through the
    value_in decode prune; only the listed sources are rewritten."""
    ckpt = str(tmp_path / "ui")
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=2,
                     chunk_rows=64),
        ckpt, schema=docs.schema)
    stats = update_where_checkpoint(
        spark, ckpt, ("source", ["src2", "src9"]),
        {"text": "redacted"}, "doc_id", num_partitions=1)
    n_hit = docs.filter(F.col("source").isin("src2", "src9")).count()
    assert stats["updated"] == n_hit == 100
    live = decode_checkpoint(spark, ckpt)
    assert live.count() == 600
    assert live.filter(F.col("source").isin("src2", "src9")
                       & (F.col("text") != "redacted")).count() == 0
    assert live.filter(~F.col("source").isin("src2", "src9")
                       & (F.col("text") == "redacted")).count() == 0
