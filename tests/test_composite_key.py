"""Composite keys (``key_col=["a", "b"]``): a canonical tuple encoding
derives one stored ``#ck:`` key sub-column, and the whole key machinery
(range/hash layout, zone maps, per-chunk Blooms, checksums, ``keys=``
point lookups, deletion vectors) rides it unchanged.

Engine extension (VERDICT r4 gap #4) — the reference keys nothing
(single-column format); real tables key on (tenant, doc_id).
"""

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.engine import (
    canon_composite_key,
    decode_checkpoint,
    decode_table,
    delete_keys,
    encode_table,
    upsert_checkpoint,
    upsert_table,
    write_checkpoint,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(f"t{i % 7}", i, f"body {i}", i % 97) for i in range(600)]
    return spark.createDataFrame(
        rows, "tenant string, doc_id long, text string, n_chars long"
    ).localCheckpoint(eager=True)


def test_composite_roundtrip(spark, docs):
    m = encode_table(docs, key_col=["tenant", "doc_id"],
                     num_partitions=4, chunk_rows=64)
    dec = decode_table(m, docs.schema)
    assert dec.count() == 600
    got = {(r.tenant, r.doc_id): (r.text, r.n_chars) for r in dec.collect()}
    exp = {(r.tenant, r.doc_id): (r.text, r.n_chars) for r in docs.collect()}
    assert got == exp
    # the derived key sub-column is stored but narrowed away
    assert "#ck:tenant,doc_id" in {
        r.column for r in m.select("column").distinct().collect()}
    assert "#ck:tenant,doc_id" not in dec.columns


def test_composite_point_lookup_and_bloom(spark, docs, tmp_path):
    keys = [("t1", 1), ("t3", 3), ("t6", 587)]
    # range layout: zone-map prune on the canonical strings
    m = encode_table(docs, key_col=["tenant", "doc_id"],
                     num_partitions=4, chunk_rows=64)
    out = decode_table(m, docs.schema, keys=keys,
                       key_col=["tenant", "doc_id"])
    assert sorted((r.tenant, r.doc_id) for r in out.collect()) == sorted(keys)
    # hash layout through a checkpoint: per-chunk key Blooms prune
    ck = str(tmp_path / "ck")
    m2 = encode_table(docs, key_col=["tenant", "doc_id"],
                      num_partitions=4, chunk_rows=64, partitioner="hash")
    write_checkpoint(m2, ck, schema=docs.schema)
    out2 = decode_checkpoint(spark, ck, keys=keys,
                             key_col=["tenant", "doc_id"])
    assert sorted((r.tenant, r.doc_id)
                  for r in out2.collect()) == sorted(keys)
    # a WRONG tenant for an existing doc_id must not match
    none = decode_checkpoint(spark, ck, keys=[("t0", 1)],
                             key_col=["tenant", "doc_id"])
    assert none.count() == 0


def test_composite_delete_keys(spark, docs):
    m = encode_table(docs, key_col=["tenant", "doc_id"],
                     num_partitions=4, chunk_rows=64)
    dead = [("t1", 1), ("t2", 2), ("t5", 5)]
    m2 = delete_keys(m, dead, ["tenant", "doc_id"])
    dec = decode_table(m2, docs.schema)
    assert dec.count() == 597
    left = {(r.tenant, r.doc_id) for r in dec.collect()}
    for k in dead:
        assert k not in left


def test_composite_escaping_is_injective(spark):
    # adversarial parts containing the separator/escape bytes: tuple
    # equality must stay equivalent to canonical-string equality
    rows = [("a\x1f", "b", 1), ("a", "\x1fb", 2), ("a\x1b", "sb", 3),
            ("a", "\x1bsb", 4)]
    df = spark.createDataFrame(rows, "k1 string, k2 string, v long")
    canons = {canon_composite_key((r[0], r[1])) for r in rows}
    assert len(canons) == 4  # injective
    m = encode_table(df, key_col=["k1", "k2"], num_partitions=1,
                     chunk_rows=2)
    out = decode_table(m, df.schema, keys=[("a\x1f", "b")],
                       key_col=["k1", "k2"])
    assert [(r.k1, r.k2, r.v) for r in out.collect()] == [("a\x1f", "b", 1)]


def test_composite_int_string_mix_and_refusals(spark, docs, tmp_path):
    # key_range with composite refuses
    m = encode_table(docs, key_col=["tenant", "doc_id"],
                     num_partitions=2, chunk_rows=128)
    with pytest.raises(ValueError, match="key_range"):
        decode_table(m, docs.schema, key_range=(("t0", 0), ("t1", 5)),
                     key_col=["tenant", "doc_id"])
    # float part refuses at canon time
    with pytest.raises(TypeError, match="composite key part"):
        canon_composite_key(("a", 1.5))
    # unsupported part type refuses at encode
    fdf = docs.withColumn("f", F.col("n_chars").cast("double"))
    from wills_columnar_format_spark.dtypes import UnsupportedDataType
    with pytest.raises(UnsupportedDataType, match="string/integer"):
        encode_table(fdf, key_col=["tenant", "f"], num_partitions=2)
    # single-element list collapses to the plain path
    m1 = encode_table(docs, key_col=["doc_id"], num_partitions=2,
                      chunk_rows=128)
    out = decode_table(m1, docs.schema, keys=[7], key_col=["doc_id"])
    assert [r.doc_id for r in out.collect()] == [7]


def test_composite_rechunk_compaction(spark, docs, tmp_path):
    # re-encoding compaction with a composite key: decode narrows the
    # '#ck:' column away, encode re-derives it from the parts — the
    # nightly-compaction pattern works unchanged on tuple-keyed tables
    from wills_columnar_format_spark.engine import compact_checkpoint

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_checkpoint(
        encode_table(docs, key_col=["tenant", "doc_id"],
                     num_partitions=4, chunk_rows=32),
        src, schema=docs.schema)
    delete_keys_checkpoint_args = [("t1", 1), ("t2", 2)]
    from wills_columnar_format_spark.engine import delete_keys_checkpoint
    delete_keys_checkpoint(spark, src, delete_keys_checkpoint_args,
                           ["tenant", "doc_id"])
    compact_checkpoint(spark, src, dst, rechunk_rows=256,
                       key_col=["tenant", "doc_id"], partitioner="hash")
    dec = decode_checkpoint(spark, dst)
    assert dec.count() == 598  # masks materialized away
    got = {(r.tenant, r.doc_id) for r in dec.collect()}
    assert ("t1", 1) not in got and ("t2", 2) not in got
    # point lookup on the compacted result still prunes + matches
    out = decode_checkpoint(spark, dst, keys=[("t3", 3)],
                            key_col=["tenant", "doc_id"])
    assert [(r.tenant, r.doc_id) for r in out.collect()] == [("t3", 3)]


def test_composite_upsert_table_and_checkpoint(spark, docs, tmp_path):
    # composite keys are first-class on the upsert paths: same-key rows
    # (tuple identity) replace, new tuples append — driver-probe branch
    src = spark.createDataFrame(
        [("t1", 1, "UP1", -1), ("t2", 2, "UP2", -2),
         ("t0", 7000, "NEW", -3)],
        "tenant string, doc_id long, text string, n_chars long")
    m = encode_table(docs, key_col=["tenant", "doc_id"],
                     num_partitions=4, chunk_rows=64)
    out = upsert_table(m, src, ["tenant", "doc_id"], num_partitions=2,
                       chunk_rows=64)
    dec = decode_table(out, docs.schema)
    got = {(r.tenant, r.doc_id): r.text for r in dec.collect()}
    assert len(got) == 601
    assert got[("t1", 1)] == "UP1" and got[("t2", 2)] == "UP2"
    assert got[("t0", 7000)] == "NEW"
    assert got[("t3", 3)] == "body 3"
    # checkpoint variant: one logged upsert commit, replay-safe
    from wills_columnar_format_spark.engine import checkpoint_history
    ck = str(tmp_path / "u")
    write_checkpoint(
        encode_table(docs, key_col=["tenant", "doc_id"],
                     num_partitions=4, chunk_rows=64),
        ck, schema=docs.schema)
    g1 = upsert_checkpoint(spark, ck, src, ["tenant", "doc_id"],
                           num_partitions=2, chunk_rows=64)
    dec2 = decode_checkpoint(spark, ck)
    got2 = {(r.tenant, r.doc_id): r.text for r in dec2.collect()}
    assert got2 == got
    g2 = upsert_checkpoint(spark, ck, src, ["tenant", "doc_id"],
                           num_partitions=2, chunk_rows=64)
    assert g2 != g1  # file-listing salt mints a fresh generation
    got3 = {(r.tenant, r.doc_id): r.text
            for r in decode_checkpoint(spark, ck).collect()}
    assert got3 == got
    hist = [r.action for r in checkpoint_history(spark, ck).collect()]
    assert hist == ["create", "upsert", "upsert"]


def test_composite_upsert_distributed_branch(spark, docs, monkeypatch):
    # past the (lowered) driver cap the composite upsert switches to
    # the distributed mark pass probing canonical strings
    from wills_columnar_format_spark import engine as eng

    monkeypatch.setattr(eng, "UPSERT_KEYS_MAX", 20)
    src = spark.createDataFrame(
        [(f"t{i % 7}", i, f"up {i}", -i) for i in range(100, 200)],
        "tenant string, doc_id long, text string, n_chars long")
    m = encode_table(docs, key_col=["tenant", "doc_id"],
                     num_partitions=4, chunk_rows=64)
    out = eng.upsert_table(m, src, ["tenant", "doc_id"],
                           num_partitions=2, chunk_rows=64)
    dec = eng.decode_table(out, docs.schema)
    got = {(r.tenant, r.doc_id): r.text for r in dec.collect()}
    assert len(got) == 600  # all batch tuples replaced existing rows
    for i in range(100, 200):
        assert got[(f"t{i % 7}", i)] == f"up {i}"
    assert got[("t1", 1)] == "body 1"


def test_composite_merge_into_df(spark, docs, tmp_path):
    from wills_columnar_format_spark.engine import merge_into_df

    ck = str(tmp_path / "m")
    write_checkpoint(
        encode_table(docs, key_col=["tenant", "doc_id"],
                     num_partitions=4, chunk_rows=64),
        ck, schema=docs.schema)
    src = spark.createDataFrame(
        [("t1", 1, "M1", -1), ("t9", 1, "NEWTEN", -2)],
        "tenant string, doc_id long, text string, n_chars long")
    res = merge_into_df(spark, ck, src, ["tenant", "doc_id"])
    # ("t1",1) exists -> updated; ("t9",1) is a NEW tuple (same doc_id,
    # different tenant) -> inserted: tuple identity, not doc_id identity
    assert (res["updated"], res["inserted"]) == (1, 1)
    got = {(r.tenant, r.doc_id): r.text
           for r in decode_checkpoint(spark, ck).collect()}
    assert len(got) == 601
    assert got[("t1", 1)] == "M1" and got[("t9", 1)] == "NEWTEN"
    # duplicate source tuples refuse
    dup = spark.createDataFrame(
        [("t1", 1, "a", 0), ("t1", 1, "b", 0)],
        "tenant string, doc_id long, text string, n_chars long")
    with pytest.raises(ValueError, match="key-unique"):
        merge_into_df(spark, ck, dup, ["tenant", "doc_id"])


def test_composite_change_feed(spark, tmp_path):
    # the CDF mask diff decodes '#ck:' canonical strings and SPLITS
    # them back into the part columns — incl. adversarial parts
    # containing the escape/separator bytes (inversion pinned)
    from wills_columnar_format_spark.engine import (
        delete_keys_checkpoint, read_changes, upsert_checkpoint)

    rows = [(f"t{i % 5}", i, f"body {i}", i) for i in range(200)]
    rows.append(("e\x1bs\x1fc", 999, "adversarial", 0))
    df = spark.createDataFrame(
        rows, "tenant string, doc_id long, text string, n_chars long")
    ck = str(tmp_path / "cdf")
    write_checkpoint(
        encode_table(df, key_col=["tenant", "doc_id"],
                     num_partitions=2, chunk_rows=64),
        ck, schema=df.schema)
    delete_keys_checkpoint(spark, ck,
                           [("t1", 1), ("e\x1bs\x1fc", 999)],
                           ["tenant", "doc_id"])             # commit 1
    src = spark.createDataFrame(
        [("t2", 2, "UP", -1), ("t9", 50, "NEW", -2)],
        "tenant string, doc_id long, text string, n_chars long")
    upsert_checkpoint(spark, ck, src, ["tenant", "doc_id"],
                      num_partitions=1)                      # commit 2
    feed = read_changes(spark, ck, since=0,
                        key_col=["tenant", "doc_id"]).collect()
    kinds = {(r.tenant, r.doc_id, r._change_type, r._commit_seq)
             for r in feed}
    assert ("t1", 1, "delete", 1) in kinds
    assert ("e\x1bs\x1fc", 999, "delete", 1) in kinds
    assert ("t2", 2, "delete", 2) in kinds      # upsert pre-image
    assert ("t2", 2, "insert", 2) in kinds
    assert ("t9", 50, "insert", 2) in kinds
    assert ("t9", 50, "delete", 2) not in kinds  # brand-new tuple
    # delete rows carry NULL payloads but BOTH key parts
    d = [r for r in feed if r._change_type == "delete"
         and r.doc_id == 999][0]
    assert d.tenant == "e\x1bs\x1fc" and d.text is None


def test_composite_sync_checkpoint(spark, tmp_path):
    # CDF composes downstream: a composite-keyed derived table syncs
    # cursor-tracked from the source's change feed
    from wills_columnar_format_spark.engine import (
        delete_keys_checkpoint, sync_checkpoint, upsert_checkpoint)

    rows = [(f"t{i % 5}", i, f"body {i}", i) for i in range(150)]
    df = spark.createDataFrame(
        rows, "tenant string, doc_id long, text string, n_chars long")
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    m = encode_table(df, key_col=["tenant", "doc_id"],
                     num_partitions=2, chunk_rows=64)
    write_checkpoint(m, src, schema=df.schema)
    write_checkpoint(
        encode_table(df, key_col=["tenant", "doc_id"],
                     num_partitions=2, chunk_rows=64),
        dst, schema=df.schema)
    delete_keys_checkpoint(spark, src, [("t0", 5), ("t1", 6)],
                           ["tenant", "doc_id"])
    upsert_checkpoint(
        spark, src,
        spark.createDataFrame([("t2", 7, "SYNCED", -1)],
                              "tenant string, doc_id long, text string, "
                              "n_chars long"),
        ["tenant", "doc_id"], num_partitions=1)
    res = sync_checkpoint(spark, src, dst, ["tenant", "doc_id"],
                          since=0, num_partitions=1)
    assert res["synced"] and res["deleted"] == 2 and res["upserted"] == 1
    s = {(r.tenant, r.doc_id): r.text
         for r in decode_checkpoint(spark, src).collect()}
    d = {(r.tenant, r.doc_id): r.text
         for r in decode_checkpoint(spark, dst).collect()}
    assert s == d
    assert ("t0", 5) not in d and d[("t2", 7)] == "SYNCED"


def test_composite_resumable_encode(spark, docs, tmp_path):
    # encode_table_resumable derives the '#ck:' column up front so the
    # sub-job split and done-partition drop hash the encode key; a
    # second (resumed) run over the complete checkpoint re-encodes
    # nothing and the roundtrip is exact
    from wills_columnar_format_spark.engine import (
        decode_checkpoint, encode_table_resumable, write_checkpoint_schema)

    ck = str(tmp_path / "r")
    m1 = encode_table_resumable(docs, ck, sub_jobs=2,
                                key_col=["tenant", "doc_id"],
                                num_partitions=4, chunk_rows=64)
    write_checkpoint_schema(ck, docs.schema)
    assert m1.filter(~F.col("column").startswith("__")).count() > 0
    m2 = encode_table_resumable(docs, ck, sub_jobs=2,
                                key_col=["tenant", "doc_id"],
                                num_partitions=4, chunk_rows=64)
    dec = decode_checkpoint(spark, ck)
    got = {(r.tenant, r.doc_id): r.text for r in dec.collect()}
    assert len(got) == 600
    assert got[("t1", 1)] == "body 1"
    # composite point lookup works on the resumable (hash) layout
    out = decode_checkpoint(spark, ck, keys=[("t2", 2)],
                            key_col=["tenant", "doc_id"])
    assert [(r.tenant, r.doc_id) for r in out.collect()] == [("t2", 2)]


def test_composite_arity_and_rename_guards(spark, docs, tmp_path):
    # review findings, round 5: wrong-arity / bare-string keys must
    # raise instead of silently matching nothing, and a composite
    # delete on a renamed checkpoint must refuse instead of no-opping
    from wills_columnar_format_spark.engine import (
        delete_keys_checkpoint, rename_column_checkpoint)

    m = encode_table(docs, key_col=["tenant", "doc_id"],
                     num_partitions=2, chunk_rows=128)
    with pytest.raises(TypeError, match="2-part"):
        decode_table(m, docs.schema, keys=["t1"],
                     key_col=["tenant", "doc_id"])
    with pytest.raises(TypeError, match="2-part"):
        decode_table(m, docs.schema, keys=[("t1",)],
                     key_col=["tenant", "doc_id"])
    with pytest.raises(TypeError, match="2-part"):
        delete_keys(m, [("t1", 1, 9)], ["tenant", "doc_id"])
    ck = str(tmp_path / "ren")
    write_checkpoint(m, ck, schema=docs.schema)
    rename_column_checkpoint(ck, "tenant", "org")
    with pytest.raises(ValueError, match="RENAMED"):
        delete_keys_checkpoint(spark, ck, [("t1", 1)],
                               ["org", "doc_id"])
