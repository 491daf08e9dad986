"""Shuffle-free decode of checkpointed manifests.

The default decode regroups chunk rows with ``repartition(n,
"chunk_key")`` — at 100 TB that shuffles every compressed byte once for
nothing, because a checkpointed manifest is already chunk-clustered on
disk (each chunk is emitted as one contiguous RecordBatch, one file per
write task). ``decode_checkpoint`` is the reference decoder's sequential
no-shuffle page loop (src/decode.rs:52-66) lifted to the cluster: one
task per manifest file, pyarrow read with pushed projection/zone-map
predicates, group decode in place. These tests pin:

* the returned plan has NO Exchange;
* bit-identical roundtrips (scalar, list, nullable columns), including
  files with multiple parquet row groups;
* file-level zone-map pruning (a point lookup schedules fewer tasks);
* the clustered-layout gate: duplicated (resumed/merged) and torn
  (maxRecordsPerFile) checkpoints fall back to the shuffling path and
  still decode correctly.
"""

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.data import ensure_token_table
from wills_columnar_format_spark.engine import (
    decode_checkpoint,
    encode_table,
)

N_ROWS = 4_000


@pytest.fixture(scope="module")
def token_df(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tok_ckpt") / "token_table")
    ensure_token_table(path, N_ROWS, seed=11)
    return spark.read.parquet(path)


@pytest.fixture(scope="module")
def ckpt(spark, token_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt_cd") / "m")
    encode_table(
        token_df, key_col="doc_id", codec="auto", num_partitions=4,
        chunk_rows=512,
    ).write.parquet(path)
    return path


def _assert_equals_source(dec, token_df):
    bad = (
        dec.alias("d").join(token_df.alias("o"), "doc_id")
        .filter(~(F.col("d.tokens") == F.col("o.tokens"))
                | (F.col("d.n_tok") != F.col("o.n_tok")))
        .count()
    )
    assert bad == 0
    assert dec.count() == token_df.count()


def test_no_exchange_and_lossless(spark, token_df, ckpt):
    dec = decode_checkpoint(spark, ckpt, token_df.schema)
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    _assert_equals_source(dec, token_df)


def test_multi_row_group_files(spark, token_df, tmp_path_factory):
    """Chunk groups spanning parquet ROW-GROUP boundaries within a file
    must decode correctly — the sequential per-file read preserves order
    across row groups (the hazard that makes trusting Spark's byte-range
    split planning unsafe, and why decode_checkpoint reads per FILE)."""
    path = str(tmp_path_factory.mktemp("ckpt_rg") / "m")
    (
        encode_table(token_df, key_col="doc_id", codec="auto",
                     num_partitions=2, chunk_rows=128)
        .write.parquet(path)
    )
    # rewrite each manifest file with tiny row groups (order preserved):
    # chunk groups now straddle row-group boundaries inside every file
    import glob

    import os

    import pyarrow.parquet as pq
    for f in glob.glob(f"{path}/*.parquet"):
        pq.write_table(pq.read_table(f), f, row_group_size=3)
    for crc in glob.glob(f"{path}/.*.crc"):  # stale Hadoop checksums
        os.remove(crc)
    n_rg = max(pq.ParquetFile(f).num_row_groups
               for f in glob.glob(f"{path}/*.parquet"))
    assert n_rg > 1
    dec = decode_checkpoint(spark, path, token_df.schema)
    _assert_equals_source(dec, token_df)


def test_key_range_prunes_files_and_rows(spark, token_df, ckpt):
    # doc_id keys are strings "{source}-{number:09d}": a string range
    lo, hi = "code-000000000", "code-000000999"
    dec = decode_checkpoint(spark, ckpt, token_df.schema,
                            key_range=(lo, hi), key_col="doc_id")
    total_files = decode_checkpoint(spark, ckpt, token_df.schema).rdd.getNumPartitions()
    assert dec.rdd.getNumPartitions() <= total_files  # file-level pruning
    got = sorted(r.doc_id for r in dec.select("doc_id").collect())
    expect = sorted(
        r.doc_id for r in token_df.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
        ).collect()
    )
    assert got == expect and len(got) > 0


def test_numeric_key_range_prunes_files(spark, tmp_path_factory):
    """Numeric zone maps prune whole FILES before any task is scheduled:
    a range-partitioned encode puts each key range in few files, so a
    point lookup schedules strictly fewer tasks than a full decode."""
    df = spark.range(0, 20_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("int").alias("v")
    )
    path = str(tmp_path_factory.mktemp("ckpt_num") / "m")
    encode_table(df, key_col="k", num_partitions=8, partitioner="range",
                 chunk_rows=1024).write.parquet(path)
    full = decode_checkpoint(spark, path, df.schema)
    hit = decode_checkpoint(spark, path, df.schema, key_range=(5_000, 5_200),
                            key_col="k")
    assert hit.rdd.getNumPartitions() < full.rdd.getNumPartitions()
    got = sorted(r.k for r in hit.select("k").collect())
    assert got == list(range(5_000, 5_201))


def test_column_projection(spark, token_df, ckpt):
    dec = decode_checkpoint(spark, ckpt, token_df.schema,
                            columns=["doc_id", "n_tok"])
    assert dec.columns == ["doc_id", "n_tok"]
    bad = (
        dec.alias("d").join(token_df.alias("o"), "doc_id")
        .filter(F.col("d.n_tok") != F.col("o.n_tok")).count()
    )
    assert bad == 0
    assert dec.count() == N_ROWS


def test_nullable_roundtrip(spark, tmp_path_factory):
    df = spark.range(0, 3_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.concat(F.lit("s"), F.col("id").cast("string"))).alias("s"),
        F.when(F.col("id") % 11 == 0, None)
        .otherwise((F.col("id") * 3).cast("int")).alias("v"),
    )
    path = str(tmp_path_factory.mktemp("ckpt_null") / "m")
    encode_table(df, key_col="k", num_partitions=2, chunk_rows=256,
                 allow_nulls=True).write.parquet(path)
    dec = decode_checkpoint(spark, path, df.schema)
    joined = dec.alias("d").join(df.alias("o"), "k")
    bad = joined.filter(
        ~(F.col("d.s").eqNullSafe(F.col("o.s")))
        | ~(F.col("d.v").eqNullSafe(F.col("o.v")))
    ).count()
    assert bad == 0
    assert dec.count() == 3_000


def test_duplicated_checkpoint_falls_back(spark, token_df, tmp_path_factory):
    """A resumed/merged checkpoint with duplicate (chunk_key, column)
    rows fails the clustered gate and decodes via the shuffling path
    (dropDuplicates) — correct either way, never silently doubled."""
    path = str(tmp_path_factory.mktemp("ckpt_dup") / "m")
    # hash partitioner: deterministic chunk boundaries, so the replayed
    # write produces byte-identical manifest rows (the streaming-replay /
    # resume duplication scenario; range sampling would instead create a
    # second, different layout — a corrupt merge no decode path accepts)
    m = encode_table(token_df, key_col="doc_id", codec="auto",
                     num_partitions=4, chunk_rows=512, partitioner="hash")
    m.write.parquet(path)
    m.write.mode("append").parquet(path)
    with pytest.warns(UserWarning, match="not chunk-clustered"):
        dec = decode_checkpoint(spark, path, token_df.schema)
    _assert_equals_source(dec, token_df)


def test_torn_checkpoint_falls_back(spark, token_df, tmp_path_factory):
    """maxRecordsPerFile splits one task's output across files, tearing
    chunk groups — the gate must detect it (a chunk spanning two files)
    and fall back rather than decode torn groups."""
    path = str(tmp_path_factory.mktemp("ckpt_torn") / "m")
    (
        encode_table(token_df, key_col="doc_id", codec="auto",
                     num_partitions=2, chunk_rows=512)
        .write.option("maxRecordsPerFile", 3).parquet(path)
    )
    with pytest.warns(UserWarning, match="not chunk-clustered"):
        dec = decode_checkpoint(spark, path, token_df.schema)
    _assert_equals_source(dec, token_df)


def test_compact_checkpoint_restores_clustered_layout(spark, token_df, tmp_path_factory):
    """A duplicated (resumed/merged) checkpoint pays the shuffling decode
    on every read; one compact_checkpoint shuffle collapses duplicates,
    re-clusters chunks file-contiguously, and every subsequent
    decode_checkpoint runs shuffle-free with no fallback warning."""
    import warnings as W

    from wills_columnar_format_spark.engine import compact_checkpoint, encode_table

    src = str(tmp_path_factory.mktemp("ckpt_cmp") / "src")
    dst = str(tmp_path_factory.mktemp("ckpt_cmp") / "dst")
    m = encode_table(token_df, key_col="doc_id", codec="auto",
                     num_partitions=4, chunk_rows=512, partitioner="hash")
    m.write.parquet(src)
    m.write.mode("append").parquet(src)  # replay duplicates
    with pytest.warns(UserWarning, match="not chunk-clustered"):
        decode_checkpoint(spark, src, token_df.schema).count()

    compact_checkpoint(spark, src, dst, num_files=4)
    with W.catch_warnings():
        W.simplefilter("error")  # any fallback warning fails the test
        dec = decode_checkpoint(spark, dst, token_df.schema)
        plan = dec._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        _assert_equals_source(dec, token_df)


def test_compact_checkpoint_heals_torn_layout(spark, token_df, tmp_path_factory):
    from wills_columnar_format_spark.engine import compact_checkpoint, encode_table

    src = str(tmp_path_factory.mktemp("ckpt_cmt") / "src")
    dst = str(tmp_path_factory.mktemp("ckpt_cmt") / "dst")
    (
        encode_table(token_df, key_col="doc_id", codec="auto",
                     num_partitions=2, chunk_rows=512)
        .write.option("maxRecordsPerFile", 3).parquet(src)
    )
    compact_checkpoint(spark, src, dst, num_files=2)
    dec = decode_checkpoint(spark, dst, token_df.schema)
    assert "Exchange" not in dec._jdf.queryExecution().executedPlan().toString()
    _assert_equals_source(dec, token_df)


def test_value_range_checkpoint_prunes_files_and_chunks(spark, tmp_path_factory):
    """value_range on a checkpointed manifest prunes whole files (driver
    metadata pass) and chunks inside each file (per-file qualifying-key
    lists pushed into the pyarrow read) — still zero Exchange."""
    df = spark.range(0, 20_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    path = str(tmp_path_factory.mktemp("ckpt_vr") / "m")
    encode_table(df, key_col="k", num_partitions=8, partitioner="range",
                 chunk_rows=1024).write.parquet(path)
    full = decode_checkpoint(spark, path, df.schema)
    hit = decode_checkpoint(spark, path, df.schema,
                            value_range=("v", 30_000, 30_600))
    assert "Exchange" not in hit._jdf.queryExecution().executedPlan().toString()
    assert hit.rdd.getNumPartitions() < full.rdd.getNumPartitions()
    got = sorted(r.v for r in hit.select("v").collect())
    assert got == [v for v in range(0, 60_000, 3) if 30_000 <= v <= 30_600]


def test_compact_checkpoint_accepts_legacy_manifests(spark, token_df, tmp_path_factory):
    """Compaction is the tool the fallback warning points legacy
    checkpoints at, so it must accept manifests written before the
    value-zone-map columns existed (filled with typed NULLs)."""
    src = str(tmp_path_factory.mktemp("ckpt_leg") / "src")
    dst = str(tmp_path_factory.mktemp("ckpt_leg") / "dst")
    m = encode_table(token_df, key_col="doc_id", codec="auto",
                     num_partitions=2, chunk_rows=512, partitioner="hash")
    # simulate a round-2 manifest: the zone-map columns don't exist
    m.drop("val_min", "val_max").write.parquet(src)
    m.drop("val_min", "val_max").write.mode("append").parquet(src)  # dups

    from wills_columnar_format_spark.engine import compact_checkpoint
    compact_checkpoint(spark, src, dst, num_files=2)
    dec = decode_checkpoint(spark, dst, token_df.schema)
    assert "Exchange" not in dec._jdf.queryExecution().executedPlan().toString()
    _assert_equals_source(dec, token_df)


def test_verify_checksums_clean_and_corrupted(spark, tmp_path_factory):
    """verify_checksums re-hashes every decoded sub-column against the
    encoder's recorded blake2b. A corrupted checkpoint whose blobs were
    SWAPPED between chunks decodes without error and would silently
    return wrong rows — verification must catch exactly that."""
    import glob
    import os

    import pyarrow.parquet as pq

    df = spark.range(0, 1_024).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    path = str(tmp_path_factory.mktemp("ckpt_sum") / "m")
    encode_table(df, key_col="k", num_partitions=2, chunk_rows=256,
                 partitioner="range").write.parquet(path)

    # clean manifest: verified decode equals the source (both paths)
    dec = decode_checkpoint(spark, path, df.schema, verify_checksums=True)
    assert dec.count() == 1_024
    from wills_columnar_format_spark.engine import decode_table
    dec2 = decode_table(spark.read.parquet(path), df.schema,
                        verify_checksums=True)
    assert dec2.count() == 1_024

    # corrupt: swap the 'v' blobs of two EQUAL-SIZED chunks inside one
    # file — each still decodes fine (same values_count, so the rebuilt
    # arrays line up), so only the checksum check can notice. Chunks of
    # UNEQUAL size must not be paired: range sampling sometimes splits
    # 1024 rows as 510/514, and swapping a 254-value blob under a
    # 256-value chunk crashes the unverified decode at from_arrays
    # instead of silently succeeding (the flake this guard removes).
    from wills_columnar_format_spark.format import read_footer

    swapped = False
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        t = pq.read_table(f)
        d = t.to_pydict()
        idx = [i for i, c in enumerate(d["column"]) if c == "v"]
        by_count = {}
        pair = None
        for i in idx:
            n = read_footer(d["blob"][i]).values_count
            if n in by_count:
                pair = (by_count[n], i)
                break
            by_count[n] = i
        if pair is not None:
            a, b = pair
            d["blob"][a], d["blob"][b] = d["blob"][b], d["blob"][a]
            import pyarrow as pa
            pq.write_table(pa.table(d, schema=t.schema), f)
            swapped = True
            break
    if not swapped:
        # no within-file pair (uneven split left every chunk in a file a
        # different size): swap equal-count v blobs ACROSS the two files
        # — same corruption, same detectability
        import pyarrow as pa

        files = sorted(glob.glob(f"{path}/*.parquet"))
        tabs = {f: pq.read_table(f).to_pydict() for f in files}
        sites = {}  # values_count -> (file, row)
        for f in files:
            d = tabs[f]
            for i, c in enumerate(d["column"]):
                if c != "v":
                    continue
                n = read_footer(d["blob"][i]).values_count
                if n in sites and sites[n][0] != f:
                    (fa, a) = sites[n]
                    da, db = tabs[fa], d
                    da["blob"][a], db["blob"][i] = db["blob"][i], da["blob"][a]
                    for ff, dd in ((fa, da), (f, db)):
                        pq.write_table(
                            pa.table(dd, schema=pq.read_schema(ff)), ff
                        )
                    swapped = True
                    break
                sites.setdefault(n, (f, i))
            if swapped:
                break
    assert swapped
    for crc in glob.glob(f"{path}/.*.crc"):
        os.remove(crc)

    # unverified decode returns the full (silently wrong) row count
    assert decode_checkpoint(spark, path, df.schema).count() == 1_024
    # verified decode raises loudly on both paths
    with pytest.raises(Exception, match="checksum mismatch"):
        decode_checkpoint(spark, path, df.schema,
                          verify_checksums=True).count()
    with pytest.raises(Exception, match="checksum mismatch"):
        decode_table(spark.read.parquet(path), df.schema,
                     verify_checksums=True).count()


def test_clustered_marker_skips_gate(spark, token_df, tmp_path_factory, monkeypatch):
    """First full decode verifies the layout and writes a `_clustered`
    marker; the second decode must run NO gate aggregate at all (a hot
    point-lookup service re-verifies once per checkpoint, not per
    query). Appending files invalidates the marker via the file
    signature and the gate runs again."""
    import os

    import wills_columnar_format_spark.engine as eng

    path = str(tmp_path_factory.mktemp("ckpt_marker") / "m")
    m = encode_table(token_df, key_col="doc_id", codec="auto",
                     num_partitions=4, chunk_rows=512, partitioner="hash")
    m.write.parquet(path)
    dec = decode_checkpoint(spark, path, token_df.schema)
    dec.count()
    assert os.path.exists(os.path.join(path, "_clustered"))

    def boom(_):
        raise AssertionError("gate aggregate ran despite a valid marker")

    monkeypatch.setattr(eng, "_checkpoint_is_clustered", boom)
    dec2 = decode_checkpoint(spark, path, token_df.schema)
    _assert_equals_source(dec2, token_df)
    monkeypatch.undo()

    # append (streaming/resume) -> signature mismatch -> gate runs again
    m.write.mode("append").parquet(path)
    with pytest.warns(UserWarning, match="not chunk-clustered"):
        decode_checkpoint(spark, path, token_df.schema)


def test_rechunk_compaction_recovers_compression(spark, token_df, tmp_path_factory):
    """Streaming ingest writes small chunks; re-encoding compaction at
    big chunks must land within 2% of a direct big-chunk batch encode
    (dictionary/rANS table amortization) and stay losslessly decodable
    shuffle-free."""
    from wills_columnar_format_spark.engine import compact_checkpoint

    src = str(tmp_path_factory.mktemp("ckpt_rc") / "src")
    dst = str(tmp_path_factory.mktemp("ckpt_rc") / "dst")
    # small-chunk ingest shape (streaming micro-batches)
    encode_table(token_df, key_col="doc_id", codec="auto",
                 num_partitions=4, chunk_rows=512,
                 partitioner="hash").write.parquet(src)
    small_bytes = spark.read.parquet(src).agg(
        F.sum(F.length("blob"))).collect()[0][0]

    # hash partitioning on BOTH sides: the default range sampler is
    # nondeterministic, so compacted and direct-batch chunk boundaries
    # could drift apart and flake the 2% byte comparison below — hash
    # boundaries are a pure function of the keys
    compact_checkpoint(spark, src, dst, rechunk_rows=65536,
                       schema=token_df.schema, key_col="doc_id",
                       num_partitions=2, partitioner="hash")
    big_bytes = spark.read.parquet(dst).agg(
        F.sum(F.length("blob"))).collect()[0][0]
    # reference batch encode at the same big-chunk layout
    batch = encode_table(token_df, key_col="doc_id", codec="auto",
                         num_partitions=2, chunk_rows=65536,
                         partitioner="hash")
    batch_bytes = batch.agg(F.sum(F.length("blob"))).collect()[0][0]

    assert big_bytes < small_bytes  # compaction actually helped
    assert abs(big_bytes - batch_bytes) / batch_bytes < 0.02

    dec = decode_checkpoint(spark, dst, token_df.schema)
    assert "Exchange" not in dec._jdf.queryExecution().executedPlan().toString()
    _assert_equals_source(dec, token_df)


def test_externally_resorted_checkpoint_raises_clearly(spark, token_df, tmp_path_factory):
    """A manifest file re-sorted by an external tool (column-major) still
    passes the one-file-per-chunk gate but tears every chunk's
    sub-column group; decode must raise an IOError naming
    compact_checkpoint, never an opaque KeyError."""
    import glob
    import os

    import pyarrow.parquet as pq

    path = str(tmp_path_factory.mktemp("ckpt_sort") / "m")
    encode_table(token_df, key_col="doc_id", codec="auto",
                 num_partitions=1, chunk_rows=512,
                 partitioner="hash").write.parquet(path)
    f = sorted(glob.glob(os.path.join(path, "part-*.parquet")))[0]
    t = pq.read_table(f)
    t = t.sort_by([("column", "ascending"), ("chunk_key", "ascending")])
    pq.write_table(t, f)
    for crc in glob.glob(os.path.join(path, ".*.crc")):
        os.remove(crc)  # stale Hadoop sidecars fail LocalFS reads
    marker = os.path.join(path, "_clustered")
    if os.path.exists(marker):
        os.remove(marker)
    with pytest.raises(Exception) as ei:
        decode_checkpoint(spark, path, token_df.schema).count()
    assert "compact_checkpoint" in str(ei.value)


def test_schema_mismatch_diagnosed_not_blamed_on_layout(spark, token_df, tmp_path_factory):
    """Asking decode for a column the manifest never stored must say
    'check the schema argument', not prescribe compact_checkpoint for a
    healthy checkpoint (review finding: the KeyError rewrap sent users
    to re-shuffle perfectly fine data)."""
    import pyarrow as pa

    path = str(tmp_path_factory.mktemp("ckpt_sm") / "m")
    encode_table(token_df, key_col="doc_id", codec="auto",
                 num_partitions=2, chunk_rows=512,
                 partitioner="hash").write.parquet(path)
    wrong = pa.schema([pa.field("doc_id", pa.string()),
                       pa.field("no_such_column", pa.int64())])
    with pytest.raises(Exception) as ei:
        decode_checkpoint(spark, path, wrong).count()
    msg = str(ei.value)
    assert "no manifest row seen so far carries it" in msg
    assert "check the schema argument" in msg


def test_self_describing_checkpoint(spark, token_df, tmp_path_factory):
    """write_checkpoint persists the table schema as a _table_schema
    sidecar; decode_checkpoint and rechunking compaction then need no
    schema argument (the reference's footer-makes-it-self-decoding
    property at checkpoint granularity). Missing sidecar -> clear error
    naming the writer helpers; compaction propagates the sidecar."""
    from wills_columnar_format_spark.engine import (
        compact_checkpoint, read_checkpoint_schema, write_checkpoint)

    base = tmp_path_factory.mktemp("ckpt_sd")
    path = str(base / "m")
    m = encode_table(token_df, key_col="doc_id", codec="auto",
                     num_partitions=2, chunk_rows=512, partitioner="hash")
    write_checkpoint(m, path, schema=token_df.schema)
    dec = decode_checkpoint(spark, path)  # no schema argument
    _assert_equals_source(dec, token_df)

    # rechunk compaction without schema= (sidecar supplies it) and the
    # destination stays self-describing
    dst = str(base / "m_c")
    compact_checkpoint(spark, path, dst, rechunk_rows=65536,
                       key_col="doc_id", num_partitions=2,
                       partitioner="hash")
    assert read_checkpoint_schema(dst) is not None
    _assert_equals_source(decode_checkpoint(spark, dst), token_df)

    # plain write: no sidecar -> decode without schema raises clearly
    bare = str(base / "bare")
    m.write.parquet(bare)
    with pytest.raises(ValueError, match="write_checkpoint"):
        decode_checkpoint(spark, bare)


def test_metadata_compaction_propagates_sidecar(spark, token_df, tmp_path_factory):
    from wills_columnar_format_spark.engine import (
        compact_checkpoint, read_checkpoint_schema, write_checkpoint)

    base = tmp_path_factory.mktemp("ckpt_sd2")
    path, dst = str(base / "m"), str(base / "mc")
    m = encode_table(token_df, key_col="doc_id", codec="auto",
                     num_partitions=2, chunk_rows=512, partitioner="hash")
    write_checkpoint(m, path, schema=token_df.schema)
    write_checkpoint(m, path, schema=token_df.schema, mode="append")  # duplicate
    compact_checkpoint(spark, path, dst)
    assert read_checkpoint_schema(dst) is not None
    _assert_equals_source(decode_checkpoint(spark, dst), token_df)


def test_schema_sidecar_accepts_ddl_string(spark, tmp_path_factory):
    """readStream.schema() takes DDL strings; the sidecar writer must
    too (encode_stream passes its schema argument straight through)."""
    import pyarrow as pa

    from wills_columnar_format_spark.engine import (
        read_checkpoint_schema, write_checkpoint_schema)

    d = str(tmp_path_factory.mktemp("sidecar_ddl") / "m")
    write_checkpoint_schema(d, "doc_id string, tokens array<int>")
    s = read_checkpoint_schema(d)
    assert s is not None and s.field("doc_id").type == pa.string()
