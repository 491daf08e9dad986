"""Checkpoint/resume tests (north-rule resumability): a run that loses
partitions mid-job resumes from the manifest, re-encodes only the missing
chunks, and re-encoded chunks are byte-identical (checksummed lineage).
"""

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.data import ensure_token_table
from wills_columnar_format_spark.engine import (
    committed_set,
    decode_table,
    encode_table_resumable,
)

N_ROWS = 6_000


@pytest.fixture(scope="module")
def token_df(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tok_resume") / "token_table")
    ensure_token_table(path, N_ROWS, seed=7)
    return spark.read.parquet(path)


def test_resume_after_partial_failure(spark, token_df, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt") / "manifest")

    # run 1: partitions 1 and 3 "crash" (emit nothing) — partial manifest
    m1 = encode_table_resumable(
        token_df, ckpt, key_col="doc_id", num_partitions=4, chunk_rows=2048,
        fail_parts=frozenset({1, 3}), snapshot_id="snap-A",
    )
    parts1 = {r.part_id for r in m1.select("part_id").distinct().collect()}
    assert parts1 and 1 not in parts1 and 3 not in parts1
    n1 = m1.count()

    # run 2: resume — only the missing chunks are encoded
    m2 = encode_table_resumable(
        token_df, ckpt, key_col="doc_id", num_partitions=4, chunk_rows=2048,
        snapshot_id="snap-A",
    )
    parts2 = {r.part_id for r in m2.select("part_id").distinct().collect()}
    assert parts2 == {0, 1, 2, 3}
    n2 = m2.count()
    assert n2 > n1

    # full decode equals the input per row
    decoded = decode_table(m2, token_df.schema)
    bad = (
        decoded.alias("d").join(token_df.alias("o"), "doc_id")
        .filter(~(F.col("d.tokens") == F.col("o.tokens")))
        .count()
    )
    assert bad == 0
    assert decoded.count() == N_ROWS

    # run 3: everything committed — nothing new is appended (idempotent)
    m3 = encode_table_resumable(
        token_df, ckpt, key_col="doc_id", num_partitions=4, chunk_rows=2048,
        snapshot_id="snap-A",
    )
    assert m3.count() == n2


def test_reencode_is_byte_identical(spark, token_df, tmp_path_factory):
    """Codec choice is a pure function of chunk values, so re-encoding a
    chunk reproduces identical blobs (SURVEY.md §7.3 determinism)."""
    ckpt_a = str(tmp_path_factory.mktemp("ckpt_a") / "m")
    ckpt_b = str(tmp_path_factory.mktemp("ckpt_b") / "m")
    kw = dict(key_col="doc_id", num_partitions=4, chunk_rows=2048, snapshot_id="s")
    ma = encode_table_resumable(token_df, ckpt_a, **kw)
    mb = encode_table_resumable(token_df, ckpt_b, **kw)
    # key_bloom rides the comparison: the bloom must also be a pure
    # function of the chunk's key values (pandas siphash + splitmix64,
    # no run-dependent state) or resumed manifests would diverge
    a = {(r.part_id, r.chunk_id, r.column):
         (r.checksum, bytes(r.blob), r.key_bloom) for r in ma.collect()}
    b = {(r.part_id, r.chunk_id, r.column):
         (r.checksum, bytes(r.blob), r.key_bloom) for r in mb.collect()}
    assert a == b


def test_committed_set_roundtrip(spark, token_df, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt_c") / "m")
    assert committed_set(spark, ckpt) == frozenset()
    m = encode_table_resumable(token_df, ckpt, key_col="doc_id", num_partitions=2, chunk_rows=4096)
    cs = committed_set(spark, ckpt)
    assert len(cs) == m.count()


def test_done_markers_and_partition_prefilter(spark, token_df, tmp_path_factory):
    """Partition-granular resume: completed partitions commit __done__
    markers; a resumed run collects only the done-id set and filters
    completed partitions' input out BEFORE the shuffle (the driver never
    holds per-chunk state — the 300M-manifest-row scale path)."""
    from wills_columnar_format_spark.engine import done_partitions, encode_table

    ckpt = str(tmp_path_factory.mktemp("ckpt_d") / "m")
    m1 = encode_table_resumable(
        token_df, ckpt, key_col="doc_id", num_partitions=4, chunk_rows=2048,
        fail_parts=frozenset({2}),
    )
    assert done_partitions(spark, ckpt, "j0/of1-n4-doc_id-hash-ck3") == {0, 1, 3}

    # the prefilter predicate must replicate Spark's HashPartitioning
    # placement: manifest part_id == pmod(hash(key), N) for every chunk
    enc = encode_table(token_df, key_col="doc_id", num_partitions=4,
                       chunk_rows=2048, partitioner="hash")
    placed = enc.select("part_id", "min_key").collect()
    probe = token_df.select(
        "doc_id", F.pmod(F.hash(F.col("doc_id")), F.lit(4)).alias("expect")
    ).collect()
    expect_by_key = {str(r.doc_id): r.expect for r in probe}
    for r in placed:
        assert r.part_id == expect_by_key[r.min_key] or r.min_key == ""

    m2 = encode_table_resumable(
        token_df, ckpt, key_col="doc_id", num_partitions=4, chunk_rows=2048,
    )
    assert done_partitions(spark, ckpt, "j0/of1-n4-doc_id-hash-ck3") == {0, 1, 2, 3}
    # decode equals input
    dec = decode_table(m2, token_df.schema)
    assert dec.count() == N_ROWS

    # third run: all parts done -> continue without an encode job; the
    # manifest is unchanged
    n2 = m2.count()
    m3 = encode_table_resumable(
        token_df, ckpt, key_col="doc_id", num_partitions=4, chunk_rows=2048,
    )
    assert m3.count() == n2


def test_sub_jobs_resume(spark, token_df, tmp_path_factory):
    """sub_jobs splits the encode into disjoint append jobs (crash
    granularity = 1/sub_jobs of the input); the merged manifest decodes
    to the full table and matches a single-job encode byte-for-byte."""
    ckpt_s = str(tmp_path_factory.mktemp("ckpt_s") / "m")
    ckpt_1 = str(tmp_path_factory.mktemp("ckpt_1") / "m")
    kw = dict(key_col="doc_id", num_partitions=4, chunk_rows=2048)
    ms = encode_table_resumable(token_df, ckpt_s, sub_jobs=3, **kw)
    dec = decode_table(ms, token_df.schema)
    assert dec.count() == N_ROWS
    bad = (
        dec.alias("d").join(token_df.alias("o"), "doc_id")
        .filter(~(F.col("d.tokens") == F.col("o.tokens")))
        .count()
    )
    assert bad == 0
    # chunk contents are content-keyed: same chunks exist regardless of
    # the job split (each sub-job repartitions its key-subset the same
    # deterministic way), so checksums of shared chunk keys must agree
    m1 = encode_table_resumable(token_df, ckpt_1, sub_jobs=1, **kw)
    cs_s = {(r.chunk_key, r.column): r.checksum for r in ms.collect()}
    cs_1 = {(r.chunk_key, r.column): r.checksum for r in m1.collect()}
    for k in set(cs_s) & set(cs_1):
        assert cs_s[k] == cs_1[k]


def test_anti_join_resume_past_committed_cap(spark, token_df, tmp_path_factory, monkeypatch):
    """A merged manifest bigger than MAX_COMMITTED_COLLECT (simulated by
    shrinking the cap) must NOT silently re-encode everything: the
    keys-only planning pass anti-joins planned chunk keys against the
    manifest and only the missing chunks are encoded."""
    import wills_columnar_format_spark.engine as eng
    from wills_columnar_format_spark.engine import encode_table

    kw = dict(key_col="doc_id", num_partitions=4, chunk_rows=2048)
    monkeypatch.setattr(eng, "MAX_COMMITTED_COLLECT", 10)

    # fully-merged manifest, NO done markers (the merged-checkpoint
    # scenario the partition-granular fast path can't help with)
    ckpt_full = str(tmp_path_factory.mktemp("ckpt_aj1") / "m")
    encode_table(token_df, partitioner="hash", **kw).write.parquet(ckpt_full)
    n0 = spark.read.parquet(ckpt_full).count()
    assert n0 > 10  # the shrunken cap really is exceeded
    m = encode_table_resumable(token_df, ckpt_full, **kw)
    n1 = spark.read.parquet(ckpt_full).count()
    assert n1 == n0 + 4  # ONLY the 4 done markers appended: zero re-encode
    dec = decode_table(m, token_df.schema)
    assert dec.count() == N_ROWS

    # partially-merged manifest: one partition's chunks missing — the
    # anti-join re-encodes exactly that partition's chunks
    ckpt_part = str(tmp_path_factory.mktemp("ckpt_aj2") / "m")
    encode_table(token_df, partitioner="hash",
                 fail_parts=frozenset({2}), **kw).write.parquet(ckpt_part)
    n0p = spark.read.parquet(ckpt_part).count()
    miss = (
        encode_table(token_df, partitioner="hash", **kw)
        .filter(F.col("part_id") == 2).count()
    )
    assert miss > 0
    m2 = encode_table_resumable(token_df, ckpt_part, **kw)
    n1p = spark.read.parquet(ckpt_part).count()
    assert n1p == n0p + miss + 4  # the missing chunks + markers, no more
    dec2 = decode_table(m2, token_df.schema)
    assert dec2.count() == N_ROWS
    bad = (
        dec2.alias("d").join(token_df.alias("o"), "doc_id")
        .filter(~(F.col("d.tokens") == F.col("o.tokens"))).count()
    )
    assert bad == 0


def test_sub_job_split_decorrelated_from_partition_hash(spark, token_df, tmp_path_factory):
    """The sub-job split hash must be independent of the Murmur3
    partition-placement hash: with sub_jobs=4 and n=8 (gcd 4) every
    sub-job's chunks must still land across ALL 8 partitions. The old
    pmod(hash(key), 4) split reached only 8/gcd = 2 of them — 75% empty
    tasks per sub-job and 4x-inflated data-bearing partitions."""
    from pyspark.sql import functions as F

    ckpt = str(tmp_path_factory.mktemp("ckpt_sj") / "m")
    m = encode_table_resumable(
        token_df, ckpt, sub_jobs=4, key_col="doc_id", num_partitions=8,
        chunk_rows=64,
    )
    # each chunk belongs wholly to one sub-job (the split filter precedes
    # partitioning), so the chunk's min_key recovers its sub-job id
    placed = (
        m.filter(F.col("min_key") != "")
        .select(
            "part_id",
            F.pmod(F.xxhash64(F.col("min_key")), F.lit(4)).alias("sub_job"),
        )
        .groupBy("sub_job")
        .agg(F.countDistinct("part_id").alias("n_parts"))
        .collect()
    )
    assert len(placed) == 4
    for r in placed:
        assert r.n_parts == 8, f"sub-job {r.sub_job} reached only {r.n_parts}/8 partitions"
    # the tag binds the decorrelated split family (old of4 tags refused)
    markers = spark.read.parquet(ckpt).filter(F.col("column") == "__done__")
    tags = {r.chunk_key.split(":")[1] for r in markers.select("chunk_key").collect()}
    assert all("of4xx-" in t for t in tags)


def test_none_partitioner_resume_skips_completed(spark, token_df, tmp_path_factory):
    """With partitioner='none' the task layout is the SCAN's split count,
    not num_partitions — a completed encode must satisfy the full-sub-job
    skip on resume (no re-scan, no checkpoint growth)."""
    ckpt = str(tmp_path_factory.mktemp("ckpt_none") / "m")
    kw = dict(key_col="doc_id", chunk_rows=2048, partitioner="none",
              num_partitions=1000)  # deliberately wrong vs the scan layout
    m1 = encode_table_resumable(token_df, ckpt, **kw)
    n_files_rows = spark.read.parquet(ckpt).count()
    m2 = encode_table_resumable(token_df, ckpt, **kw)
    # second run skipped entirely: nothing appended (markers included)
    assert spark.read.parquet(ckpt).count() == n_files_rows
    dec = decode_table(m2, token_df.schema)
    assert dec.count() == N_ROWS


def test_resume_with_changed_partition_count_refuses(spark, token_df, tmp_path_factory):
    """Chunk identity is content-based, so a resume under a different
    partition layout would produce NEW chunk keys alongside the old ones
    and silently duplicate rows on decode. The engine must refuse."""
    import pytest as _pt

    ckpt = str(tmp_path_factory.mktemp("ckpt_n") / "m")
    encode_table_resumable(
        token_df, ckpt, key_col="doc_id", num_partitions=4, chunk_rows=2048,
        fail_parts=frozenset({2}),
    )
    with _pt.raises(ValueError, match="num_partitions"):
        encode_table_resumable(
            token_df, ckpt, key_col="doc_id", num_partitions=8, chunk_rows=2048,
        )
    # same layout resumes fine and completes the table
    m = encode_table_resumable(
        token_df, ckpt, key_col="doc_id", num_partitions=4, chunk_rows=2048,
    )
    dec = decode_table(m, token_df.schema)
    assert dec.count() == N_ROWS
