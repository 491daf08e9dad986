"""Incremental MinHash dedup: persisted signature index + per-batch probe
(operators/dedup.py build_dedup_index / probe_dedup_index). The contract:
pairs TOUCHING the new batch equal the exact all-pairs jaccard oracle
restricted to those pairs — without recomputing corpus signatures."""

import os

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.operators.dedup import (
    build_dedup_index,
    probe_dedup_index,
)

# exact-jaccard truth over an arbitrary docs view (mirrors the registry
# oracle pieces: 2-gram shingles, DISTINCT per doc, >= 0.5)
_EXACT_SQL = """
WITH toks AS (SELECT doc_id, split(trim(text), '\\\\s+') AS t FROM {docs}),
grams AS (SELECT DISTINCT doc_id,
                 concat(element_at(t, CAST(i AS INT)), ' ',
                        element_at(t, CAST(i AS INT) + 1)) AS g2
          FROM toks LATERAL VIEW explode(sequence(1, size(t) - 1)) e AS i
          WHERE size(t) >= 2),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
          FROM grams a JOIN grams b ON a.g2 = b.g2 AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
SELECT d1, d2, CAST(ROUND(c * 1.0 / (s1.n + s2.n - c), 4) AS DOUBLE) AS jaccard
FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
WHERE c * 1.0 / (s1.n + s2.n - c) >= 0.5
"""


def _pairs(df):
    return sorted((r["d1"], r["d2"], r["jaccard"]) for r in df.collect())


def _exact_touching(spark, all_docs, lo):
    all_docs.createOrReplaceTempView("inc_all_docs")
    exp = spark.sql(_EXACT_SQL.format(docs="inc_all_docs")).filter(
        F.col("d2") >= lo)
    return _pairs(exp)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text").localCheckpoint(eager=True))


def test_incremental_probe_matches_exact(spark, corpus, tmp_path):
    idx = str(tmp_path / "idx")
    build_dedup_index(spark, corpus, idx)
    batch = corpus.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text")
    got = probe_dedup_index(spark, batch, idx, corpus, update_index=True)
    exp = _exact_touching(spark, corpus.unionByName(batch), 100000)
    assert _pairs(got) == exp and exp

    # second batch probes against the GROWN index (corpus + batch 1)
    batch2 = corpus.filter(F.col("doc_id") % 5 == 1).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text")
    got2 = probe_dedup_index(spark, batch2, idx,
                             corpus.unionByName(batch), update_index=False)
    exp2 = _exact_touching(
        spark, corpus.unionByName(batch).unionByName(batch2), 200000)
    assert _pairs(got2) == exp2 and exp2
    # batch-1 copies ARE in the index now: their (old-copy, new-copy)
    # identical-text pairs must surface through batch 2's originals
    assert any(d1 < 100000 for d1, _, _ in exp2)


def test_incremental_checkpoint_corpus(spark, corpus, tmp_path):
    # candidate texts fetched from a columnar CHECKPOINT via the
    # Bloom-pruned multi-point lookup — the engine composition
    from wills_columnar_format_spark.engine import (encode_table,
                                                    write_checkpoint)

    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    build_dedup_index(spark, corpus, idx)
    m = encode_table(corpus, key_col="doc_id", partitioner="hash",
                     num_partitions=4, chunk_rows=64)
    write_checkpoint(m, ckpt, schema=corpus.schema)
    batch = corpus.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text")
    got = probe_dedup_index(spark, batch, idx, ckpt, update_index=False)
    exp = _exact_touching(spark, corpus.unionByName(batch), 100000)
    assert _pairs(got) == exp and exp


def test_incremental_hot_band_stars(spark, tmp_path):
    # band_cap=1 kills every multi-doc band; exact-fingerprint stars
    # must still report the identical-copy pairs (the hot-band trade)
    rows = [(i, "the same exact boilerplate text repeated here")
            for i in range(50)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "idx")
    build_dedup_index(spark, corpus, idx)
    batch = spark.createDataFrame(
        [(1000, "the same exact boilerplate text repeated here"),
         (1001, "a completely different and unrelated sentence")],
        "doc_id long, text string")
    got = probe_dedup_index(spark, batch, idx, corpus, band_cap=1,
                            update_index=False)
    pairs = _pairs(got)
    assert {(d1, d2) for d1, d2, _ in pairs} == {(i, 1000) for i in range(50)}
    assert all(j == 1.0 for _, _, j in pairs)


def test_incremental_gramless_docs(spark, tmp_path):
    # 1-word docs have empty shingle sets: jaccard undefined, no pairs
    # (matches the batch operator and the exact oracle)
    corpus = spark.createDataFrame(
        [(1, "word"), (2, "two words here now")], "doc_id long, text string")
    idx = str(tmp_path / "idx")
    build_dedup_index(spark, corpus, idx)
    batch = spark.createDataFrame(
        [(100, "word"), (101, "two words here now")],
        "doc_id long, text string")
    got = probe_dedup_index(spark, batch, idx, corpus, update_index=False)
    assert _pairs(got) == [(2, 101, 1.0)]
