"""Skew handling evidence: weight-balanced bucketing bounds per-partition
BYTES where row-balanced range partitioning does not.

The north rule demands explicit skew handling; token rows skew in bytes
(Zipf lengths), so equal ROW counts per partition still give unbalanced
tasks. ``weight_balanced_bucket_expr`` cuts sampled cumulative-``n_tok``
quantiles instead.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.engine import encode_table


@pytest.fixture(scope="module")
def skewed_df(spark, tmp_path_factory):
    """10k docs: 2% giants (2000 tokens), 98% tiny (8 tokens) — giants
    clustered at the low end of the key range so row-balanced ranges put
    all heavy rows in few partitions."""
    rng = np.random.default_rng(3)
    n = 10_000
    lengths = np.where(np.arange(n) < 200, 2000, 8).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    tokens = rng.integers(0, 50_257, int(lengths.sum())).astype(np.int32)
    t = pa.table({
        "doc_id": pa.array([f"doc-{i:07d}" for i in range(n)]),
        "tokens": pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(tokens)),
        "n_tok": pa.array(lengths.astype(np.int32)),
        "source": pa.array(["web"] * n),
    })
    path = str(tmp_path_factory.mktemp("skew") / "t.parquet")
    pq.write_table(t, path)
    return spark.read.parquet(path)


def _imbalance(manifest) -> float:
    per_part = (
        manifest.filter(F.col("column") == "tokens#values")
        .groupBy("part_id").agg(F.sum("bytes_in").alias("b"))
        .collect()
    )
    sizes = [r.b for r in per_part]
    return max(sizes) / (sum(sizes) / len(sizes))


def test_file_sampling_fast_path_gated_on_bare_scan(spark, skewed_df):
    """The file-sampling fast path re-reads raw files, so it must engage
    only when the optimized plan is scan+project: any row-distribution-
    changing node (Filter/Sample/Limit/Join) would make the sampled
    bounds diverge from the rows actually encoded."""
    from wills_columnar_format_spark.engine import _is_bare_scan

    assert _is_bare_scan(skewed_df)
    assert _is_bare_scan(skewed_df.select("doc_id", "n_tok"))
    assert not _is_bare_scan(skewed_df.filter(F.col("n_tok") > 8))
    assert not _is_bare_scan(skewed_df.sample(0.5, seed=1))
    assert not _is_bare_scan(skewed_df.limit(10))
    assert not _is_bare_scan(
        skewed_df.join(skewed_df.select("doc_id"), "doc_id")
    )


def test_weight_bucketing_bounds_byte_skew(spark, skewed_df):
    m_range = encode_table(skewed_df, key_col="doc_id", codec="plain",
                           num_partitions=8, partitioner="range", chunk_rows=100_000)
    m_weight = encode_table(skewed_df, key_col="doc_id", codec="plain",
                            num_partitions=8, weight_col="n_tok", partitioner="weight",
                            chunk_rows=100_000)
    imb_range = _imbalance(m_range)
    imb_weight = _imbalance(m_weight)
    # range: the giant cluster lands in 1-2 of 8 partitions -> max >> mean
    assert imb_range > 2.5
    # weight quantiles spread the giants across buckets
    assert imb_weight < imb_range / 2
    assert imb_weight < 2.0
