"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: encode the sf0.001 documents table with the
columnar engine (auto codec selection), decode it, and return a per-column
verification/metrics DataFrame (codec chosen, bytes in/out, ratio,
roundtrip_ok).

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2 codecs + engine paths, plus the training-data pipeline
operators: text analysis, dedup, similarity, multimodal).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ensure_shipped(spark: SparkSession) -> None:
    from wills_columnar_format_spark.session import ship_package

    try:
        ship_package(spark)
    except Exception:
        pass  # already shipped or local import works


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full encode→decode
    roundtrip of the documents table + per-column codec/compression
    metrics with a roundtrip_ok verification flag."""
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import (
        decode_table,
        encode_table,
        manifest_summary,
    )

    _ensure_shipped(spark)
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    manifest = encode_table(df, key_col="doc_id", codec="auto", num_partitions=8)
    manifest = manifest.cache()
    decoded = decode_table(manifest, df.schema)
    bad = (
        decoded.alias("d")
        .join(df.alias("o"), "doc_id")
        .filter(
            ~(
                (F.col("d.text") == F.col("o.text"))
                & (F.col("d.lang") == F.col("o.lang"))
                & (F.col("d.source") == F.col("o.source"))
                & (F.col("d.n_chars") == F.col("o.n_chars"))
            )
        )
        .count()
    )
    n_orig = df.count()
    n_dec = decoded.count()
    ok = (bad == 0) and (n_dec == n_orig)
    return manifest_summary(manifest).withColumn("roundtrip_ok", F.lit(bool(ok)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from wills_columnar_format_spark.operators import registry

    base = registry.queries()

    def wrap(fn):
        def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        return inner

    return {name: wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    from wills_columnar_format_spark.operators import registry

    return registry.oracle_sql()
