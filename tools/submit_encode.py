"""spark-submit entry point for the distributed encode job.

Deployment path per the north rule (``spark-submit --py-files``):

    python -m zipfile -c /tmp/wcfs.zip wills_columnar_format_spark
    spark-submit --master <cluster> --py-files /tmp/wcfs.zip \
        tools/submit_encode.py --input <parquet_or_iceberg> \
        --checkpoint <dir> --key-col doc_id --weight-col n_tok

In the sandbox the same script runs standalone (it builds a local[N]
session itself when spark-submit didn't provide one). The job is
resumable: re-submitting with the same --checkpoint skips committed
chunks (idempotent re-encode, verified by checksummed lineage).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="input: parquet path OR Iceberg/catalog table identifier")
    ap.add_argument("--checkpoint", required=True, help="manifest checkpoint dir")
    ap.add_argument("--key-col", default="doc_id")
    ap.add_argument("--weight-col", default=None,
                    help="byte-skew weight column (e.g. n_tok); requires "
                         "--partitioner weight")
    ap.add_argument("--partitioner", default="hash",
                    choices=["hash", "range", "weight", "none"],
                    help="hash (default) is the resume-safe deterministic "
                         "layout; weight enables byte-balanced bucketing via "
                         "--weight-col; none trusts key-ordered ingest")
    ap.add_argument("--codec", default="auto")
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--chunk-rows", type=int, default=65536)
    ap.add_argument("--sub-jobs", type=int, default=1,
                    help="split the encode into K disjoint append jobs; a crash "
                         "loses at most 1/K of the work (engine.py resume docs)")
    ap.add_argument("--snapshot-id", default=None,
                    help="input snapshot id for lineage (auto-resolved for Iceberg tables)")
    ap.add_argument("--cores", type=int, default=None, help="local mode cores (standalone runs)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from wills_columnar_format_spark.engine import encode_table_resumable, manifest_summary
    from wills_columnar_format_spark.session import get_spark, ship_package
    from wills_columnar_format_spark.sources import load_table

    active = SparkSession.getActiveSession()
    if active is not None:  # launched via spark-submit: session is configured
        spark = active
        ship_package(spark)
    else:
        spark = get_spark(app="wcfs-encode", cores=args.cores)

    df, snap, _kind = load_table(spark, args.input)
    t0 = time.time()
    manifest = encode_table_resumable(
        df,
        args.checkpoint,
        sub_jobs=args.sub_jobs,
        key_col=args.key_col,
        codec=args.codec,
        num_partitions=args.num_partitions,
        chunk_rows=args.chunk_rows,
        weight_col=args.weight_col,
        partitioner=args.partitioner,
        snapshot_id=args.snapshot_id or snap,
    )
    agg = manifest.agg(
        F.count("*").alias("chunks"),
        F.sum("n_values").alias("values"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum("bytes_out").alias("bytes_out"),
    ).collect()[0]
    manifest_summary(manifest).show(truncate=False)
    print(json.dumps({
        "sec": round(time.time() - t0, 2),
        "manifest_rows": int(agg.chunks),
        "bytes_in": int(agg.bytes_in),
        "bytes_out": int(agg.bytes_out),
        "ratio": round(int(agg.bytes_out) / max(int(agg.bytes_in), 1), 4),
        "checkpoint": args.checkpoint,
    }))


if __name__ == "__main__":
    main()
