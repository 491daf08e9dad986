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
    ap.add_argument("--checkpoint", default=None,
                    help="manifest checkpoint dir (RESUMABLE mode: append "
                         "jobs, done markers, hash layout)")
    ap.add_argument("--output", default=None,
                    help="manifest output dir (ONE-SHOT mode: single job, "
                         "range layout by default — measured 32%% smaller "
                         "output than hash on source-keyed ids; decodable "
                         "shuffle-free via decode_checkpoint)")
    ap.add_argument("--key-col", default="doc_id",
                    help="layout key; comma-separate for a COMPOSITE key "
                         "(e.g. 'tenant,doc_id' — canonical '#ck:' "
                         "sub-column derived at encode)")
    ap.add_argument("--weight-col", default=None,
                    help="byte-skew weight column (e.g. n_tok); requires "
                         "--partitioner weight")
    ap.add_argument("--partitioner", default=None,
                    choices=["hash", "range", "weight", "none"],
                    help="default: 'range' for one-shot --output (best "
                         "compression: clusters each chunk to one key "
                         "range/source), 'hash' for --checkpoint (resume-ONLY "
                         "layout: Spark's range sampler is nondeterministic "
                         "across runs, so only hash reproduces chunk "
                         "boundaries); 'none' trusts key-ordered ingest "
                         "(e.g. Iceberg sort-ordered writes) and skips the "
                         "shuffle entirely")
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
    if (args.checkpoint is None) == (args.output is None):
        ap.error("exactly one of --checkpoint (resumable) or --output "
                 "(one-shot) is required")
    if args.output and args.sub_jobs != 1:
        ap.error("--sub-jobs requires --checkpoint: one-shot --output is a "
                 "single all-or-nothing job with no crash granularity")
    if args.partitioner is None:
        args.partitioner = "hash" if args.checkpoint else "range"

    from pyspark.sql import SparkSession, functions as F

    from wills_columnar_format_spark.engine import (
        encode_table,
        encode_table_resumable,
        manifest_summary,
        write_checkpoint,
        write_checkpoint_schema,
    )
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
    key_col = (args.key_col.split(",") if "," in args.key_col
               else args.key_col)
    kw = dict(
        key_col=key_col,
        codec=args.codec,
        num_partitions=args.num_partitions,
        chunk_rows=args.chunk_rows,
        weight_col=args.weight_col,
        partitioner=args.partitioner,
        snapshot_id=args.snapshot_id or snap,
    )
    if args.checkpoint:
        manifest = encode_table_resumable(
            df, args.checkpoint, sub_jobs=args.sub_jobs, **kw
        )
        # self-describing: decode_checkpoint / compaction need no schema
        write_checkpoint_schema(args.checkpoint, df.schema)
    else:
        # one-shot: single all-or-nothing job, no resume state; the
        # written manifest stays chunk-clustered, so decode_checkpoint
        # reads it back without a shuffle — and carries its table schema
        write_checkpoint(encode_table(df, **kw), args.output, schema=df.schema)
        manifest = spark.read.parquet(args.output)
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
        "manifest_dir": args.checkpoint or args.output,
        "mode": "resumable" if args.checkpoint else "one-shot",
    }))


if __name__ == "__main__":
    main()
