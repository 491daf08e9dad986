"""spark-submit entry point for checkpoint compaction — the nightly
maintenance job of a streaming/resumed manifest.

Two modes, mirroring ``engine.compact_checkpoint``:

* metadata rewrite (default): ONE shuffle restores the clustered layout
  (duplicates from replays collapsed, torn chunks regrouped, done
  markers stripped) so every later ``decode_checkpoint`` is
  shuffle-free.
* ``--rechunk-rows N``: decode + re-encode at big chunks, recovering
  the compression that streaming's small micro-batch chunks lose
  (dictionary/rANS table amortization). Needs the table schema: read
  from the checkpoint's ``_table_schema`` sidecar when present
  (self-describing checkpoints — ``write_checkpoint`` / the encode CLI
  write it), else ``--schema-from <parquet>``.

    spark-submit --py-files /tmp/wcfs.zip tools/compact_manifest.py \
        --src /data/manifest --dst /data/manifest_c \
        --rechunk-rows 65536 --key-col doc_id
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
    ap.add_argument("--src", required=True, help="checkpoint manifest dir to compact")
    ap.add_argument("--dst", required=True, help="output dir (must not exist)")
    ap.add_argument("--num-files", type=int, default=None,
                    help="output file count (metadata mode; default = parallelism)")
    ap.add_argument("--rechunk-rows", type=int, default=None,
                    help="re-encoding compaction at this chunk size "
                         "(full decode+encode instead of the metadata shuffle)")
    ap.add_argument("--key-col", default="doc_id")
    ap.add_argument("--codec", default="auto")
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--partitioner", default=None,
                    choices=["hash", "range", "weight", "none"],
                    help="rechunk layout (default: encode_table's range)")
    ap.add_argument("--schema-from", default=None,
                    help="parquet path whose schema describes the decoded table "
                         "(only needed when the src checkpoint has no "
                         "_table_schema sidecar)")
    ap.add_argument("--cores", type=int, default=None,
                    help="local mode cores (standalone runs)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from wills_columnar_format_spark.engine import compact_checkpoint
    from wills_columnar_format_spark.session import get_spark, ship_package

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
        ship_package(spark)
    else:
        spark = get_spark(app="wcfs-compact", cores=args.cores)

    schema = None
    if args.schema_from is not None:
        schema = spark.read.parquet(args.schema_from).schema
    t0 = time.time()
    compact_checkpoint(
        spark, args.src, args.dst,
        num_files=args.num_files, rechunk_rows=args.rechunk_rows,
        schema=schema, key_col=args.key_col, codec=args.codec,
        num_partitions=args.num_partitions, partitioner=args.partitioner,
    )

    def _bytes(d):
        m = spark.read.parquet(d)
        r = m.filter(F.col("column") != "__done__").agg(
            F.count("*").alias("rows"), F.sum(F.length("blob")).alias("b")
        ).collect()[0]
        return int(r["rows"]), int(r["b"] or 0)

    sr, sb = _bytes(args.src)
    dr, db = _bytes(args.dst)
    print(json.dumps({
        "sec": round(time.time() - t0, 2),
        "mode": "rechunk" if args.rechunk_rows else "metadata",
        "src_rows": sr, "dst_rows": dr,
        "src_blob_bytes": sb, "dst_blob_bytes": db,
        "bytes_ratio": round(db / max(sb, 1), 4),
        "dst": args.dst,
    }))


if __name__ == "__main__":
    main()
