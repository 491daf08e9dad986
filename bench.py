"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship metric is the engine's encode throughput (tokens/sec) over
the deterministic synthetic token table from BASELINE.json's
``input_hint`` — ``(doc_id string, tokens array<int32>, n_tok int32,
source string)`` — plus end-to-end timings of the registry's headline
queries on the sf testdata.

Modes:
  python bench.py                 # full bench, one JSON line to stdout
  python bench.py --encode-only   # just the token encode job (used by --scaling)
  python bench.py --scaling       # run encode at local[8] AND local[32] in
                                  # fresh subprocesses; report throughput at
                                  # both + scaling efficiency (north rule:
                                  # N vs 4N cores >= 0.8)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# best-of-N repetitions: the sandbox host is multi-tenant and identical
# runs vary up to 3x (BENCH.md) — nothing below n=3 is comparable
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# token-table size scales with the sf of the testdata dir
_SF_ROWS = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}
BENCH_ROOT = os.environ.get("SPARK_GRAFT_BENCH_TMP", "/tmp/spark_graft_bench")


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)) or "sf0.1"


def _token_table_path(sf_dir: str) -> tuple[str, int]:
    from wills_columnar_format_spark.data import ensure_token_table

    n_rows = _SF_ROWS.get(_sf_name(sf_dir), 200_000)
    path = os.path.join(BENCH_ROOT, f"tokens_{n_rows}")
    # 32 files, like a real multi-writer ingest: the partitioner='none'
    # path parallelizes at file granularity, so a single-file table would
    # bench the scan layout, not the engine
    ensure_token_table(path, n_rows, rows_per_file=max(1, n_rows // 32))
    return path, n_rows


def _spark(cores: int):
    from wills_columnar_format_spark.session import get_spark

    return get_spark(app="bench", cores=cores, shuffle_partitions=max(cores, 8))


def _best_of(run_once):
    """Time ``run_once`` REPS times: (best_sec, per_rep_samples,
    last_result). Best-of-N because the host is multi-tenant with a long
    variance tail (BENCH.md); the raw samples ship in the bench JSON so
    outliers are diagnosable without re-runs."""
    reps: list[float] = []
    result = None
    for _ in range(REPS):
        t0 = time.time()
        result = run_once()
        reps.append(round(time.time() - t0, 3))
    return min(reps), reps, result


def _warmup(spark, sf_dir: str) -> None:
    """Spin up python workers / JIT / shuffle infra outside the timed
    region (a long-lived cluster amortizes this; a fresh local JVM
    otherwise charges it all to the first query)."""
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import encode_table

    path, _ = _token_table_path(sf_dir)
    small = spark.read.parquet(path).limit(4000)
    encode_table(
        small, key_col="doc_id", codec="auto", num_partitions=8, partitioner="hash"
    ).agg(F.sum("bytes_out")).collect()


def run_encode(spark, sf_dir: str, num_partitions: int | None = None,
               partitioner: str = "hash") -> dict:
    """Encode the synthetic token table; returns throughput + size metrics.

    Timed section covers the one shuffle (deterministic hash bucketing on
    doc_id — the resume-safe partitioner) + sortWithinPartitions + the
    mapInArrow encode pass, forced to full materialization by aggregating
    the manifest's byte counters.
    """
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import encode_table

    path, n_rows = _token_table_path(sf_dir)
    df = spark.read.parquet(path)
    stats = df.agg(F.sum("n_tok").alias("t"), F.count("*").alias("n")).collect()[0]
    total_tokens, n = int(stats.t), int(stats.n)
    if num_partitions is None:
        # half the cores: this box's memory bus saturates at ~8 streams
        # (tools/membw_probe.py), and BIGGER chunks compress better
        # (dict_rank's dictionary amortizes over more values) — measured
        # 1.97 B/token at 64 parts vs 1.85-1.88 at 8-16 on the same data
        num_partitions = max(8, int(spark.sparkContext.defaultParallelism) // 2)

    def run_once():
        m = encode_table(
            df,
            key_col="doc_id",
            codec="auto",
            num_partitions=num_partitions,
            partitioner=partitioner,
            chunk_rows=65536,
        )
        return m.agg(
            F.sum("bytes_in").alias("bi"),
            F.sum("bytes_out").alias("bo"),
            F.count("*").alias("chunks"),
        ).collect()[0]

    dt, reps, agg = _best_of(run_once)
    tok_values_bytes = total_tokens * 4  # int32 payload
    return {
        "sec": round(dt, 3),
        "reps": reps,
        "rows": n,
        "tokens": total_tokens,
        "tokens_per_sec": round(total_tokens / dt, 1),
        "bytes_in": int(agg.bi),
        "bytes_out": int(agg.bo),
        "compressed_ratio": round(int(agg.bo) / max(int(agg.bi), 1), 4),
        "bytes_per_token": round(int(agg.bo) / max(total_tokens, 1), 4),
        "raw_token_bytes": tok_values_bytes,
        "manifest_rows": int(agg.chunks),
    }


def run_decode(spark, sf_dir: str) -> dict:
    """Encode once (cached manifest), then time decode-to-rows."""
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import decode_table, encode_table

    path, _ = _token_table_path(sf_dir)
    df = spark.read.parquet(path)
    # decode parallelism = manifest partitions: use full cores here (the
    # size-optimal encode config halves them for dictionary amortization,
    # but this bench measures DECODE throughput)
    m = encode_table(
        df, key_col="doc_id", codec="auto", num_partitions=CPUS,
        partitioner="hash", chunk_rows=65536,
    ).cache()
    m.count()  # materialize encode outside the timed region
    def run_once():
        dec = decode_table(m, df.schema, assume_unique=True, arranged=True)
        return dec.agg(F.count("*").alias("n"), F.sum("n_tok").alias("t")).collect()[0]

    dt, reps, out = _best_of(run_once)
    m.unpersist()
    return {"sec": round(dt, 3), "reps": reps, "rows": int(out.n),
            "tokens": int(out.t), "tokens_per_sec": round(int(out.t) / dt, 1)}


def run_decode_checkpoint(spark, sf_dir: str) -> dict:
    """Persist the manifest once, then time the SHUFFLE-FREE checkpoint
    decode (decode_checkpoint: one task per manifest file, pyarrow read,
    zero Exchange) — the persisted-read path a 100 TB consumer runs."""
    import shutil

    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import decode_checkpoint, encode_table

    path, _ = _token_table_path(sf_dir)
    df = spark.read.parquet(path)
    ckpt = os.path.join(BENCH_ROOT, "manifest_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)
    encode_table(
        df, key_col="doc_id", codec="auto", num_partitions=CPUS,
        partitioner="hash", chunk_rows=65536,
    ).write.parquet(ckpt)
    def run_once():
        dec = decode_checkpoint(spark, ckpt, df.schema)
        return dec.agg(F.count("*").alias("n"), F.sum("n_tok").alias("t")).collect()[0]

    dt, reps, out = _best_of(run_once)
    return {"sec": round(dt, 3), "reps": reps, "rows": int(out.n),
            "tokens": int(out.t), "tokens_per_sec": round(int(out.t) / dt, 1)}


def _registry_benches(spark, sf_dir: str):
    """Time headline registry queries end-to-end (materialized); returns
    (best_of_n, per_rep_samples) — the host is multi-tenant with a long
    variance tail, so the JSON carries every rep for outlier triage."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [
        "roundtrip_documents",
        "roundtrip_deleted",
        "roundtrip_upsert",
        "roundtrip_backfill",
        "roundtrip_lineitem",
        "roundtrip_events",
        "roundtrip_checkpoint",
        "point_lookup",
        "point_lookup_keys",
        "point_lookup_bloom",
        "value_range_scan",
        "value_range_multi",
        "value_range_string",
        "value_range_prefix",
        "roundtrip_struct",
        "value_range_struct",
        "value_range_zorder",
        "roundtrip_decimal",
        "time_travel",
        "optimize_roundtrip",
        "change_feed",
        "change_sync",
        "sequence_pack",
        "sequence_pack_tokens",
        "pipeline_train_data",
        "train_shuffle",
        "mixture_sample",
        "vocab_topk",
        "contamination_check",
        "decontam_ngram",
        "quality_repetition",
        "rle_run_counts",
        "stats_pushdown",
        "sum_pushdown",
        "ndv_estimate",
        "value_in_scan",
        "delete_where_in",
        "restore_snapshot",
        "clone_table",
        "roundtrip_map",
        "update_where",
        "drop_column",
        "asof_join_events",
        "interval_join_events",
        "time_rollup",
        "session_agg",
        "text_quality",
        "lang_id",
        "dedup_exact",
        "dedup_keep_best",
        "split_train_eval",
        "topk_per_group",
        "percentile_stats",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "cosine_topk",
        "tpch_q1",
        "tpch_q6",
        "nation_revenue",
        "events_top_type",
        "group_by_pushdown",
        "group_stats_pushdown",
        "colocated_join",
        "contains_token",
        "variance_pushdown",
        "dedup_incremental",
        "sql_scan",
        "quantile_bounds",
        "topk_scan",
        "topk_checkpoint",
        "count_pushdown",
        "sum_where_pushdown",
        "where_pushdown_checkpoint",
        "group_where_pushdown",
        "lang_slice_pushdown",
        "topk_where_scan",
        "topk_where_checkpoint",
        "stream_table_tail",
        "stream_cdf_tail",
        # round 5
        "merge_into",
        "merge_into_df",
        "point_lookup_composite",
        "roundtrip_list_struct",
        "multimodal_decode",
        "multimodal_resize",
        "multimodal_audio",
        "upsert_composite",
    ]
    out: dict[str, float] = {}
    rep_map: dict[str, list[float]] = {}
    for name in names:
        best, samples, n = _best_of(lambda: qs[name](spark, sf_dir).count())
        assert n >= 0
        out[name] = best
        rep_map[name] = samples
    return out, rep_map


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--encode-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--cores", type=int, default=CPUS)
    ap.add_argument("--scale-high", type=int, default=8,
                    help="high core count for --scaling (low is high//4)")
    ap.add_argument("--scale-rows", type=int, default=1_000_000,
                    help="token-table rows for --scaling (compute-dominated)")
    ap.add_argument("--scale-worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--sf-dir", default=SF_DIR)
    args = ap.parse_args()

    if args.scaling:
        # north rule: same job, same input, N vs 4N cores, fresh JVM each.
        # Default pair is 2 vs 8: tools/membw_probe.py shows this sandbox's
        # aggregate memory bandwidth saturates at ~8 concurrent numpy
        # streams, so 8-vs-32 measures the VM's memory subsystem, not the
        # job. Override with --scale-high for the saturated pair.
        res = {}
        hi = args.scale_high
        lo = max(1, hi // 4)
        for c in (lo, hi):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(c))
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--scale-worker",
                 "--cores", str(c), "--scale-rows", str(args.scale_rows)],
                capture_output=True, text=True, env=env,
            )
            lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if not lines:
                sys.stderr.write(p.stderr[-2000:])
                raise SystemExit(f"scale worker at {c} cores produced no JSON")
            res[c] = json.loads(lines[-1])
        tps_lo = res[lo]["tokens_per_sec"]
        tps_hi = res[hi]["tokens_per_sec"]
        eff = (tps_hi / tps_lo) / (hi / lo)
        # same-session machine ceiling: the multi-tenant host's bandwidth
        # envelope moves between sessions (measured 0.80 and 0.62 for the
        # 2->8 ceiling on different days), so the job's efficiency is
        # only interpretable against the ceiling measured NEXT TO it
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        from membw_probe import bandwidth_at

        # best-of-3 per leg: a single 3 s tenant spike during one probe
        # would otherwise distort the ceiling arbitrarily (observed: a
        # poisoned 2-core probe reporting a 17x "ceiling"); max estimates
        # the unloaded envelope, same convention as the job's min-time
        bw_lo = max(bandwidth_at(lo) for _ in range(3))
        bw_hi = max(bandwidth_at(hi) for _ in range(3))
        ceiling = (bw_hi / bw_lo) / (hi / lo)
        print(json.dumps({
            "metric": "encode_scaling_efficiency",
            "value": round(eff, 4),
            "unit": "ratio",
            "rows": args.scale_rows,
            "cores_low": lo, "cores_high": hi,
            "tokens_per_sec_low": tps_lo, "tokens_per_sec_high": tps_hi,
            "sec_low": res[lo]["sec"], "sec_high": res[hi]["sec"],
            "machine_bw_ceiling": round(ceiling, 4),
            "efficiency_vs_ceiling": round(min(eff / ceiling, 2.0), 4),
        }))
        return

    if args.scale_worker:
        # one parallelism level of the scaling pair: encode the 32-file
        # 1M-row token table (compute-dominated), best-of-2 after warmup
        from pyspark.sql import functions as F

        from wills_columnar_format_spark.data import ensure_token_table
        from wills_columnar_format_spark.engine import encode_table

        path = os.path.join(BENCH_ROOT, f"tokens_scale_{args.scale_rows}")
        # 32 files so the scan parallelizes at every core count tested
        ensure_token_table(path, args.scale_rows, rows_per_file=max(1, args.scale_rows // 32))
        spark = _spark(args.cores)
        try:
            df = spark.read.parquet(path)
            total_tokens = int(df.agg(F.sum("n_tok")).collect()[0][0])
            encode_table(df.limit(4000), key_col="doc_id", codec="auto",
                         num_partitions=8, partitioner="hash").agg(F.sum("bytes_out")).collect()
            # min-of-4: the sandbox host is multi-tenant and individual runs
            # vary up to 3x; the minimum estimates unloaded capability
            best = None
            for _ in range(4):
                t0 = time.time()
                encode_table(df, key_col="doc_id", codec="auto",
                             num_partitions=2 * args.cores, partitioner="hash",
                             chunk_rows=16384).agg(F.sum("bytes_out")).collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            print(json.dumps({"sec": round(best, 3), "tokens": total_tokens,
                              "tokens_per_sec": round(total_tokens / best, 1),
                              "cores": args.cores}))
        finally:
            spark.stop()
        return

    spark = _spark(args.cores)
    try:
        queries: dict[str, float] = {}
        reps: dict[str, list[float]] = {}
        _warmup(spark, args.sf_dir)
        enc = run_encode(spark, args.sf_dir)
        queries["encode_tokens"] = enc["sec"]
        reps["encode_tokens"] = enc["reps"]
        extra = {"encode": enc}
        if not args.encode_only:
            enc_ns = run_encode(spark, args.sf_dir, partitioner="none")
            queries["encode_tokens_noshuffle"] = enc_ns["sec"]
            reps["encode_tokens_noshuffle"] = enc_ns["reps"]
            extra["encode_noshuffle"] = enc_ns
            # range layout: doc_id embeds the source, so range partitioning
            # clusters each chunk to one source's vocabulary — the ONE-SHOT
            # DEFAULT layout (tools/submit_encode.py --output): measured 32%
            # smaller output than hash on this data. Hash is the
            # resume-only layout (deterministic chunk boundaries).
            enc_rg = run_encode(spark, args.sf_dir, partitioner="range")
            queries["encode_tokens_range"] = enc_rg["sec"]
            reps["encode_tokens_range"] = enc_rg["reps"]
            extra["encode_range"] = enc_rg
            dec = run_decode(spark, args.sf_dir)
            queries["decode_tokens"] = dec["sec"]
            reps["decode_tokens"] = dec["reps"]
            extra["decode"] = dec
            dec_ck = run_decode_checkpoint(spark, args.sf_dir)
            queries["decode_tokens_checkpoint"] = dec_ck["sec"]
            reps["decode_tokens_checkpoint"] = dec_ck["reps"]
            extra["decode_checkpoint"] = dec_ck
            rq, rreps = _registry_benches(spark, args.sf_dir)
            queries.update(rq)
            reps.update(rreps)
        total = round(sum(queries.values()), 3)
        # headline bytes/token reports the LAYOUT-APPROPRIATE number: the
        # one-shot default layout is range (submit_encode --output); hash
        # is the resume-only layout and is reported alongside. In
        # --encode-only mode only the hash encode ran, so the headline
        # and default_layout both say hash — never mix the two layouts'
        # numbers under one label across runs.
        rg_bpt = extra.get("encode_range", {}).get("bytes_per_token")
        print(json.dumps({
            "metric": "e2e_bench_total",
            # bench_schema 2: compressed_bytes_per_token became the
            # layout-appropriate (range) number in round 3 — it meant the
            # hash layout in schema-1 JSONs. Trend tooling must key on
            # the explicit _hash/_range fields when comparing across
            # schema versions.
            "bench_schema": 2,
            "value": total,
            "unit": "sec",
            "queries": queries,
            "reps": reps,
            "sf": _sf_name(args.sf_dir),
            "n": REPS,
            "cores": args.cores,
            "tokens_per_sec": enc["tokens_per_sec"],
            "compressed_bytes_per_token": (
                rg_bpt if rg_bpt is not None else enc["bytes_per_token"]
            ),
            "compressed_bytes_per_token_hash": enc["bytes_per_token"],
            "compressed_bytes_per_token_range": rg_bpt,
            "default_layout": "range" if rg_bpt is not None else "hash",
            **extra,
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
