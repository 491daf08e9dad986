"""submit_encode CLI: one-shot vs resumable modes and their layout
defaults (range = one-shot compression layout, hash = resume-only)."""

import importlib.util
import json
import os
import sys

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.data import ensure_token_table


def _load_cli():
    path = os.path.join(os.path.dirname(__file__), "..", "tools", "submit_encode.py")
    spec = importlib.util.spec_from_file_location("submit_encode_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def token_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tok_cli") / "t")
    ensure_token_table(path, 3_000, seed=5)
    return path


def test_one_shot_mode(spark, token_path, tmp_path, capsys, monkeypatch):
    from wills_columnar_format_spark.engine import decode_checkpoint

    out_dir = str(tmp_path / "m")
    cli = _load_cli()
    monkeypatch.setattr(sys, "argv", [
        "submit_encode", "--input", token_path, "--output", out_dir,
        "--chunk-rows", "1024", "--num-partitions", "4",
    ])
    cli.main()
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["mode"] == "one-shot"
    assert res["manifest_dir"] == out_dir
    # the one-shot manifest decodes back shuffle-free and lossless
    df = spark.read.parquet(token_path)
    dec = decode_checkpoint(spark, out_dir, df.schema)
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    bad = (dec.alias("d").join(df.alias("o"), "doc_id")
           .filter(~(F.col("d.tokens") == F.col("o.tokens"))).count())
    assert bad == 0 and dec.count() == 3_000


def test_mode_exclusivity(token_path, tmp_path, monkeypatch):
    cli = _load_cli()
    monkeypatch.setattr(sys, "argv", ["submit_encode", "--input", token_path])
    with pytest.raises(SystemExit):
        cli.main()
    monkeypatch.setattr(sys, "argv", [
        "submit_encode", "--input", token_path,
        "--output", str(tmp_path / "a"), "--checkpoint", str(tmp_path / "b"),
    ])
    with pytest.raises(SystemExit):
        cli.main()


def _load_compact_cli():
    path = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "compact_manifest.py")
    spec = importlib.util.spec_from_file_location("compact_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_compact_cli_rechunk_via_sidecar(spark, token_path, tmp_path, capsys,
                                         monkeypatch):
    """The compaction CLI rechunks a self-describing checkpoint without
    any schema flag (sidecar written by the encode CLI) and the result
    decodes schema-free and lossless. (The bytes ratio is asserted in
    the ENGINE test on data where amortization dominates — at this
    3k-row fixture size, source-pure small chunks can legitimately beat
    mixed big chunks, so the CLI test pins the contract, not the
    ratio.)"""
    from wills_columnar_format_spark.engine import decode_checkpoint

    src = str(tmp_path / "src")
    cli = _load_cli()
    monkeypatch.setattr(sys, "argv", [
        "submit_encode", "--input", token_path, "--output", src,
        "--chunk-rows", "256", "--num-partitions", "4",
        "--partitioner", "hash",
    ])
    cli.main()
    dst = str(tmp_path / "dst")
    ccli = _load_compact_cli()
    monkeypatch.setattr(sys, "argv", [
        "compact_manifest", "--src", src, "--dst", dst,
        "--rechunk-rows", "65536", "--key-col", "doc_id",
        "--num-partitions", "2", "--partitioner", "hash",
    ])
    ccli.main()
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["mode"] == "rechunk" and rep["bytes_ratio"] > 0
    assert rep["dst_rows"] < rep["src_rows"]  # fewer, bigger chunks
    # decodes without a schema argument, lossless vs the source table
    dec = decode_checkpoint(spark, dst)
    src_df = spark.read.parquet(token_path)
    assert dec.count() == src_df.count()
    joined = dec.select("doc_id", F.col("tokens").alias("d")).join(
        src_df.select("doc_id", F.col("tokens").alias("o")), "doc_id")
    assert joined.filter(F.col("d") != F.col("o")).count() == 0


def test_compact_cli_metadata_mode(spark, token_path, tmp_path, capsys,
                                   monkeypatch):
    from wills_columnar_format_spark.engine import (
        decode_checkpoint, encode_table, write_checkpoint)

    df = spark.read.parquet(token_path)
    src = str(tmp_path / "src")
    m = encode_table(df, key_col="doc_id", num_partitions=2, chunk_rows=512,
                     partitioner="hash").localCheckpoint(eager=True)
    write_checkpoint(m, src, schema=df.schema)
    write_checkpoint(m, src, schema=df.schema, mode="append")  # replay dup
    dst = str(tmp_path / "dst")
    ccli = _load_compact_cli()
    monkeypatch.setattr(sys, "argv", [
        "compact_manifest", "--src", src, "--dst", dst,
    ])
    ccli.main()
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["mode"] == "metadata"
    assert rep["dst_rows"] == rep["src_rows"] // 2  # dups collapsed
    assert decode_checkpoint(spark, dst).count() == df.count()
