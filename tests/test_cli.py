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
