"""IN-list predicate pushdown (``value_in=(column, [v1, v2, ...])``).

The disjunctive sibling of ``value_range``: chunks whose value zone
maps admit ANY of the values are decoded (one blob-free metadata pass,
OR across values), rows exact-filtered to the set afterwards. Shares
``_prepare_value_range``'s type rules — strings, numerics, temporals
(NTZ-safe literals), decimals. Pins: equality with the relational
isin filter on both decode paths; the prune actually prunes on
clustered data; AND-composition with value_range; zero-Exchange
checkpoint decode incl. the empty-intersection early return; empty
value lists refused loudly; legacy manifests (no zone maps) still
correct via the exact filter.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.engine import (
    _disjunctive_hit_keys,
    _prepare_value_in,
    decode_checkpoint,
    decode_table,
    encode_table,
    write_checkpoint,
)


@pytest.fixture(scope="module")
def docs(spark):
    # lang clusters with doc_id (sorted ingest): the IN prune has
    # something to cut
    return spark.createDataFrame(
        [(i, f"lang{i // 100}", f"text {i}", (i * 7) % 500,
          datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i // 50))
         for i in range(600)],
        "doc_id long, lang string, text string, n_chars long, ts timestamp_ntz",
    )


@pytest.fixture(scope="module")
def manifest(docs):
    return encode_table(docs, key_col="doc_id", num_partitions=2,
                        chunk_rows=64).localCheckpoint(eager=True)


def test_string_in(spark, docs, manifest):
    got = decode_table(manifest, docs.schema,
                       value_in=("lang", ["lang1", "lang4"]))
    want = docs.filter(F.col("lang").isin("lang1", "lang4"))
    assert got.count() == want.count() == 200
    assert got.exceptAll(want).count() == 0


def test_numeric_in(spark, docs, manifest):
    vals = [0, 7, 493]
    got = decode_table(manifest, docs.schema, value_in=("n_chars", vals))
    want = docs.filter(F.col("n_chars").isin(vals))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_temporal_in(spark, docs, manifest):
    vals = [datetime.datetime(2024, 1, 1, 2),
            datetime.datetime(2024, 1, 1, 9)]
    got = decode_table(manifest, docs.schema, value_in=("ts", vals))
    want = docs.filter(F.col("ts").isin(vals))
    assert got.count() == want.count() == 100
    assert got.exceptAll(want).count() == 0


def test_in_prunes_chunks(spark, docs, manifest):
    """On lang-clustered data the disjunctive zone test keeps only the
    chunks whose [min,max] admits a requested value."""
    from pyspark.sql.pandas.types import to_arrow_schema

    in_vrs, _ = _prepare_value_in(to_arrow_schema(docs.schema),
                                  ("lang", ["lang0"]))
    hit = _disjunctive_hit_keys(manifest, in_vrs).count()
    total = manifest.filter("column = 'lang'").count()
    assert 0 < hit < total / 2  # lang0 = 1/6 of rows


def test_and_composes_with_value_range(spark, docs, manifest):
    got = decode_table(manifest, docs.schema,
                       value_in=("lang", ["lang1", "lang2"]),
                       value_range=("doc_id", 150, 250))
    want = docs.filter(F.col("lang").isin("lang1", "lang2")
                       & F.col("doc_id").between(150, 250))
    assert got.count() == want.count() == 101
    assert got.exceptAll(want).count() == 0


def test_checkpoint_in_no_exchange(spark, docs, manifest, tmp_path):
    ckpt = str(tmp_path / "m")
    write_checkpoint(manifest, ckpt, schema=docs.schema)
    got = decode_checkpoint(spark, ckpt, value_in=("lang", ["lang3"]))
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    want = docs.filter(F.col("lang") == "lang3")
    assert got.count() == want.count() == 100
    assert got.exceptAll(want).count() == 0
    # empty zone intersection returns empty without reading any file
    assert decode_checkpoint(spark, ckpt,
                             value_in=("lang", ["nope"])).count() == 0


def test_empty_list_refused(spark, docs, manifest):
    with pytest.raises(ValueError, match="empty value list"):
        decode_table(manifest, docs.schema, value_in=("lang", []))


def test_legacy_manifest_no_zone_maps(spark, docs, manifest):
    """Manifests written before value zone maps existed: no pruning,
    but the exact filter still lands the right rows."""
    legacy = manifest.drop("val_min", "val_max",
                           "val_min_str", "val_max_str")
    got = decode_table(legacy, docs.schema,
                       value_in=("lang", ["lang2"]))
    assert got.count() == 100
