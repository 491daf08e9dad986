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


# -- bloom-refined IN prune (value_blooms=True manifests) --------------------


@pytest.fixture(scope="module")
def bloom_manifest(spark, docs):
    # HASH layout: every chunk spans the full lang/n_chars range, so
    # zone maps alone keep everything — the value blooms carry the prune
    m = encode_table(docs, key_col="doc_id", codec="auto",
                     num_partitions=4, partitioner="hash", chunk_rows=32,
                     value_blooms=True)
    return m.localCheckpoint(eager=True)


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_bloom_in_exact_string(spark, docs, bloom_manifest):
    got = decode_table(bloom_manifest, docs.schema,
                       value_in=("lang", ["lang1", "lang3"]))
    assert _ids(got) == _ids(docs.filter(F.col("lang").isin("lang1",
                                                            "lang3")))


def test_bloom_in_exact_numeric_and_temporal(spark, docs, bloom_manifest):
    got = decode_table(bloom_manifest, docs.schema,
                       value_in=("n_chars", [7, 141]))
    assert _ids(got) == _ids(docs.filter(F.col("n_chars").isin(7, 141)))
    probes = [datetime.datetime(2024, 1, 1, 3)]
    got = decode_table(bloom_manifest, docs.schema,
                       value_in=("ts", probes))
    assert _ids(got) == _ids(docs.filter(F.col("ts").isin(probes)))


def test_bloom_in_prunes_hash_layout(spark, docs, bloom_manifest):
    # a value present in exactly one source chunk: blooms prune most
    # chunks where zone maps keep all (hash layout, wide zones)
    from wills_columnar_format_spark.engine import (_bloom_probe_values,
                                                    _contains_hit_keys,
                                                    _disjunctive_hit_keys,
                                                    _prepare_value_in)
    from pyspark.sql.pandas.types import to_arrow_schema

    vals = ["lang5"]
    sch = to_arrow_schema(docs.schema)
    in_vrs, _ = _prepare_value_in(sch, ("lang", vals))
    zone_only = _disjunctive_hit_keys(bloom_manifest, in_vrs).count()
    pb = _bloom_probe_values(vals)
    bloomed = _contains_hit_keys(bloom_manifest, "lang", pb[0],
                                 pb[1]).count()
    total = bloom_manifest.filter(F.col("column") == "lang").count()
    # sort-within-partition keeps lang locally narrow even on the hash
    # layout, so zones prune some — blooms must refine further, never
    # widen (zone AND membership)
    assert bloomed <= zone_only < total
    assert bloomed < total
    got = decode_table(bloom_manifest, docs.schema,
                       value_in=("lang", vals))
    assert _ids(got) == _ids(docs.filter(F.col("lang") == "lang5"))


def test_bloom_in_checkpoint_path(spark, docs, bloom_manifest, tmp_path):
    ckpt = str(tmp_path / "m")
    write_checkpoint(bloom_manifest, ckpt, schema=docs.schema)
    got = decode_checkpoint(spark, ckpt, docs.schema,
                            value_in=("lang", ["lang2"]))
    assert _ids(got) == _ids(docs.filter(F.col("lang") == "lang2"))


def test_bloom_probe_canonicalization_rules():
    import decimal

    import numpy as np

    from wills_columnar_format_spark.engine import _bloom_probe_values

    p, is_str = _bloom_probe_values(["a", "b"])
    assert is_str and p.dtype == object
    p, is_str = _bloom_probe_values([1, 2.5])
    assert not is_str and p.dtype == np.float64
    assert _bloom_probe_values([decimal.Decimal("1.5")]) is None  # widened
    assert _bloom_probe_values([True]) is None
    assert _bloom_probe_values([float("nan")]) is None
    assert _bloom_probe_values([1, "a"]) is None
    p, _ = _bloom_probe_values([datetime.datetime(2024, 1, 1, 3)])
    assert p[0] == (datetime.datetime(2024, 1, 1, 3)
                    - datetime.datetime(1970, 1, 1)).total_seconds() * 1e6
    p, _ = _bloom_probe_values([datetime.date(1970, 1, 11)])
    assert p[0] == 10.0


def test_bloom_in_decimal_falls_back(spark):
    import decimal

    rows = [(i, decimal.Decimal(i) / 4) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, d decimal(10,2)")
    m = encode_table(df, key_col="id", num_partitions=2, chunk_rows=32,
                     value_blooms=True).localCheckpoint(eager=True)
    probes = [decimal.Decimal("12.25"), decimal.Decimal("31.50")]
    got = decode_table(m, df.schema, value_in=("d", probes))
    exp = sorted(r["id"] for r in df.filter(F.col("d").isin(probes)).collect())
    assert sorted(r["id"] for r in got.select("id").collect()) == exp and exp
