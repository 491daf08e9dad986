"""Map columns: shredded to ``name#lengths`` + recursive ``name#mk`` /
``name#mv`` sub-column trees (the list<struct<key,value>> a map
physically is), regrouped losslessly on decode.

The reference format is flat scalars only (src/lib.rs:59-66); maps are
an engine EXTENSION in the same spirit as lists (#lengths/#values),
structs (#f:) and nullables (#valid): keys and values are ordinary flat
sub-columns with their own codec choice, checksum, and value zone map,
so checkpoint decode and checksum verification compose for free. Keys
are non-null by Arrow spec; null VALUES ride ``#mv#valid``. These pin:

* lossless roundtrip of string->long, long->double, and
  string->timestamp_ntz maps, including empty maps;
* nullable roundtrip (null map slots AND null values) under
  allow_nulls=True; rejection without it;
* projection decode of the map column only;
* zero-Exchange decode_checkpoint with checksum verification on.
"""

import datetime

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from wills_columnar_format_spark.engine import (
    decode_checkpoint,
    decode_table,
    encode_table,
)

N = 600


@pytest.fixture(scope="module")
def map_df(spark):
    rows = [
        Row(
            doc_id=i,
            tags={f"k{j}": i * 100 + j for j in range(i % 4)},  # 0..3 entries
            scores={i % 7: float(i) / 3.0, 1000 + i % 3: -1.5},
            seen={"first": datetime.datetime(2024, 1, 1)
                  + datetime.timedelta(minutes=i)},
        )
        for i in range(N)
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.LongType()), False),
        T.StructField("scores", T.MapType(T.LongType(), T.DoubleType()), False),
        T.StructField("seen", T.MapType(T.StringType(), T.TimestampNTZType()),
                      False),
    ])
    return spark.createDataFrame(rows, schema).repartition(4, "doc_id")


def _as_dicts(df):
    return {r["doc_id"]: (dict(r["tags"]), dict(r["scores"]),
                          dict(r["seen"])) for r in df.collect()}


def test_map_roundtrip(spark, map_df):
    man = encode_table(map_df, key_col="doc_id", num_partitions=4,
                       chunk_rows=128)
    cols = {r["column"] for r in man.select("column").distinct().collect()}
    assert {"doc_id", "tags#lengths", "tags#mk", "tags#mv",
            "scores#lengths", "scores#mk", "scores#mv",
            "seen#lengths", "seen#mk", "seen#mv"} <= cols
    dec = decode_table(man, map_df.schema)
    assert _as_dicts(dec) == _as_dicts(map_df)


def test_map_nullable_roundtrip(spark):
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("m", T.MapType(T.StringType(), T.LongType(),
                                     valueContainsNull=True), True),
    ])
    rows = [
        Row(k=i,
            m=None if i % 5 == 0 else
            {"a": None if i % 3 == 0 else i * 10,
             f"b{i % 2}": i})
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, schema).repartition(2, "k")
    man = encode_table(df, key_col="k", num_partitions=2, chunk_rows=64,
                       allow_nulls=True)
    dec = decode_table(man, schema)
    got = {r["k"]: (None if r["m"] is None else dict(r["m"]))
           for r in dec.collect()}
    want = {r["k"]: (None if r["m"] is None else dict(r["m"]))
            for r in df.collect()}
    assert got == want


def test_map_null_rejected_by_default(spark):
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("m", T.MapType(T.StringType(), T.LongType()), True),
    ])
    df = spark.createDataFrame([Row(k=1, m=None), Row(k=2, m={"a": 3})],
                               schema)
    man = encode_table(df, key_col="k", num_partitions=1)
    with pytest.raises(Exception) as ei:
        man.collect()
    assert "allow_nulls" in str(ei.value)


def test_map_projection_decodes_only_map(spark, map_df):
    man = encode_table(map_df, key_col="doc_id", num_partitions=2,
                       chunk_rows=128)
    dec = decode_table(man, map_df.schema, columns=["tags"])
    assert dec.columns == ["tags"]
    assert dec.count() == N
    # total entries across the table: sum of i % 4
    assert dec.select(F.sum(F.size("tags"))).first()[0] == \
        sum(i % 4 for i in range(N))


def test_map_checkpoint_no_exchange_verified(spark, map_df, tmp_path):
    path = str(tmp_path / "m")
    encode_table(map_df, key_col="doc_id", num_partitions=2,
                 chunk_rows=128).write.parquet(path)
    dec = decode_checkpoint(spark, path, map_df.schema,
                            verify_checksums=True)
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert dec.count() == N
    assert _as_dicts(dec) == _as_dicts(map_df)
