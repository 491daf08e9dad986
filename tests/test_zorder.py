"""Z-order (Morton) clustering: ``encode_table(partitioner="zorder",
zorder_cols=[a, b, ...])`` lays chunks out along a bit-interleave of
2+ numeric/temporal columns, so per-chunk VALUE zone maps are locally
narrow on EVERY listed column and conjunctive ``value_range`` queries
prune on all of them — the multi-dimensional generalization of
sort-by-key (Delta/Iceberg OPTIMIZE ZORDER BY over chunk zone maps).

Pins: lossless roundtrip under the z layout; 2-D pruning beats the
1-D key-sorted layout on the off-key dimension AND stays useful on
both dimensions at once; the z expression is pure JVM (no UDF nodes
in the plan); bad inputs (one column, non-numeric) raise.
"""

import pytest
from pyspark.sql import Row, functions as F

from wills_columnar_format_spark.engine import (
    _conjunctive_hit_keys,
    _prepare_value_range,
    decode_table,
    encode_table,
)

N = 4_096
GRID = 64  # x, y in [0, 64): row i = (i % 64, (i * 37) % 64) — uniform 2-D


@pytest.fixture(scope="module")
def grid_df(spark):
    rows = [Row(k=i, x=i % GRID, y=(i * 37) % GRID, payload=float(i))
            for i in range(N)]
    return spark.createDataFrame(rows).repartition(8)


def _hit_chunks(m, out_schema, specs):
    vrs = [_prepare_value_range(out_schema, s) for s in specs]
    return _conjunctive_hit_keys(m, vrs).count()


def test_zorder_roundtrip(spark, grid_df):
    m = encode_table(grid_df, key_col="k", partitioner="zorder",
                     zorder_cols=["x", "y"], num_partitions=4,
                     chunk_rows=256)
    dec = decode_table(m, grid_df.schema)
    assert dec.count() == N
    assert dec.exceptAll(grid_df).count() == 0


def test_zorder_prunes_both_dimensions(spark, grid_df):
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    schema = to_arrow_schema(grid_df.schema)
    mz = encode_table(grid_df, key_col="k", partitioner="zorder",
                      zorder_cols=["x", "y"], num_partitions=4,
                      chunk_rows=256).localCheckpoint(eager=True)
    mk = encode_table(grid_df, key_col="k", partitioner="range",
                      num_partitions=4,
                      chunk_rows=256).localCheckpoint(eager=True)
    # range partitions are row-approximate, so chunk counts may differ
    # by a few short tails between the two layouts
    nz = mz.select("chunk_key").distinct().count()
    nk = mk.select("chunk_key").distinct().count()
    assert N // 256 <= min(nz, nk) and max(nz, nk) <= N // 256 + 8

    # a narrow band on x alone: the key-sorted layout keeps (nearly)
    # every chunk — x cycles mod 64, so every FULL 256-row chunk spans
    # all of x; short partition-tail chunks may dodge the band
    x_band = [("x", 8, 15)]
    assert _hit_chunks(mk, schema, x_band) >= nk - 4
    assert _hit_chunks(mz, schema, x_band) <= nz // 2

    # the 2-D box prunes harder than either 1-D band under z
    box = [("x", 8, 15), ("y", 8, 15)]
    assert _hit_chunks(mz, schema, box) <= _hit_chunks(mz, schema, x_band)
    assert _hit_chunks(mz, schema, box) <= nz // 4

    # and the answers agree with the source on both layouts
    for m in (mz, mk):
        out = decode_table(m, grid_df.schema,
                           value_range=[("x", 8, 15), ("y", 8, 15)])
        want = grid_df.filter(F.col("x").between(8, 15)
                              & F.col("y").between(8, 15))
        assert out.count() == want.count()
        assert out.exceptAll(want).count() == 0


def test_zorder_plan_is_jvm_side(spark, grid_df):
    from wills_columnar_format_spark.engine import zorder_expr

    z = grid_df.withColumn("__z", zorder_expr(grid_df, ["x", "y"]))
    plan = z._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zorder_locality(spark, grid_df):
    """Adjacent z-values are spatially adjacent: decode one chunk's worth
    of z-sorted rows and check its x/y spread is a small box, not the
    full grid."""
    m = encode_table(grid_df, key_col="k", partitioner="zorder",
                     zorder_cols=["x", "y"], num_partitions=1,
                     chunk_rows=256).localCheckpoint(eager=True)
    spans = (
        m.filter(F.col("column") == "x")
        .select((F.col("val_max") - F.col("val_min")).alias("dx"))
        .agg(F.avg("dx")).first()[0]
    )
    # 256 of 4096 rows = 1/16 of the grid; a z-chunk's x-span should be
    # far below the full 63 range (empirically ~15-24 on this grid)
    assert spans < 32


def test_zorder_bad_inputs(spark, grid_df):
    with pytest.raises(ValueError, match=">= 2"):
        encode_table(grid_df, key_col="k", partitioner="zorder",
                     zorder_cols=["x"], num_partitions=2)
    with pytest.raises(ValueError, match="zorder_cols"):
        encode_table(grid_df, key_col="k", partitioner="zorder",
                     num_partitions=2)
    bad = grid_df.withColumn("s", F.lit("a"))
    with pytest.raises(Exception):
        encode_table(bad, key_col="k", partitioner="zorder",
                     zorder_cols=["x", "s"], num_partitions=2).collect()


def test_zorder_nulls_refused(spark, grid_df):
    """Spark's least()/greatest() SKIP nulls, so a NULL zorder cell
    would silently cluster into the max corner of the z-space — the
    guard must raise instead, even when only SOME rows are null."""
    holey = grid_df.withColumn(
        "y", F.when(F.col("k") % 100 == 0, None).otherwise(F.col("y")))
    with pytest.raises(TypeError, match="NULL"):
        encode_table(holey, key_col="k", partitioner="zorder",
                     zorder_cols=["x", "y"], num_partitions=2).collect()
