"""Iceberg integration: snapshot-id lineage through load_table ->
encode_table. Skips cleanly where no Iceberg runtime jars exist (this
sandbox); runs for real on any cluster that ships
iceberg-spark-runtime-*.jar (the north rule's target source)."""

import glob
import os

import pytest


def _iceberg_available() -> bool:
    import pyspark

    roots = [
        os.path.join(os.path.dirname(pyspark.__file__), "jars"),
        "/opt/spark/jars",
    ]
    sh = os.environ.get("SPARK_HOME")
    if sh:
        roots.append(os.path.join(sh, "jars"))
    return any(glob.glob(os.path.join(r, "*iceberg-spark-runtime*")) for r in roots)


@pytest.mark.skipif(
    not _iceberg_available(), reason="no iceberg-spark-runtime jar in this environment"
)
def test_iceberg_snapshot_lineage(spark, tmp_path):
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.engine import encode_table
    from wills_columnar_format_spark.sources import load_table

    spark.conf.set("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", str(tmp_path / "wh"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ice.db")
    spark.sql(
        "CREATE TABLE ice.db.tok (doc_id BIGINT, n_tok INT, source STRING) USING iceberg"
    )
    spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100).cast("int").alias("n_tok"),
        F.lit("web").alias("source"),
    ).writeTo("ice.db.tok").append()

    df, snap, kind = load_table(spark, "ice.db.tok")
    assert kind == "iceberg"
    assert snap is not None and snap.isdigit()
    assert df.count() == 1000

    # every manifest row pins the input snapshot (resume identity)
    m = encode_table(df, key_col="doc_id", num_partitions=2, snapshot_id=snap)
    snaps = {r.snapshot_id for r in m.select("snapshot_id").distinct().collect()}
    assert snaps == {snap}

    # a second append moves the snapshot — load_table must see the new id
    spark.range(1000, 1100).select(
        F.col("id").alias("doc_id"),
        F.lit(5).cast("int").alias("n_tok"),
        F.lit("web").alias("source"),
    ).writeTo("ice.db.tok").append()
    _, snap2, _ = load_table(spark, "ice.db.tok")
    assert snap2 is not None and snap2 != snap
