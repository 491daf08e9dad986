"""explain_where: the blob-free pushdown plan report — per-class
chunk/row/byte routing that mirrors the hybrid predicate family's
decisions without running the query (engine.explain_where)."""


def test_explain_where_routes_and_sizes(spark):
    # the plan report mirrors count_where's routing: on a value-
    # clustered encode a mid-band predicate yields in+out+dec whose
    # rows reconcile with the table, and 'dec' bytes are a strict
    # subset of the total compressed volume
    import pyarrow as pa
    from pyspark.sql import functions as F

    from wills_columnar_format_spark import data
    from wills_columnar_format_spark.engine import (
        count_where, encode_table, explain_where)

    t = data.token_table_arrow(4000, seed=17)
    df = spark.createDataFrame(t.to_pandas()).localCheckpoint(eager=True)
    clustered = (df.repartitionByRange(4, "n_tok")
                 .sortWithinPartitions("n_tok"))
    m = encode_table(clustered, key_col="doc_id", codec="auto",
                     partitioner="none", chunk_rows=256,
                     histograms=True).localCheckpoint(eager=True)
    lo, hi = 120, 200
    rep = {r["cls"]: r for r in
           explain_where(m, df.schema, where=("n_tok", lo, hi)).collect()}
    assert set(rep) <= {"in", "out", "dec"} and "out" in rep
    # every chunk classified exactly once; rows reconcile to the table
    assert sum(r["n_chunks"] for r in rep.values()) \
        == m.select("chunk_key").distinct().count()
    assert sum(r["n_rows"] for r in rep.values()) == df.count()
    # 'in' rows alone can never exceed the true predicate count, and
    # in + dec must cover it (out contributes nothing)
    true_n = df.filter(F.col("n_tok").between(lo, hi)).count()
    n_in = rep.get("in", {"n_rows": 0})["n_rows"] if "in" in rep else 0
    n_dec = rep["dec"]["n_rows"] if "dec" in rep else 0
    assert n_in <= true_n <= n_in + n_dec
    # report agrees with the real query
    assert count_where(m, df.schema, where=("n_tok", lo, hi)) \
        .collect()[0]["n_rows"] == true_n
    # bytes: dec strictly below total (the clustered layout prunes)
    total = sum(r["bytes_out"] for r in rep.values())
    assert 0 < rep["dec"]["bytes_out"] < total if "dec" in rep else True
    # unsatisfiable range: everything 'out', zero rows to read
    rep2 = explain_where(m, df.schema, where=("n_tok", 10, 5)).collect()
    assert [r["cls"] for r in rep2] == ["out"]
    assert rep2[0]["n_rows"] == 0
