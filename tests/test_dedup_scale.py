"""Hot-band capping in MinHash LSH: a degenerate band (thousands of
identical boilerplate docs sharing every signature) must not trigger the
quadratic band self-join — docs route to the fingerprint star fallback,
linear in group size."""

import time

from pyspark.sql import functions as F

from wills_columnar_format_spark.operators.dedup import minhash_lsh_pairs


def test_hot_band_star_fallback(spark):
    n_hot = 10_000
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    hot = spark.range(n_hot).select(
        F.col("id").alias("doc_id"), F.lit(boiler).alias("text")
    )
    # distinct background docs: unique word soup, no cross-pairs
    bg = spark.range(n_hot, n_hot + 500).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(f"w{j}x"), F.col("id")) for j in range(12)],
        ).alias("text"),
    )
    docs = hot.unionAll(bg)

    t0 = time.time()
    pairs = minhash_lsh_pairs(spark, docs, band_cap=64)
    rows = pairs.count()
    elapsed = time.time() - t0

    # star fallback: every identical doc pairs with the group min (doc 0)
    # exactly once -> n_hot - 1 pairs, NOT the quadratic n_hot*(n_hot-1)/2
    assert rows == n_hot - 1
    star = pairs.filter(F.col("d1") == 0)
    assert star.count() == n_hot - 1
    assert pairs.agg(F.min("jaccard")).collect()[0][0] == 1.0
    # linear-path sanity: the capped run must finish far below any
    # all-pairs regime (50M candidate pairs would take minutes-hours)
    assert elapsed < 120


def test_cold_bands_unaffected_by_cap(spark):
    """A cap that no band exceeds must leave results identical to an
    effectively-uncapped run — tested with a cap ADJACENT to the actual
    max band population, so boundary mis-filtering would be caught."""
    from wills_columnar_format_spark.operators.dedup import GRAMS_SQL, MINS_SQL

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                (F.col("id") % 7).cast("string"),
                *[F.concat(F.lit(f"tok{j}m"), (F.col("id") % 7)) for j in range(10)],
            ],
        ).alias("text"),
    )
    # measure the true max band population (identical docs share bands:
    # ~200/7 ≈ 29 per group) and pick the cap just above it
    docs.createOrReplaceTempView("mh_docs")
    spark.sql(GRAMS_SQL.format(docs="mh_docs")).createOrReplaceTempView("mh_grams")
    spark.sql(MINS_SQL.format(grams="mh_grams")).createOrReplaceTempView("mh_mins")
    from wills_columnar_format_spark.operators import dedup as D

    max_band = spark.sql(
        f"WITH mins AS (SELECT * FROM mh_mins), "
        f"bands AS (SELECT doc_id, concat(band, ':', sig) AS sig FROM mins "
        f"LATERAL VIEW stack(16, {D._MH_STACK}) s AS band, sig) "
        "SELECT MAX(cnt) AS m FROM (SELECT sig, COUNT(*) AS cnt FROM bands GROUP BY sig)"
    ).collect()[0].m
    assert 20 <= max_band <= 40  # the boundary cap below is genuinely adjacent

    boundary_cap = minhash_lsh_pairs(spark, docs, band_cap=max_band).orderBy("d1", "d2")
    uncapped = minhash_lsh_pairs(spark, docs, band_cap=10_000_000).orderBy("d1", "d2")
    assert [r.asDict() for r in boundary_cap.collect()] == [
        r.asDict() for r in uncapped.collect()
    ]
    # docs sharing id%7 are identical -> pairs exist
    assert uncapped.count() > 0


def test_embedding_hot_bucket_star_fallback(spark):
    """Embedding sign-LSH: thousands of identical vectors saturate every
    band bucket; over the cap they must route to the identical-vector
    star fallback instead of the quadratic in-bucket join."""
    from wills_columnar_format_spark.operators import registry as R

    n_hot = 3_000
    base = [0.25 * ((j % 7) - 3) for j in range(64)]
    hot = spark.range(n_hot).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(x)).cast("float") for x in base]).alias("embedding"),
    )
    bg = spark.range(n_hot, n_hot + 50).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                ((F.hash(F.col("id") * (j + 1) + j) % 1000) / 100.0).cast("float")
                for j in range(64)
            ]
        ).alias("embedding"),
    )
    hot.unionAll(bg).createOrReplaceTempView("embeddings")
    sql = R.SPARK_EMB_DEDUP.replace(f"<= {R._EMB_CAP}", "<= 64").replace(
        f"> {R._EMB_CAP}", "> 64"
    )
    t0 = time.time()
    pairs = spark.sql(sql)
    rows = pairs.count()
    elapsed = time.time() - t0
    # emb2 doubles the set: 2*n_hot + 100 identical vectors in one
    # fingerprint group -> star pairs to the min id; clones of bg docs
    # pair too. Total pairs = (2*n_hot - 1) star + 50 clone pairs.
    star_expected = 2 * n_hot - 1
    assert rows == star_expected + 50
    assert elapsed < 120


def test_hot_band_fallback_is_case_sensitive(spark):
    """The star-fallback fingerprint must match gram semantics (case-
    sensitive): case-differing hot docs are NOT duplicates (their grams
    share nothing), so they must form separate star groups with no
    cross-case pairs."""
    n = 2_000
    upper = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("FOO BAR BAZ QUX QUUX CORGE GRAULT").alias("text"),
    )
    lower = spark.range(n, 2 * n).select(
        F.col("id").alias("doc_id"),
        F.lit("foo bar baz qux quux corge grault").alias("text"),
    )
    pairs = minhash_lsh_pairs(spark, upper.unionAll(lower), band_cap=64)
    rows = pairs.collect()
    # each case-group stars to its own min id; no pair crosses the groups
    assert len(rows) == 2 * (n - 1)
    for r in rows:
        assert (r.d1 < n) == (r.d2 < n), f"cross-case pair {r}"
