"""ANN operator tests: IVF with the real (kmeans) quantizer must recover
brute-force neighbors at high recall, and the deterministic oracle config
must stay stable across runs."""

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _brute_force_topk(emb_df, n_queries, k):
    rows = emb_df.collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    out = {}
    for qi in range(n_queries):
        sims = X[qi] @ X.T
        sims[qi] = -np.inf
        # sort by (-cos, id) like the operator's tie-break
        top = sorted(range(len(ids)), key=lambda j: (-sims[j], ids[j]))[:k]
        out[int(ids[qi])] = [int(ids[j]) for j in top]
    return out


def test_ivf_kmeans_recall_at_3(spark, emb_df):
    """sf0.01 embeddings are ISOTROPIC random vectors — IVF's worst case
    (neighbors barely cluster), so hitting 0.9 needs a wide probe
    (nprobe 12 of 22 ≈ 55% of the corpus, measured: 4→0.58, 8→0.80,
    12→0.90). Realistic clustered embeddings reach higher recall at
    nprobe=4 — see test_ivf_recall_on_clustered_data."""
    from wills_columnar_format_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    n = emb_df.count()
    n_clusters = max(4, int(np.sqrt(n)))  # ~√n: the scale config
    C = kmeans_centroids(emb_df, n_clusters, seed=0)
    assert C.shape == (n_clusters, 64)
    got = ivf_topk(
        spark, emb_df, k=3, n_queries=20, centroids=C, nprobe=12
    ).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    expect = _brute_force_topk(emb_df, n_queries=20, k=3)
    hits = total = 0
    for q, want in expect.items():
        have = set(by_q.get(q, []))
        hits += len(have & set(want))
        total += len(want)
    assert total == 60
    assert hits / total >= 0.9, f"recall@3 = {hits/total}"


def test_ivf_recall_on_clustered_data(spark, emb_df):
    """The realistic case: embeddings live in clusters. A narrow probe
    (nprobe=4 of 16) must still recover brute-force neighbors."""
    import pandas as pd

    from wills_columnar_format_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    rng = np.random.default_rng(17)
    centers = rng.standard_normal((20, 64)) * 3.0
    X = np.repeat(centers, 50, axis=0) + rng.standard_normal((1000, 64)) * 0.3
    pdf = pd.DataFrame({
        "vec_id": np.arange(1000, dtype=np.int64),
        "embedding": [row.astype(np.float32).tolist() for row in X],
    })
    df = spark.createDataFrame(pdf)
    C = kmeans_centroids(df, 16, seed=0)
    got = ivf_topk(spark, df, k=3, n_queries=20, centroids=C, nprobe=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    expect = _brute_force_topk(df, n_queries=20, k=3)
    hits = sum(len(by_q.get(q, set()) & set(w)) for q, w in expect.items())
    assert hits / 60 >= 0.95, f"clustered recall@3 = {hits/60}"


def test_kmeans_centroids_deterministic(spark, emb_df):
    from wills_columnar_format_spark.operators.similarity import kmeans_centroids

    a = kmeans_centroids(emb_df, 16, seed=3)
    b = kmeans_centroids(emb_df, 16, seed=3)
    assert np.array_equal(a, b)
    c = kmeans_centroids(emb_df, 16, seed=4)
    assert not np.array_equal(a, c)


def test_ivf_oracle_config_unchanged_by_nprobe_path(spark, emb_df):
    """The oracle config (first-8 centroids, nprobe=1) must produce the
    same result through the new top-nprobe query assignment."""
    from wills_columnar_format_spark.operators.similarity import ivf_topk

    r1 = sorted(
        ivf_topk(spark, emb_df, n_clusters=8, k=3, n_queries=10).collect(),
        key=lambda r: (r.query_id, r.rank),
    )
    r2 = sorted(
        ivf_topk(spark, emb_df, n_clusters=8, k=3, n_queries=10, nprobe=1).collect(),
        key=lambda r: (r.query_id, r.rank),
    )
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
    assert len(r1) == 30
