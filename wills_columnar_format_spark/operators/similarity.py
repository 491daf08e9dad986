"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline, expressed entirely in
  JVM-side SQL (zip_with/aggregate fold; no Python in the hot path);
* IVF-bucketed ANN — the scale path: deterministic coarse centroids,
  cluster assignment + in-cluster top-k as vectorized pandas UDFs.
  At 100 TB the cross join of brute force is quadratic; IVF probes only
  1/n_clusters of the corpus per query (broadcast centroids, one shuffle
  on cluster id).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def brute_force_topk_sql(queries_pred: str, k: int = 3) -> str:
    """Spark SQL for exact cosine top-k (dialect-shared shape)."""
    return f"""
WITH sims AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         aggregate(zip_with(q.embedding, v.embedding,
                            (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                   CAST(0 AS DOUBLE), (acc, z) -> acc + z)
         / (sqrt(aggregate(transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                           CAST(0 AS DOUBLE), (acc, z) -> acc + z))
            * sqrt(aggregate(transform(v.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                             CAST(0 AS DOUBLE), (acc, z) -> acc + z))) AS cos
  FROM embeddings q JOIN embeddings v ON v.vec_id != q.vec_id
  WHERE {queries_pred}
)
SELECT query_id, neighbor_id, CAST(rk AS INT) AS rank
FROM (SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
      FROM sims)
WHERE rk <= {k}
"""


def kmeans_centroids(
    emb_df,
    n_clusters: int,
    seed: int = 0,
    iters: int = 8,
    sample_rows: int = 50_000,
) -> np.ndarray:
    """Seeded deterministic spherical k-means on a driver-side sample.

    The real quantizer for IVF at scale: n_clusters ≈ √n keeps both the
    centroid broadcast and the per-cluster candidate lists balanced (the
    fixed-8-centroid config exists only for the cross-engine oracle).
    Determinism: sample = first ``sample_rows`` by vec_id (stable order),
    seeded init, fixed iteration count, argmax assignment with numpy's
    first-index tie-break — same input → same centroids, every run.
    """
    rows = emb_df.orderBy("vec_id").limit(sample_rows).select("embedding").collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n_clusters = min(n_clusters, len(X))
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=n_clusters, replace=False)].copy()
    for _ in range(iters):
        a = (X @ C.T).argmax(axis=1)
        sums = np.zeros_like(C)
        np.add.at(sums, a, X)
        counts = np.bincount(a, minlength=n_clusters).astype(np.float64)
        nonempty = counts > 0
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def ivf_topk(
    spark,
    emb_df,
    n_clusters: int = 8,
    k: int = 3,
    n_queries: int = 10,
    centroids: np.ndarray | None = None,
    nprobe: int = 1,
):
    """IVF-style ANN. Two configs:

    * default (oracle): centroids = the first ``n_clusters`` vectors by
      vec_id, nprobe=1 — fully mirrored in DuckDB SQL for value-hashing;
    * scale: pass ``centroids=kmeans_centroids(df, ~√n)`` and nprobe>1 —
      queries probe their top-``nprobe`` clusters, so the candidate join
      fans out over nprobe × (n / n_clusters) vectors instead of skewing
      onto a handful of cluster keys.

    Assignment and in-cluster scoring are vectorized numpy inside
    mapInPandas; centroids travel as a broadcast.
    """
    if centroids is None:
        cents = (
            emb_df.orderBy("vec_id").limit(n_clusters).select("vec_id", "embedding").collect()
        )
        C = np.array([r.embedding for r in cents], dtype=np.float64)
        C /= np.linalg.norm(C, axis=1, keepdims=True)
    else:
        C = np.asarray(centroids, dtype=np.float64)
    bc = spark.sparkContext.broadcast(C)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Cb = bc.value
        for pdf in batches:
            M = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(np.float64)
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            cluster = (M @ Cb.T).argmax(axis=1).astype(np.int32)
            out = pdf[["vec_id"]].copy()
            out["cluster"] = cluster
            out["embedding"] = pdf["embedding"]
            yield out

    assigned = emb_df.mapInPandas(assign, schema="vec_id bigint, cluster int, embedding array<float>")

    def assign_queries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Cb = bc.value
        p = min(nprobe, len(Cb))
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(np.float64)
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            sims = M @ Cb.T
            # top-nprobe clusters per query, deterministic order
            top = np.argsort(-sims, axis=1, kind="stable")[:, :p]
            qid = np.repeat(pdf["vec_id"].to_numpy(), p)
            emb = pdf["embedding"].iloc[np.repeat(np.arange(len(pdf)), p)]
            yield pd.DataFrame(
                {"query_id": qid, "cluster": top.ravel().astype(np.int32),
                 "q_emb": emb.to_numpy()}
            )

    queries = emb_df.filter(F.col("vec_id") < n_queries).mapInPandas(
        assign_queries, schema="query_id bigint, cluster int, q_emb array<float>"
    )
    # probe the query's top-nprobe clusters (nprobe/n_clusters of the corpus)
    cand = queries.join(assigned, "cluster").filter(F.col("vec_id") != F.col("query_id"))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.stack(pdf["q_emb"].map(np.asarray).to_numpy()).astype(np.float64)
            V = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(np.float64)
            cos = (Q * V).sum(axis=1) / (
                np.linalg.norm(Q, axis=1) * np.maximum(np.linalg.norm(V, axis=1), 1e-12)
            )
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], "neighbor_id": pdf["vec_id"], "cos": cos}
            )

    scored = cand.mapInPandas(score, schema="query_id bigint, neighbor_id bigint, cos double")
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        # rank-only output (no float column): deterministic across engines,
        # so the DuckDB oracle can value-hash it
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )
