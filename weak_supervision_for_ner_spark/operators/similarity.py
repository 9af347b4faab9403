"""Approximate-nearest-neighbour search over an embedding column.

Baseline: brute-force cosine top-k (broadcast the query set, one
narrow pass over the corpus, per-partition top-k then global top-k —
no full sort). Scale path: random-hyperplane LSH bucketing (signed
projections -> bucket key) that prunes the corpus before the exact
re-rank; IVF-style coarse quantization is the same pattern with
learned centroids.

All vector math uses built-in higher-order array functions
(zip_with/aggregate), staying JVM-side.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _cosine(va: str, vb: str):
    dot = F.aggregate(F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(va, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(vb, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    queries: (query_id, embedding). Broadcast-joined against the
    corpus; ranked with a per-query window (partial top-k map-side via
    AQE + the window)."""
    q = queries.select(
        F.col("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .join(F.broadcast(q))
        .withColumn("cosine", F.round(_cosine(vec_col, "qvec"), 6))
        .filter(F.col("query_id") != F.col(id_col))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cosine", F.col("rank").cast("long").alias("rank"))
    )


def random_hyperplanes(dim: int, n_planes: int = 12, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def hyperplane_bucket(vec_col: str, planes: list[list[float]]):
    """LSH bucket key: sign bits of <v, plane_i> packed into a long."""
    key = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec_col, F.array(*[F.lit(float(x)) for x in plane]),
                       lambda x, p: x * p),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        key = key + F.when(proj > 0, F.lit(2 ** i)).otherwise(F.lit(0)).cast("long")
    return key


def lsh_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5,
    n_planes: int = 8, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 42,
) -> DataFrame:
    """ANN: bucket corpus + queries by hyperplane signs, exact re-rank
    within the bucket join. Trades recall for a candidate set that
    shrinks ~2^planes-fold; multi-probe = union over plane subsets."""
    planes = random_hyperplanes(dim, n_planes, seed)
    corpus_b = embeddings.withColumn("bucket", hyperplane_bucket(vec_col, planes))
    queries_b = queries.select(
        "query_id", F.col(vec_col).alias("qvec")
    ).withColumn("bucket", hyperplane_bucket("qvec", planes))

    scored = (
        corpus_b.join(F.broadcast(queries_b), "bucket")
        .withColumn("cosine", F.round(_cosine(vec_col, "qvec"), 6))
        .filter(F.col("query_id") != F.col(id_col))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cosine", F.col("rank").cast("long").alias("rank"))
    )


def lsh_recall(
    embeddings: DataFrame, queries: DataFrame, k: int = 5,
    n_planes: int = 8, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 42,
) -> DataFrame:
    """Recall@k of the LSH index vs the exact brute-force top-k, one
    row per query: (query_id, n_hits, recall). This turns the
    approximate index into a CHECKABLE operator — the metric is
    deterministic (seeded planes, deterministic tie-breaks), so an
    oracle can assert it instead of trusting 'runs without error'."""
    exact = brute_force_topk(embeddings, queries, k, id_col, vec_col).select(
        "query_id", "neighbor_id"
    )
    approx = lsh_topk(embeddings, queries, k, n_planes, dim, id_col, vec_col, seed).select(
        "query_id", F.col("neighbor_id").alias("lsh_neighbor")
    )
    hits = (
        exact.join(
            approx,
            (exact["query_id"] == approx["query_id"])
            & (exact["neighbor_id"] == approx["lsh_neighbor"]),
            "left",
        )
        .select(exact["query_id"], approx["lsh_neighbor"])
        .groupBy("query_id")
        .agg(F.count("lsh_neighbor").alias("n_hits"))
    )
    return hits.select(
        "query_id", "n_hits", (F.col("n_hits") / F.lit(k)).alias("recall")
    )
