"""Similarity search operators [EXT]: brute-force cosine top-k (the exact
baseline) and an IVF-bucketed approximate variant (the scale path).

Scale design:
  * Brute-force: the query set is broadcast (it's small by definition);
    scoring is map-only over the corpus scan; the only shuffle is the
    per-query top-k reduction. Never crossJoin two big sides.
  * IVF: corpus is pre-assigned to its nearest centroid (map-only, vs a
    broadcast centroid table). A query probes only its own centroid's
    partition — turning top-k from O(corpus) into O(corpus/n_centroids)
    per query at a small recall cost. Centroids here are a deterministic
    sample; production would k-means them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import as_double_array, cosine


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the queries against the corpus scan,
    reduce per query. Scores rounded to 6dp (and rank tie-broken by id) so
    results are reproducible bit-for-bit across engines."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(F.col(vec_col)).alias("qv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 1,
) -> DataFrame:
    """Assign every vector to its ``nprobe`` nearest centroids (broadcast
    centroids, map-only). Returns (id, centroid_id, v) — one row per
    (vector, probed centroid). Corpus assignment uses nprobe=1 (each
    vector lives in exactly one inverted list); queries probe several
    lists to buy recall without touching the rest of the corpus."""
    c = corpus.select(F.col(id_col), as_double_array(F.col(vec_col)).alias("v"))
    cent = centroids.select(
        F.col("centroid_id"), as_double_array(F.col(vec_col)).alias("cv")
    )
    scored = c.crossJoin(F.broadcast(cent)).select(
        id_col,
        "v",
        "centroid_id",
        cosine(F.col("v"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select(id_col, "centroid_id", "v")
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Seeded pyspark.ml KMeans centroids — the production replacement for
    the deterministic sample. Training is one MLlib job over the corpus;
    the model's centers are a tiny driver-side list (n_centroids × dim)
    re-parallelized for the broadcast assign join. Deterministic for a
    fixed (seed, data, partitioning)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        array_to_vector(as_double_array(F.col(vec_col))).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=20).fit(feats)
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return corpus.sparkSession.createDataFrame(
        rows, f"centroid_id long, {vec_col} array<double>"
    )


def deterministic_centroids(
    corpus: DataFrame, every: int = 100, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Deterministic centroid sample: every Nth vector by id. A stand-in
    for k-means that keeps results reproducible."""
    return corpus.filter(F.col(id_col) % every == 0).select(
        (F.col(id_col) / every).cast("long").alias("centroid_id"), F.col(vec_col)
    )


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    every: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    nprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: corpus vectors live in their nearest centroid's
    inverted list; each query probes its ``nprobe`` nearest lists and
    scores only those candidates. ``centroids`` defaults to the
    deterministic every-Nth sample (reproducible stand-in); pass
    kmeans_centroids(...) for the production quality/recall."""
    cents = (
        centroids
        if centroids is not None
        else deterministic_centroids(corpus, every, vec_col, id_col)
    )
    corpus_a = ivf_assign(corpus, cents, vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("centroid_id"), F.col("v").alias("cv")
    )
    queries_a = ivf_assign(queries, cents, vec_col, id_col, nprobe=nprobe).select(
        F.col(id_col).alias("query_id"),
        F.col("centroid_id").alias("centroid_q"),
        F.col("v").alias("qv"),
    )
    scored = corpus_a.join(
        F.broadcast(queries_a), F.col("centroid_id") == F.col("centroid_q")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def knn_bruteforce_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k with the scoring inside an Arrow-batched pandas
    UDF: each partition's embeddings become one numpy matrix and all query
    similarities are a single BLAS matmul — the alternative to the
    expression-based fold in ``knn_bruteforce`` when vectors are wide.

    Plan: queries are collected (small by definition) and shipped in the
    UDF closure; per partition we emit only the local top-k per query, so
    the shuffle to the final per-query reduction carries
    O(partitions × queries × k) rows. Measured at 64 dims the JVM
    expression fold and this path are comparable; at 1024+ dims the
    matmul wins decisively — bench.py tracks both.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = [r[0] for r in q_rows]
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("neighbor_id", T.LongType(), False),
            T.StructField("cos_sim", T.DoubleType(), False),
        ]
    )

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ q_norm.T  # |batch| × |queries|
            top = min(k, len(ids))
            rows = []
            for qi, qid in enumerate(q_ids):
                col = sims[:, qi]
                idx = np.argpartition(-col, top - 1)[:top]
                for j in idx:
                    rows.append(
                        {"query_id": int(qid), "neighbor_id": int(ids[j]),
                         "cos_sim": round(float(col[j]), 6)}
                    )
            yield pd.DataFrame(rows)

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
