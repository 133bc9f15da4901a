"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk``: brute-force cosine top-k, fully declarative
  (cross join + window) — the correctness baseline and the oracle
  target.
- ``cosine_topk_block``: broadcast-matrix numpy top-k via
  ``mapInPandas`` — the fast single-pass exact path.
- ``ivf_topk``: IVF-style two-stage ANN: k-means-ish coarse centroids
  (deterministic seeded sample), route each vector to its ``n_probe``
  nearest centroids, search only within probed cells — the 100 TB
  scale path (shuffle is bounded by cell size, not n²).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from spark_tsne_spark.functions.vector import cosine_sim, l2_norm

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("i", T.LongType()),
        T.StructField("j", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
        T.StructField("rank", T.IntegerType()),
    ]
)


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query against the corpus.

    Declarative: broadcast the query side, window-rank per query.
    Ties broken by neighbor id for determinism.
    """
    corpus = emb.select(
        F.col(id_col).alias("j"), F.col(vec_col).cast("array<double>").alias("vj")
    ).withColumn("nj", l2_norm("vj"))
    qs = queries.select(
        F.col(id_col).alias("i"), F.col(vec_col).cast("array<double>").alias("vi")
    ).withColumn("ni", l2_norm("vi"))
    pairs = (
        corpus.crossJoin(F.broadcast(qs))
        .where(F.col("i") != F.col("j"))
        .select(
            "i",
            "j",
            (
                F.aggregate(
                    F.zip_with("vi", "vj", lambda x, y: x * y),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / (F.col("ni") * F.col("nj"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("i").orderBy(F.col("cosine").desc(), F.col("j").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("i", "j", "cosine", "rank")
    )


def cosine_topk_block(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k with the queries as a broadcast matrix.

    One narrow pass over the corpus computing partial per-query top-k
    per partition, finished with a tiny global merge — the classic
    map-side top-k pattern (partial results are k rows per query per
    partition, so the shuffle is O(P·q·k), independent of corpus n).
    """
    from spark_tsne_spark.shipping import ship_package

    ship_package(emb.sparkSession)
    q_rows = queries.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).collect()
    q_ids = np.array([r["id"] for r in q_rows], dtype=np.int64)
    Q = np.array([r["v"] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sc = emb.sparkSession.sparkContext
    b_qids = sc.broadcast(q_ids)
    b_Q = sc.broadcast(Qn)

    def part_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_tsne_spark.runtime import tune_malloc

        tune_malloc()
        Qn_ = b_Q.value
        qids_ = b_qids.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            ids = pdf["id"].to_numpy()
            sims = Qn_ @ X.T  # q × batch
            out_i, out_j, out_c = [], [], []
            kk = min(k + 1, sims.shape[1])
            for qi in range(len(qids_)):
                idx = np.argpartition(-sims[qi], kk - 1)[:kk]
                for t in idx:
                    if ids[t] != qids_[qi]:
                        out_i.append(qids_[qi])
                        out_j.append(ids[t])
                        out_c.append(sims[qi, t])
            yield pd.DataFrame(
                {"i": out_i, "j": out_j, "cosine": out_c, "rank": 0}
            )

    # Spread the scan: fixture parquet often lands as one partition.
    par = emb.sparkSession.sparkContext.defaultParallelism
    partial = (
        emb.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
        .repartition(par)
        .mapInPandas(part_topk, TOPK_SCHEMA)
    )
    w = Window.partitionBy("i").orderBy(F.col("cosine").desc(), F.col("j").asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("i", "j", "cosine", "rank")
    )


def _kmeans_centroids(
    base: DataFrame,
    n_cells: int,
    seed: int,
    max_train: int = 200_000,
) -> np.ndarray:
    """Spherical-k-means coarse quantizer: L2-normalize, hash-sample a
    bounded training set, fit ``pyspark.ml`` KMeans, re-normalize the
    centroids (row-normalized Euclidean k-means ≈ cosine k-means).
    Returns an ``(n_cells, d)`` unit-row matrix. Deterministic in
    ``seed``; centroid count degrades gracefully below ``n_cells``
    rows of input.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    nrm = l2_norm("v")
    unit = base.select(
        F.transform("v", lambda x: x / nrm).alias("vn")
    ).where(nrm > 0)
    # Bounded training set: one count (narrow scan — the quantizer fit
    # is a one-time cost) sizes a seeded Bernoulli sample so the fit
    # never sees more than ~max_train rows regardless of corpus size.
    n = unit.count()
    if n == 0:
        raise ValueError("ivf_topk: empty corpus")
    frac = min(1.0, (max_train * 1.2) / n)
    train = unit if frac >= 1.0 else unit.sample(False, frac, seed)
    train = train.limit(max_train).select(array_to_vector("vn").alias("features"))
    k_eff = min(n_cells, n)
    model = KMeans(k=max(1, k_eff), seed=seed, maxIter=20).fit(train)
    C = np.stack([np.asarray(c, dtype=np.float64) for c in model.clusterCenters()])
    norms = np.linalg.norm(C, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return C / norms


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-bucketed approximate top-k.

    Coarse quantizer = spherical k-means over the (L2-normalized)
    corpus, trained with ``pyspark.ml.clustering.KMeans`` on a
    deterministic hash-sample capped at ``max_train`` rows — at corpus
    scale the quantizer never sees more than a bounded training set,
    and the fit is one distributed job. Corpus rows are assigned to
    their nearest centroid (one cell each); queries probe their
    ``n_probe`` nearest cells; the join is on cell id, so work scales
    with cell population, not n².
    """
    from spark_tsne_spark.shipping import ship_package

    ship_package(emb.sparkSession)
    base = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    C = _kmeans_centroids(base, n_cells, seed)
    sc = emb.sparkSession.sparkContext
    b_C = sc.broadcast(C)

    assign_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
            T.StructField("cell", T.IntegerType()),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_tsne_spark.runtime import tune_malloc

        tune_malloc()
        C_ = b_C.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            cell = np.argmax(Xn @ C_.T, axis=1).astype(np.int32)
            yield pd.DataFrame({"id": pdf["id"], "v": pdf["v"], "cell": cell})

    probe_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
            T.StructField("cell", T.IntegerType()),
        ]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_tsne_spark.runtime import tune_malloc

        tune_malloc()
        C_ = b_C.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            order = np.argsort(-(Xn @ C_.T), axis=1)[:, :n_probe]
            # Vectorized n_probe fan-out: repeat each row's id/vector
            # once per probed cell, flatten the cell matrix — no
            # per-row Python loop.
            reps = order.shape[1]
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf["id"].to_numpy(), reps),
                    "v": pdf["v"].to_numpy().repeat(reps),
                    "cell": order.ravel().astype(np.int32),
                }
            )

    par = emb.sparkSession.sparkContext.defaultParallelism
    corpus_cells = base.repartition(par).mapInPandas(assign, assign_schema)
    query_cells = (
        queries.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        ).mapInPandas(probe, probe_schema)
    )
    joined = corpus_cells.alias("c").join(
        F.broadcast(query_cells.alias("q")), on="cell"
    ).where(F.col("q.id") != F.col("c.id"))
    # Each corpus row lives in exactly ONE cell (argmax assignment), so
    # (i, j) pairs are already unique across probed cells — no dedup
    # shuffle needed.
    pairs = joined.select(
        F.col("q.id").alias("i"),
        F.col("c.id").alias("j"),
        cosine_sim(F.col("q.v"), F.col("c.v")).alias("cosine"),
    )
    w = Window.partitionBy("i").orderBy(F.col("cosine").desc(), F.col("j").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("i", "j", "cosine", "rank")
    )
