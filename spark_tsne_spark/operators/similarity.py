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
    # Spread the scan: fixture parquet often lands as one partition.
    par = sc.defaultParallelism

    def part_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_tsne_spark.runtime import tune_malloc, unpin_blas_threads

        tune_malloc()
        # This pass fans out over `par` concurrent tasks, so each
        # worker only widens its BLAS pool to its fair share of the
        # cores (an unconditional unpin here re-created the 32×32
        # thread oversubscription the wide-pass pin exists to fix).
        unpin_blas_threads(par)
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


def _spherical_kmeans(
    X: np.ndarray, k: int, seed: int, iters: int = 20, restarts: int = 8
) -> np.ndarray:
    """Driver-side spherical k-means over a unit-row sample matrix.

    k-means++ (D²) seeding, Lloyd iterations with cosine assignment
    (argmax X·Cᵀ over unit rows) and re-normalized mean updates; empty
    cells reseed to the worst-served point. Best of ``restarts``
    seeded runs by mean within-cell similarity. Deterministic in
    ``seed``. O(restarts·iters·n·k·d) flops — milliseconds at the
    bounded sample sizes used here.
    """
    n = X.shape[0]
    k = min(k, n)

    def one(s: int) -> tuple[np.ndarray, float]:
        rng = np.random.default_rng(s)
        chosen = [int(rng.integers(n))]
        best_sim = X @ X[chosen[0]]
        for _ in range(1, k):
            d2 = np.maximum(0.0, 1.0 - best_sim)
            tot = d2.sum()
            if tot <= 0:
                nxt = int(rng.integers(n))
            else:
                nxt = int(rng.choice(n, p=d2 / tot))
            chosen.append(nxt)
            best_sim = np.maximum(best_sim, X @ X[nxt])
        C = X[chosen].copy()
        for _ in range(iters):
            assign = np.argmax(X @ C.T, axis=1)
            sims = (X * C[assign]).sum(axis=1)
            for c in range(k):
                mask = assign == c
                if not mask.any():
                    C[c] = X[int(np.argmin(sims))]
                    continue
                m = X[mask].sum(axis=0)
                nm = np.linalg.norm(m)
                C[c] = m / nm if nm > 0 else C[c]
        assign = np.argmax(X @ C.T, axis=1)
        return C, float((X * C[assign]).sum(axis=1).mean())

    best_C, best_obj = None, -2.0
    for s in range(seed, seed + max(1, restarts)):
        C, obj = one(s)
        if obj > best_obj:
            best_C, best_obj = C, obj
    return best_C


def _kmeans_centroids(
    base: DataFrame,
    n_cells: int,
    seed: int,
    max_train: int = 100_000,
    return_sample: bool = False,
) -> tuple:
    """Spherical-k-means coarse quantizer trained on a bounded sample.

    The quantizer only needs a representative sample, not the corpus
    (the standard IVF design: FAISS trains coarse quantizers on
    30–256 points per centroid). One TakeOrdered job draws a
    hash-ordered sample capped at ``max_train`` rows (≤ ~50 MB at
    d=64 — bounded regardless of corpus size), which is collected and
    fit driver-side with pure numpy — a single narrow Spark job
    instead of 20 distributed KMeans iterations. Deterministic in
    ``seed``. Returns ``(C, n)``: an ``(n_cells, d)`` unit-row matrix
    and the corpus row count.
    """
    # ONE TakeOrderedAndProject job (per-partition top-k by a salted
    # content hash, driver merge — no full sort shuffle, no separate
    # count job): the max_train rows with the smallest hash are a
    # deterministic, layout-independent pseudo-random sample (a change
    # in file splits or scan order can't move the training set —
    # hashing keys on the id VALUE only; ties broken by id). The old
    # shape paid count + hash_sample + TakeOrdered = 2-3 Spark jobs
    # per train; at the bench this fixed job overhead dominated the
    # whole ANN family (VERDICT r6 #6).
    h = F.xxhash64(F.lit(f"ivf-{seed}"), F.col("id").cast("string"))
    rows = (
        base.select("id", "v")
        .orderBy(h.asc(), F.col("id").asc())
        .limit(max_train)
        .collect()
    )
    if len(rows) == 0:
        raise ValueError("ivf_topk: empty corpus")
    # True corpus size is only needed when the sample saturated (the
    # common small-corpus case reads it off the sample for free; at
    # 100 TB the count is parquet-metadata-cheap).
    n = base.count() if len(rows) == max_train else len(rows)
    # k-means++ seeding sees the sample in id order — identical to the
    # previous contract whenever n <= max_train (every pinned golden),
    # and scan-order independent always.
    rows.sort(key=lambda r: r["id"])
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = X[norms[:, 0] > 0] / norms[norms[:, 0] > 0]
    if len(X) == 0:
        raise ValueError("ivf_topk: corpus has no nonzero vectors")
    C = _spherical_kmeans(X, n_cells, seed)
    if return_sample:
        # Callers training further quantizers (PQ) reuse the same
        # bounded unit-row sample instead of re-collecting.
        return C, n, X
    return C, n


_FANOUT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.ArrayType(T.DoubleType())),
        T.StructField("cell", T.IntegerType()),
    ]
)


def _make_cell_fanout(b_C, n_top: int, concurrent: int = 1, floor: int = 1):
    """mapInPandas kernel: emit each row once per its n_top nearest
    cells — vectorized (np.repeat / ravel), no row loop. Shared by the
    one-shot :func:`ivf_topk` and the persistent :class:`IvfIndex`.
    ``concurrent`` is the plan-side partition count of the stage this
    kernel runs in: the BLAS pool widens only to the worker's fair
    share of the cores (1-partition query batch → full pool; a
    many-partition corpus scan → 1 thread each)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_tsne_spark.runtime import tune_malloc, unpin_blas_threads

        tune_malloc()
        unpin_blas_threads(concurrent, floor)
        C_ = b_C.value
        m = min(n_top, len(C_))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            sim = Xn @ C_.T
            if m == 1:
                order = np.argmax(sim, axis=1)[:, None]
            else:
                # membership only — order within cells irrelevant
                order = np.argpartition(-sim, m - 1, axis=1)[:, :m]
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf["id"].to_numpy(), m),
                    "v": pdf["v"].to_numpy().repeat(m),
                    "cell": order.ravel().astype(np.int32),
                }
            )

    return run


def _local_query_max_rows() -> int:
    """Ceiling on how many query rows the driver-side fan-out will
    collect. Query batches are broadcast-bounded by contract (they
    ship whole to every executor as the broadcast join side), so a
    batch above this bound was *already* out of contract — but
    nothing used to enforce it, and a violating caller would OOM the
    driver at plan-build time instead of running the (slower, safe)
    distributed kernel. Overridable for testing / unusual drivers."""
    import os

    return int(os.environ.get("SPARK_GRAFT_ANN_LOCAL_QMAX", "65536"))


def _local_query_cells(q_sel: DataFrame, C: np.ndarray, n_top: int) -> DataFrame:
    """Driver-side twin of :func:`_make_cell_fanout` for the QUERY side.

    Query batches are broadcast-bounded by contract — every consumer
    ships them to all executors as the broadcast side of the cell
    join — so computing their cell fan-out driver-side is free of any
    distributed-memory concern and removes a whole Python-worker
    stage + its broadcast-build job per query batch (measured
    0.3–0.5 s of fixed overhead per ANN bench entry at sf0.1, where
    the query batch is 100 rows). The numpy expressions and tie
    behavior are IDENTICAL to the distributed kernel (same
    normalize, same argmax/argpartition), and the collected doubles
    round-trip exactly, so every output row is bit-equal — pinned by
    the unchanged ANN goldens. The corpus side stays distributed.

    Guard (round 13): the collect is bounded by
    :func:`_local_query_max_rows`; a larger query table falls back to
    the distributed kernel instead of collecting unbounded rows onto
    the driver.
    """
    spark = q_sel.sparkSession
    max_rows = _local_query_max_rows()
    pdf = q_sel.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        b_C = spark.sparkContext.broadcast(C)
        return q_sel.mapInPandas(
            _make_cell_fanout(
                b_C, n_top, concurrent=q_sel.rdd.getNumPartitions()
            ),
            _FANOUT_SCHEMA,
        )
    m = min(n_top, len(C))
    if len(pdf) == 0 or m == 0:
        return spark.createDataFrame([], _FANOUT_SCHEMA)
    X = np.array(pdf["v"].tolist(), dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sim = Xn @ C.T
    if m == 1:
        order = np.argmax(sim, axis=1)[:, None]
    else:
        order = np.argpartition(-sim, m - 1, axis=1)[:, :m]
    out = pd.DataFrame(
        {
            "id": np.repeat(pdf["id"].to_numpy(), m),
            "v": pdf["v"].to_numpy().repeat(m),
            "cell": order.ravel().astype(np.int32),
        }
    )
    return spark.createDataFrame(out, _FANOUT_SCHEMA)


def _rank_cell_join(
    corpus_cells: DataFrame, query_cells: DataFrame, k: int, dedup: bool
) -> DataFrame:
    """Shared IVF tail: broadcast query fan-out into the cell-keyed
    corpus, exact cosine within shared cells, optional multi-assign
    dedup, tiebroken top-k."""
    joined = corpus_cells.alias("c").join(
        F.broadcast(query_cells.alias("q")), on="cell"
    ).where(F.col("q.id") != F.col("c.id"))
    pairs = joined.select(
        F.col("q.id").alias("i"),
        F.col("c.id").alias("j"),
        cosine_sim(F.col("q.v"), F.col("c.v")).alias("cosine"),
    )
    if dedup:
        # ONE exchange for dedup + ranking (guide §2.4): hash by i
        # satisfies both the dedup aggregate's ClusteredDistribution
        # (i is a prefix of (i, j) — equal pairs co-locate) and the
        # window's, so the (i, j)-keyed exchange between them
        # disappears (plan: 2 Exchange → 1). Trade: the one shuffle
        # carries raw candidates (no map-side partial dedup), at most
        # replicas× the deduped volume moved once instead of that
        # volume moved plus a second exchange pass. Duplicate (i, j)
        # rows are bit-identical (same v arrays → same cosine), so the
        # surviving row is value-unique either way.
        pairs = pairs.repartition("i").dropDuplicates(["i", "j"])
    w = Window.partitionBy("i").orderBy(F.col("cosine").desc(), F.col("j").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("i", "j", "cosine", "rank")
    )


class IvfIndex:
    """Persistent IVF index: train + encode ONCE, query many times.

    :func:`ivf_topk` retrains the quantizer and re-encodes the corpus
    on every call — right for one-shot queries, wasteful for the
    production pattern (nightly corpus build, many query batches).
    ``IvfIndex.build`` materializes the cell-routed corpus as parquet
    PARTITIONED BY cell and persists the quantizer beside it, so:

    - probing becomes partition PRUNING: a query batch touching
      ``n_probe`` of ``n_cells`` cells scans only those directories —
      at 100 TB the scan shrinks by ``n_probe/n_cells`` before any
      executor starts;
    - the quantizer artifact is a tiny parquet (portable across
      object stores, unlike a driver-local npy);
    - results are bit-identical to :func:`ivf_topk` with the same
      parameters (same training, same kernels, same tail).
    """

    def __init__(self, path: str, C: np.ndarray, replicas: int):
        self.path = path
        self.C = C
        self.replicas = replicas

    @staticmethod
    def build(
        emb: DataFrame,
        path: str,
        n_cells: int = 16,
        replicas: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        seed: int = 42,
    ) -> "IvfIndex":
        from spark_tsne_spark.shipping import ship_package

        spark = emb.sparkSession
        ship_package(spark)
        base = emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        C, n_corpus = _kmeans_centroids(base, n_cells, seed)
        b_C = spark.sparkContext.broadcast(C)
        par = spark.sparkContext.defaultParallelism
        parts = max(1, min(par, n_corpus // 4096 + 1))
        (
            base.repartition(parts)
            .mapInPandas(
                _make_cell_fanout(b_C, max(1, replicas), concurrent=parts),
                _FANOUT_SCHEMA,
            )
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(f"{path}/cells")
        )
        quant = spark.createDataFrame(
            [(int(i), [float(x) for x in row], int(replicas)) for i, row in enumerate(C)],
            "cell int, centroid array<double>, replicas int",
        )
        quant.coalesce(1).write.mode("overwrite").parquet(f"{path}/quantizer")
        return IvfIndex(path, C, replicas)

    @staticmethod
    def load(spark, path: str) -> "IvfIndex":
        rows = spark.read.parquet(f"{path}/quantizer").collect()
        rows.sort(key=lambda r: r["cell"])
        C = np.array([r["centroid"] for r in rows], dtype=np.float64)
        return IvfIndex(path, C, int(rows[0]["replicas"]))

    def append(
        self,
        emb: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfIndex":
        """Incremental index maintenance: encode a NEW batch with the
        already-trained quantizer and append its cell-routed rows to
        the existing partition directories — the nightly-ingest
        pattern (the dedup family's ``incremental_*`` counterpart for
        ANN). No retrain, no rewrite of existing cells: work scales
        with the batch, not the corpus. Queries after an append see
        exactly the union index (pinned in tests: append ≡ rebuild
        with the same quantizer). The coarse quantizer does drift as
        the corpus distribution shifts — the production contract is
        periodic full ``build`` (re-train) with ``append`` between
        rebuilds, the same cadence FAISS/IVF deployments use.
        """
        from spark_tsne_spark.shipping import ship_package

        spark = emb.sparkSession
        ship_package(spark)
        base = emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        b_C = spark.sparkContext.broadcast(self.C)
        par = spark.sparkContext.defaultParallelism
        n_batch = base.count()
        parts = max(1, min(par, n_batch // 4096 + 1))
        (
            base.repartition(parts)
            .mapInPandas(
                _make_cell_fanout(b_C, max(1, self.replicas), concurrent=parts),
                _FANOUT_SCHEMA,
            )
            .write.mode("append")
            .partitionBy("cell")
            .parquet(f"{self.path}/cells")
        )
        return self

    def query(
        self,
        queries: DataFrame,
        k: int,
        n_probe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        from spark_tsne_spark.shipping import ship_package

        spark = queries.sparkSession
        ship_package(spark)
        q_sel = queries.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        query_cells = _local_query_cells(q_sel, self.C, max(1, n_probe))
        # The probed cell set becomes an IN-filter the scan turns into
        # partition pruning — unprobed cell directories are never
        # opened. query_cells is a driver-local relation now, so the
        # distinct is a LocalTableScan, not a cached Python stage.
        probed = [
            r["cell"] for r in query_cells.select("cell").distinct().collect()
        ]
        idx = spark.read.parquet(f"{self.path}/cells").where(
            F.col("cell").isin(probed)
        )
        return _rank_cell_join(idx, query_cells, k, dedup=self.replicas > 1)


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    replicas: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-bucketed approximate top-k.

    Coarse quantizer = driver-side spherical k-means on a bounded
    sample (see :func:`_kmeans_centroids`). Corpus rows are indexed
    into their ``replicas`` nearest cells (multi-assignment — the
    standard recall lever when clusters overlap; storage grows by
    ``replicas``×, never the join); queries probe their ``n_probe``
    nearest cells; the join is on cell id, so work scales with cell
    population × probes, not n². Duplicate (i, j) candidates from
    shared cells are dropped before ranking.
    """
    from spark_tsne_spark.shipping import ship_package

    ship_package(emb.sparkSession)
    base = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    C, n_corpus = _kmeans_centroids(base, n_cells, seed)
    sc = emb.sparkSession.sparkContext
    b_C = sc.broadcast(C)
    # Cell assignment is row-local: run it straight over the scan's
    # natural partitioning. (An earlier shape repartitioned the corpus
    # first to "size" Arrow batches — at 100 TB that is a full-corpus
    # shuffle for a map-only kernel, and at bench scale the extra
    # stage's fixed overhead dominated the query. maxPartitionBytes
    # already bounds scan partitions; Arrow batching handles the rest.)
    corpus_cells = base.mapInPandas(
        _make_cell_fanout(
            b_C, max(1, replicas), concurrent=base.rdd.getNumPartitions()
        ),
        _FANOUT_SCHEMA,
    )
    q_sel = queries.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    query_cells = _local_query_cells(q_sel, C, max(1, n_probe))
    # Multi-assignment can surface the same (i, j) via several shared
    # cells; _rank_cell_join dedups before ranking (same shuffle key
    # as the ranking window, so AQE plans them back-to-back).
    return _rank_cell_join(corpus_cells, query_cells, k, dedup=replicas > 1)


def _pq_codebooks(
    X: np.ndarray, m: int, n_codes: int, seed: int, iters: int = 15
) -> np.ndarray:
    """Train product-quantizer codebooks on a unit-row sample matrix.

    Splits the d dims into ``m`` contiguous subspaces and runs plain
    (Euclidean) k-means per subspace — the standard PQ trainer
    (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011). Seeding picks evenly-spaced rows of the
    id-sorted sample (deterministic, no RNG); empty codes reseed to
    the worst-quantized point. Returns ``(m, n_codes, d//m)``.
    """
    n, d = X.shape
    if d % m != 0:
        raise ValueError(f"PQ requires d % m == 0, got d={d}, m={m}")
    ds = d // m
    n_codes = min(n_codes, n)
    books = np.empty((m, n_codes, ds), dtype=np.float64)
    for s in range(m):
        sub = X[:, s * ds : (s + 1) * ds]
        C = sub[np.linspace(0, n - 1, n_codes).astype(np.int64)].copy()
        for _ in range(iters):
            # ||x - c||² = ||x||² - 2 x·c + ||c||²; row term constant
            # under argmin so only the cross and code-norm terms matter.
            d2 = -2.0 * (sub @ C.T) + (C * C).sum(axis=1)
            assign = np.argmin(d2, axis=1)
            err = d2[np.arange(n), assign]
            # vectorized per-cluster means (a per-code python loop with
            # boolean masks cost ~1.3 s per train at sf0.1; bincount is
            # ~5x faster and stays exact — sequential summation)
            counts = np.bincount(assign, minlength=n_codes)
            sums = np.stack(
                [
                    np.bincount(assign, weights=sub[:, t], minlength=n_codes)
                    for t in range(ds)
                ],
                axis=1,
            )
            nonempty = counts > 0
            C[nonempty] = sums[nonempty] / counts[nonempty, None]
            for c in np.where(~nonempty)[0]:
                C[c] = sub[int(np.argmax(err))]
        books[s] = C
    return books


_CODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("codes", T.ArrayType(T.IntegerType())),
    ]
)
_QFAN_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.LongType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("qv", T.ArrayType(T.DoubleType())),
    ]
)
_CAND_SCHEMA = T.StructType(
    [
        T.StructField("i", T.LongType()),
        T.StructField("j", T.LongType()),
        T.StructField("adc_score", T.DoubleType()),
    ]
)


def _make_pq_encode(b_C, b_books, concurrent: int = 1, floor: int = 1):
    """mapInPandas kernel: (id, v) → (id, cell, m uint8-range codes) —
    broadcast codebooks, vectorized per-subspace argmin, no shuffle.
    ``concurrent`` = plan-side partition count (BLAS fair share — see
    :func:`_make_cell_fanout`)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_tsne_spark.runtime import tune_malloc, unpin_blas_threads

        tune_malloc()
        unpin_blas_threads(concurrent, floor)
        C_, B_ = b_C.value, b_books.value
        m_, _, ds = B_.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            nr = np.linalg.norm(X, axis=1, keepdims=True)
            Xn = np.divide(X, nr, out=np.zeros_like(X), where=nr > 0)
            codes = np.empty((len(X), m_), dtype=np.int32)
            for s in range(m_):
                sub = Xn[:, s * ds : (s + 1) * ds]
                d2 = -2.0 * (sub @ B_[s].T) + (B_[s] * B_[s]).sum(axis=1)
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "cell": np.argmax(Xn @ C_.T, axis=1).astype(np.int32),
                    "codes": list(codes),
                }
            )

    return encode


def _make_pq_qfanout(b_C, n_probe: int):
    """mapInPandas kernel: each query emits its n_probe nearest cells
    with the normalized query vector riding along (d doubles — the
    32×-smaller join payload; ADC tables rebuild per batch). Kept as
    the distributed fallback for query tables above the
    :func:`_local_query_max_rows` driver-collect bound."""

    def q_fanout(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C_ = b_C.value
        probe = min(n_probe, len(C_))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            nr = np.linalg.norm(X, axis=1, keepdims=True)
            Xn = np.divide(X, nr, out=np.zeros_like(X), where=nr > 0)
            sim = Xn @ C_.T
            cells = np.argpartition(-sim, probe - 1, axis=1)[:, :probe]
            yield pd.DataFrame(
                {
                    "qid": np.repeat(pdf["id"].to_numpy(), probe),
                    "cell": cells.ravel().astype(np.int32),
                    "qv": np.repeat(Xn, probe, axis=0).tolist(),
                }
            )

    return q_fanout


def _local_pq_query_cells(
    q_sel: DataFrame, C: np.ndarray, n_probe: int
) -> DataFrame:
    """Each query emits its ``n_probe`` nearest cells with the
    NORMALIZED query vector riding along (d doubles — the 32×-smaller
    join payload; ADC tables rebuild per batch in the scoring
    kernel). Driver-side: same rationale, bit-equality argument and
    bounded-collect guard as :func:`_local_query_cells` (queries are
    broadcast-bounded by contract; identical numpy expressions, incl.
    this path's zero-norm guard)."""
    spark = q_sel.sparkSession
    max_rows = _local_query_max_rows()
    pdf = q_sel.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        b_C = spark.sparkContext.broadcast(C)
        return q_sel.mapInPandas(
            _make_pq_qfanout(b_C, max(1, n_probe)), _QFAN_SCHEMA
        )
    probe = min(n_probe, len(C))
    if len(pdf) == 0 or probe == 0:
        return spark.createDataFrame([], _QFAN_SCHEMA)
    X = np.array(pdf["v"].tolist(), dtype=np.float64)
    nr = np.linalg.norm(X, axis=1, keepdims=True)
    Xn = np.divide(X, nr, out=np.zeros_like(X), where=nr > 0)
    sim = Xn @ C.T
    cells = np.argpartition(-sim, probe - 1, axis=1)[:, :probe]
    out = pd.DataFrame(
        {
            "qid": np.repeat(pdf["id"].to_numpy(), probe),
            "cell": cells.ravel().astype(np.int32),
            "qv": np.repeat(Xn, probe, axis=0).tolist(),
        }
    )
    return spark.createDataFrame(out, _QFAN_SCHEMA)


def _make_adc_score(b_books):
    """Per-batch ADC: build each distinct query's lookup table ONCE
    from its (d-dim) vector, then score every candidate by m table
    lookups — amortized across the batch's candidates."""

    def adc_score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        B_ = b_books.value
        m_, nc, ds = B_.shape
        offs = np.arange(m_, dtype=np.int64) * nc
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)
            qids = pdf["qid"].to_numpy()
            uq, first, inv = np.unique(
                qids, return_index=True, return_inverse=True
            )
            Q = np.array(pdf["qv"].iloc[first].tolist(), dtype=np.float64)
            tables = np.einsum(
                "qsd,scd->qsc", Q.reshape(len(uq), m_, ds), B_
            ).reshape(len(uq), m_ * nc)
            score = np.take_along_axis(
                tables[inv], codes + offs, axis=1
            ).sum(axis=1)
            yield pd.DataFrame(
                {"i": qids, "j": pdf["id"].to_numpy(), "adc_score": score}
            )

    return adc_score


def _pq_query_tail(
    corpus_codes: DataFrame,
    query_cells: DataFrame,
    base: DataFrame,
    qv: DataFrame,
    k: int,
    refine_factor: int,
    b_books,
) -> DataFrame:
    """Shared IVF-PQ tail: ADC-score candidates within shared cells,
    keep the k·refine shortlist, exact-cosine re-rank against the
    original vectors. Used by the one-shot path and the persistent
    index identically, so both are value-identical by construction."""
    cands = (
        corpus_codes.join(F.broadcast(query_cells), on="cell")
        .where(F.col("qid") != F.col("id"))
        .mapInPandas(_make_adc_score(b_books), _CAND_SCHEMA)
    )
    shortlist = max(k, k * max(1, refine_factor))
    w_adc = Window.partitionBy("i").orderBy(
        F.col("adc_score").desc(), F.col("j").asc()
    )
    top_cands = (
        cands.withColumn("r", F.row_number().over(w_adc))
        .where(F.col("r") <= shortlist)
        .select("i", "j")
    )
    rerank = (
        base.join(F.broadcast(top_cands), base["id"] == top_cands["j"])
        .join(F.broadcast(qv), on="i")
        .select("i", "j", cosine_sim(F.col("vi"), F.col("v")).alias("cosine"))
    )
    w = Window.partitionBy("i").orderBy(F.col("cosine").desc(), F.col("j").asc())
    return (
        rerank.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("i", "j", "cosine", "rank")
    )


class IvfPqIndex:
    """Persistent IVF-PQ index — the compressed production pattern.

    Like :class:`IvfIndex` (train + encode once, query many), but the
    corpus is stored as m uint8-range PQ codes per vector (64× smaller
    than d=64 doubles) PARTITIONED BY cell, with the coarse quantizer,
    the PQ codebooks, and the original vectors (for exact re-rank)
    persisted beside it. Query batches partition-prune the code scan
    to their probed cells and never touch the original vectors until
    the k·refine re-rank join. Value-identical to :func:`ivf_pq_topk`
    with the same parameters (shared kernels and tail).
    """

    def __init__(self, path: str, C: np.ndarray, books: np.ndarray):
        self.path = path
        self.C = C
        self.books = books

    @staticmethod
    def build(
        emb: DataFrame,
        path: str,
        n_cells: int = 16,
        m: int = 8,
        n_codes: int = 256,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        seed: int = 42,
    ) -> "IvfPqIndex":
        from spark_tsne_spark.shipping import ship_package

        spark = emb.sparkSession
        ship_package(spark)
        base = emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        C, n_corpus, Xs = _kmeans_centroids(base, n_cells, seed, return_sample=True)
        books = _pq_codebooks(Xs, m, n_codes, seed)
        sc = spark.sparkContext
        b_C, b_books = sc.broadcast(C), sc.broadcast(books)
        par = sc.defaultParallelism
        parts = max(1, min(par, n_corpus // 4096 + 1))
        (
            base.repartition(parts)
            .mapInPandas(
                _make_pq_encode(b_C, b_books, concurrent=parts), _CODE_SCHEMA
            )
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(f"{path}/codes")
        )
        base.write.mode("overwrite").parquet(f"{path}/vectors")
        spark.createDataFrame(
            [(int(i), [float(x) for x in row]) for i, row in enumerate(C)],
            "cell int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/quantizer")
        spark.createDataFrame(
            [
                (int(s), int(c), [float(x) for x in books[s, c]])
                for s in range(books.shape[0])
                for c in range(books.shape[1])
            ],
            "sub int, code int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
        return IvfPqIndex(path, C, books)

    @staticmethod
    def load(spark, path: str) -> "IvfPqIndex":
        qrows = spark.read.parquet(f"{path}/quantizer").collect()
        qrows.sort(key=lambda r: r["cell"])
        C = np.array([r["centroid"] for r in qrows], dtype=np.float64)
        brows = spark.read.parquet(f"{path}/codebooks").collect()
        brows.sort(key=lambda r: (r["sub"], r["code"]))
        n_sub = max(r["sub"] for r in brows) + 1
        n_codes = max(r["code"] for r in brows) + 1
        books = np.array([r["centroid"] for r in brows], dtype=np.float64).reshape(
            n_sub, n_codes, -1
        )
        return IvfPqIndex(path, C, books)

    def query(
        self,
        queries: DataFrame,
        k: int,
        n_probe: int = 4,
        refine_factor: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        from spark_tsne_spark.shipping import ship_package

        spark = queries.sparkSession
        ship_package(spark)
        b_books = spark.sparkContext.broadcast(self.books)
        query_cells = _local_pq_query_cells(
            queries.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).cast("array<double>").alias("v"),
            ),
            self.C,
            max(1, n_probe),
        )
        probed = [
            r["cell"] for r in query_cells.select("cell").distinct().collect()
        ]
        codes = spark.read.parquet(f"{self.path}/codes").where(
            F.col("cell").isin(probed)
        )
        base = spark.read.parquet(f"{self.path}/vectors")
        qv = queries.select(
            F.col(id_col).alias("i"),
            F.col(vec_col).cast("array<double>").alias("vi"),
        )
        return _pq_query_tail(
            codes, query_cells, base, qv, k, refine_factor, b_books
        )


def ivf_pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 256,
    refine_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    profile: dict | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k: the compressed scale path for ANN.

    The corpus is stored as ``m`` uint8 codes per vector instead of
    ``d`` floats (d=64 doubles → 8 bytes: 64× smaller — at 100 TB of
    fp32 embeddings the PQ index is ~1.6 TB, small enough to keep hot).
    Pipeline (FAISS IVFPQ design, no-residual variant on unit vectors):

    1. coarse spherical k-means + per-subspace PQ codebooks trained
       driver-side on one bounded deterministic sample;
    2. one narrow pass encodes every corpus row to (cell, codes) —
       broadcast codebooks, vectorized argmin, no shuffle;
    3. queries fan out to ``n_probe`` cells with a precomputed ADC
       table (q·codebook dot products, m×n_codes doubles per query);
       candidates join on cell id and score by table lookup — never
       touching the original vectors;
    4. the top ``k·refine_factor`` ADC candidates per query join back
       to the corpus by id (a candidate-bounded shuffle, q·k·refine
       rows) for exact-cosine re-ranking — the standard recall
       repair for PQ's quantization error.

    Deterministic in ``seed`` end to end. Returns
    ``(i, j, cosine, rank)`` with exact (re-ranked) cosines.
    """
    from spark_tsne_spark.shipping import ship_package

    ship_package(emb.sparkSession)
    base = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    # Coarse quantizer + PQ codebooks share ONE bounded deterministic
    # sample (single collect job). When ``profile`` is given, the
    # driver-synchronous train stages record their wall time there
    # (the lazy encode/ADC/re-rank stages execute inside the caller's
    # single action and can't be split without forcing extra jobs).
    import time as _time

    t0 = _time.time()
    C, n_corpus, Xs = _kmeans_centroids(base, n_cells, seed, return_sample=True)
    t1 = _time.time()
    books = _pq_codebooks(Xs, m, n_codes, seed)
    if profile is not None:
        profile["pq_sample_kmeans_sec"] = round(t1 - t0, 3)
        profile["pq_codebook_train_sec"] = round(_time.time() - t1, 3)
        profile["pq_train_rows"] = int(len(Xs))
    sc = emb.sparkSession.sparkContext
    b_C, b_books = sc.broadcast(C), sc.broadcast(books)
    # PQ encode is row-local — no repartition (see ivf_topk: a
    # full-corpus shuffle for a map-only kernel is wrong at scale and
    # pure stage overhead at bench scale).
    corpus_codes = base.mapInPandas(
        _make_pq_encode(
            b_C, b_books, concurrent=base.rdd.getNumPartitions()
        ),
        _CODE_SCHEMA,
    )
    # Query side: n_probe cell fan-out with the normalized query
    # vector riding along (d doubles — 32× smaller than a
    # materialized m·n_codes ADC table; tables rebuild per batch in
    # the scoring kernel, amortized across candidates). Driver-local
    # (see _local_query_cells).
    query_cells = _local_pq_query_cells(
        queries.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        ),
        C,
        max(1, n_probe),
    )
    qv = queries.select(
        F.col(id_col).alias("i"), F.col(vec_col).cast("array<double>").alias("vi")
    )
    return _pq_query_tail(
        corpus_codes, query_cells, base, qv, k, refine_factor, b_books
    )


def mmr_rerank(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    n_candidates: int = 50,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein, SIGIR'98): greedily pick the candidate maximizing
    ``lam * relevance - (1-lam) * max_similarity_to_selected``.

    Plan split, which is the production shape at 100 TB: candidate
    generation is DISTRIBUTED (one scan computing cosine vs the
    broadcast query, TakeOrdered top-``n_candidates``); the greedy
    re-rank is DRIVER-BOUNDED at O(k * n_candidates) over the
    collected head — re-rankers always run on the head, never the
    corpus. Swapping the brute-force candidate stage for ``ivf_topk``
    changes nothing downstream.

    Cross-engine determinism: relevance and pairwise sims are rounded
    to 6 dp BEFORE the MMR arithmetic so both engines iterate on the
    same double grid; every argmax ties to the smaller id; the first
    pick's score is defined as its relevance. The DuckDB oracle is
    the same greedy unrolled into k CTE steps.
    """
    q_row = emb.where(F.col(id_col) == query_id).select(
        F.col(vec_col).cast("array<double>").alias("v")
    ).head()
    if q_row is None:
        raise ValueError(f"mmr_rerank: no row with {id_col}={query_id}")
    qv = np.asarray(q_row["v"], dtype=np.float64)
    rel_col = F.round(cosine_sim(F.col(vec_col), F.array(*[F.lit(float(x)) for x in qv])), 6)
    cand = (
        emb.where(F.col(id_col) != query_id)
        .select(
            F.col(id_col).alias("vec_id"),
            rel_col.alias("rel"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(n_candidates)
        .collect()
    )
    ids = np.array([r["vec_id"] for r in cand], dtype=np.int64)
    rel = np.array([r["rel"] for r in cand], dtype=np.float64)
    X = np.array([r["v"] for r in cand], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = np.round(Xn @ Xn.T, 6)

    selected: list[int] = []
    scores: list[float] = []
    remaining = list(range(len(ids)))
    for _ in range(min(k, len(ids))):
        if not selected:
            # first pick: pure relevance
            best = min(remaining, key=lambda i: (-rel[i], ids[i]))
            scores.append(float(rel[best]))
        else:
            max_sim = sims[np.ix_(remaining, selected)].max(axis=1)
            mmr = np.round(lam * rel[remaining] - (1.0 - lam) * max_sim, 6)
            order = sorted(
                range(len(remaining)), key=lambda t: (-mmr[t], ids[remaining[t]])
            )
            best = remaining[order[0]]
            scores.append(float(mmr[order[0]]))
        selected.append(best)
        remaining.remove(best)

    spark = emb.sparkSession
    rows = [
        (r + 1, int(ids[s]), float(scores[r])) for r, s in enumerate(selected)
    ]
    schema = T.StructType(
        [
            T.StructField("rank", T.IntegerType(), False),
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("score", T.DoubleType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def margin_mine(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 4,
    top_per_query: int = 1,
) -> DataFrame:
    """Margin-based candidate mining (Artetxe & Schwenk, ACL 2019 —
    the bitext-mining criterion): score a (query, candidate) pair not
    by raw cosine but by cosine RELATIVE to each side's neighborhood
    density, ``margin = cos(a,b) / (0.5*(avgtop_k(a) + avgtop_k(b)))``.
    Raw cosine retrieves hubs — vectors near everything; the margin
    denominator discounts them, which is why margin beats absolute
    thresholds for parallel-corpus mining and works as a general
    hubness-corrected retrieval score.

    Inputs: ``queries``/``candidates`` as ``(vec_id, embedding)``;
    the query side is broadcast (mining runs one direction at a
    time; at 100 TB you shard the candidate side and keep the query
    batch bounded). The backward average for a candidate is taken
    over THIS query batch — the standard minibatch approximation.

    Cross-engine exactness: cosines are binned to integer
    micro-units (round(cos*1e6) as BIGINT) so both top-k sums are
    exact integer window sums; the margin is then ONE division,
    ``2k*ci / (fwd_sum + bwd_sum)``, of exact longs — no float
    accumulation order crosses an engine boundary.

    Output: per query the ``top_per_query`` best-margin candidates:
    ``(src, tgt, cosine, margin, rank)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q = queries.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").cast("array<double>").alias("vq"),
    ).withColumn("nq", l2_norm("vq"))
    c = candidates.select(
        F.col("vec_id").alias("tgt"),
        F.col("embedding").cast("array<double>").alias("vc"),
    ).withColumn("nc", l2_norm("vc"))
    ci = F.round(
        F.aggregate(
            F.zip_with("vq", "vc", lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / (F.col("nq") * F.col("nc"))
        * F.lit(1_000_000.0),
        0,
    ).cast("long")
    pairs = (
        c.crossJoin(F.broadcast(q))
        .select("src", "tgt", ci.alias("ci"))
    )
    w_fwd = Window.partitionBy("src").orderBy(
        F.col("ci").desc(), F.col("tgt").asc()
    )
    w_bwd = Window.partitionBy("tgt").orderBy(
        F.col("ci").desc(), F.col("src").asc()
    )
    ranked = pairs.withColumn(
        "r_f", F.row_number().over(w_fwd)
    ).withColumn("r_b", F.row_number().over(w_bwd))
    fwd = (
        ranked.where(F.col("r_f") <= k)
        .groupBy("src")
        .agg(F.sum("ci").cast("long").alias("fwd_sum"))
    )
    bwd = (
        ranked.where(F.col("r_b") <= k)
        .groupBy("tgt")
        .agg(F.sum("ci").cast("long").alias("bwd_sum"))
    )
    margin = F.round(
        (F.lit(2 * k) * F.col("ci")).cast("double")
        / (F.col("fwd_sum") + F.col("bwd_sum")).cast("double"),
        6,
    )
    w_pick = Window.partitionBy("src").orderBy(
        (
            (F.lit(2 * k) * F.col("ci")).cast("double")
            / (F.col("fwd_sum") + F.col("bwd_sum")).cast("double")
        ).desc(),
        F.col("tgt").asc(),
    )
    return (
        pairs.join(F.broadcast(fwd), "src")
        .join(bwd, "tgt")
        .withColumn("margin", margin)
        .withColumn("rank", F.row_number().over(w_pick).cast("long"))
        .where(F.col("rank") <= top_per_query)
        .select(
            "src",
            "tgt",
            F.round(F.col("ci").cast("double") / 1_000_000.0, 6).alias(
                "cosine"
            ),
            "margin",
            "rank",
        )
    )
