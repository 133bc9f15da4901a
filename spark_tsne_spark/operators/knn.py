"""k-nearest-neighbor operators over an embedding table.

The reference computes all-pairs distances with an RDD ``cartesian``
and keeps the μ smallest per row with a bounded priority queue
(reference ``X2P.scala:24-32``). Three Spark-native strategies here:

- ``knn_exact_sql``: declarative crossJoin + `i<j` filter + window
  top-k — Catalyst-planned, duckdb-oracle-checkable, O(n²) shuffle.
  Right for correctness checks and small n.
- ``knn_exact_block``: broadcast the full matrix, compute block
  distances with numpy inside ``mapInPandas`` (Arrow batches ≈ the
  reference's ``.glom()`` blocks), top-μ via ``argpartition``. Same
  O(n²) flops but vectorized, no pair-explosion shuffle — the fast
  exact path.
- ``knn_lsh``: ``BucketedRandomProjectionLSH.approxSimilarityJoin``
  + window top-k — the 100 TB scale path (approximate; flagged in
  results via the ``exact=False`` contract).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from spark_tsne_spark.functions.vector import sq_dist_from_norms, l2_norm

KNN_SCHEMA = T.StructType(
    [
        T.StructField("i", T.LongType()),
        T.StructField("js", T.ArrayType(T.LongType())),
        T.StructField("ds", T.ArrayType(T.DoubleType())),
    ]
)


def with_norms(df: DataFrame, features: str = "features") -> DataFrame:
    """Attach the per-row L2 norm once (reference ``X2P.scala:20-21``)."""
    return df.withColumn("norm", l2_norm(features))


def knn_exact_sql(
    df: DataFrame, k: int, id_col: str = "id", features: str = "features"
) -> DataFrame:
    """Top-k nearest neighbors per row, fully declarative.

    crossJoin + ``i < j`` dedup + symmetric emit + window rank — the
    DataFrame translation of reference ``X2P.scala:24-32`` (X3-X6).
    Ties broken deterministically by neighbor id. Returns
    ``(i, j, dist)`` with ``rank <= k``.
    """
    # Cartesian output partitions = left × right partitions. Keep the
    # left side at cluster parallelism and collapse the right side to
    # one partition so the pair count is P×1, not P×P — tiny tasks are
    # pure overhead. (This path is the small-n/oracle path; block/LSH
    # are the scale paths.)
    par = df.sparkSession.sparkContext.defaultParallelism
    a = with_norms(df, features).select(
        F.col(id_col).alias("i"), F.col(features).alias("fa"), F.col("norm").alias("na")
    ).repartition(par)
    b = with_norms(df, features).select(
        F.col(id_col).alias("j"), F.col(features).alias("fb"), F.col("norm").alias("nb")
    ).coalesce(1)
    pairs = (
        a.crossJoin(b)
        .where(F.col("i") < F.col("j"))
        .select(
            "i",
            "j",
            sq_dist_from_norms("fa", "fb", "na", "nb").alias("dist"),
        )
    )
    sym = pairs.select("i", "j", "dist").unionAll(
        pairs.select(F.col("j").alias("i"), F.col("i").alias("j"), "dist")
    )
    w = Window.partitionBy("i").orderBy(F.col("dist").asc(), F.col("j").asc())
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("i", "j", "dist", "rank")
    )


def knn_exact_block(
    df: DataFrame,
    k: int,
    id_col: str = "id",
    features: str = "features",
    calibrate: tuple[float, float] | None = None,
) -> DataFrame:
    """Exact kNN via broadcast matrix + numpy block distances.

    Each Arrow batch computes ``‖x_b‖² + ‖X‖² − 2·X_b·Xᵀ`` against the
    broadcast full matrix and keeps the k smallest per row with
    ``argpartition`` (heap-like semantics of the reference's
    ``topByKey``, ``X2P.scala:32``). One narrow pass, no pair shuffle.

    ``calibrate=(perplexity, tol)`` fuses the per-row β bisection
    (``x2p._calibrate_row`` — the SAME function the standalone
    ``calibrate`` pass runs, so results are bit-identical) into this
    pass and returns ``(i, js, ps, beta)`` directly: one Python-worker
    stage instead of two chained ``mapInPandas``, skipping a full
    JVM↔Arrow round-trip of the (i, js, ds) neighbor table.

    Scale note: broadcast is n×d doubles — fine to ~10M×64; beyond
    that use ``knn_lsh``.
    """
    from spark_tsne_spark.shipping import ship_package

    ship_package(df.sparkSession)
    sel = df.select(
        F.col(id_col).alias("id"), F.col(features).cast("array<double>").alias("f")
    )
    try:
        # Arrow-native collect: the value buffer reshapes straight into
        # the broadcast matrix — no 50k/10M-element Python list detour
        # (the .toPandas().tolist() path is O(n·d) PyObjects on the
        # driver, which is the wrong shape for the ~10M-row broadcast
        # ceiling this operator is specified to).
        tbl = sel.toArrow()
        ids = tbl.column("id").to_numpy().astype(np.int64, copy=False)
        fcol = tbl.column("f").combine_chunks()
        # flatten() silently DROPS null list entries; if the drop count
        # happens to keep the total divisible by len(ids) the reshape
        # would succeed with ids/vectors misaligned — refuse nulls
        # (outer or element-level) loudly into the toPandas fallback.
        if fcol.null_count != 0 or fcol.values.null_count != 0:
            raise ValueError("null feature rows/elements: use slow path")
        X = np.asarray(fcol.flatten()).reshape(len(ids), -1).astype(
            np.float64, copy=False
        )
    except Exception:  # pragma: no cover - non-Arrow fallback
        pdf_all = sel.toPandas()
        ids = pdf_all["id"].to_numpy(dtype=np.int64)
        X = np.array(pdf_all["f"].tolist(), dtype=np.float64)
    ord_ = np.argsort(ids, kind="stable")  # sorted ids → searchsorted
    ids, X = ids[ord_], X[ord_]            # in workers, no O(n) dict
    sc = df.sparkSession.sparkContext
    b_ids = sc.broadcast(ids)
    b_X = sc.broadcast(X)
    b_sq = sc.broadcast((X * X).sum(axis=1))

    kk = k
    cal = calibrate
    log_u = math.log(cal[0]) if cal is not None else 0.0

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_tsne_spark.runtime import cached_shared_empty, tune_worker

        if cal is not None:
            from spark_tsne_spark.operators.x2p import _calibrate_rows

        tune_worker()
        X_all = b_X.value
        ids_all = b_ids.value
        sq_all = b_sq.value
        n_all = X_all.shape[0]
        # Fixed-size distance workspace (shared-anon mapping — see
        # runtime.py), reused across chunks and tasks: a fresh full
        # (batch × n) private buffer per task is page-fault-bound on
        # this host class. Chunk rows are budgeted at 256 MB per
        # buffer and capped at 256: per-chunk fixed costs (GEMM setup,
        # take_along_axis bookkeeping) amortize better with taller
        # chunks — measured 84 s → 47 s single-core full-pass at
        # n=50k going from 83- to 256-row chunks — while the budget
        # keeps the workspace bounded as the broadcast matrix grows
        # (n=10M → 4-row chunks, same 256 MB).
        CH = max(1, min(256, (256 * 2**20) // (8 * n_all)))
        # ONE workspace, process-cached: tasks after a worker's first
        # reuse the already-faulted mapping instead of zero-filling
        # fresh mmap per task, and the GEMM→distance transform runs
        # in-place in the GEMM output block (a second buffer doubled
        # the memory traffic of the pass for nothing — 32 concurrent
        # workers saturate this host's bandwidth, so every avoided
        # 100 MB stream is wall-clock)
        d_buf = cached_shared_empty("knn_d", (CH, n_all))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Xb = np.array(pdf["f"].tolist(), dtype=np.float64)
            my = pdf["id"].to_numpy()
            self_pos = np.searchsorted(ids_all, my)
            xb_sq = (Xb * Xb).sum(axis=1)
            kkk = min(kk, n_all - 1)
            out_js: list = []
            out_ds: list = []
            out_ps: list = []
            out_beta: list = []
            for lo in range(0, len(my), CH):
                hi = min(lo + CH, len(my))
                m = hi - lo
                d = d_buf[:m]
                np.dot(Xb[lo:hi], X_all.T, out=d)
                np.multiply(d, -2.0, out=d)
                d += sq_all[None, :]
                d += xb_sq[lo:hi, None]
                np.maximum(d, 0.0, out=d)
                d[np.arange(m), self_pos[lo:hi]] = np.inf  # exclude self
                # row-loop of 1-D argpartition, NOT the axis=1 form:
                # same introselect per row (bit-identical selection),
                # ~4x faster (measured 150ms -> 39ms per 83x50k chunk
                # — the 2-D path's strided index bookkeeping dominates)
                idx = np.empty((m, kkk), dtype=np.intp)
                for r in range(m):
                    idx[r] = np.argpartition(d[r], kkk - 1)[:kkk]
                part = np.take_along_axis(d, idx, axis=1)
                order = np.argsort(part, axis=1, kind="stable")
                sel = np.take_along_axis(idx, order, axis=1)
                # emit ndarray rows, not .tolist(): Arrow consumes
                # numpy cells directly — the 4.5M-element Python list
                # materialization was pure overhead
                out_js.extend(list(ids_all[sel]))
                dvals = np.take_along_axis(part, order, axis=1)
                if cal is None:
                    out_ds.extend(list(dvals))
                else:
                    betas, P = _calibrate_rows(dvals, log_u, cal[1])
                    out_ps.extend(list(P))
                    out_beta.extend(betas.tolist())
            if cal is None:
                yield pd.DataFrame({"i": my, "js": out_js, "ds": out_ds})
            else:
                yield pd.DataFrame(
                    {"i": my, "js": out_js, "ps": out_ps, "beta": out_beta}
                )

    # The fixture parquet often lands as ONE partition; spread the block
    # pass across the cluster (each task still sees a full broadcast X).
    par = df.sparkSession.sparkContext.defaultParallelism
    parts = max(1, min(par, -(-len(ids) // 256)))
    if cal is None:
        schema = KNN_SCHEMA
    else:
        from spark_tsne_spark.operators.x2p import CALIBRATED_SCHEMA

        schema = CALIBRATED_SCHEMA
    return (
        df.select(F.col(id_col).alias("id"), F.col(features).cast("array<double>").alias("f"))
        .repartition(parts)
        .mapInPandas(compute, schema)
    )


def derive_bucket_length(
    df: DataFrame,
    id_col: str = "id",
    features: str = "features",
    sample_rows: int = 1024,
    quantile: float = 0.5,
    seed: int = 42,
) -> float:
    """Derive an LSH ``bucketLength`` from the data's own distance scale.

    A fixed bucket length is data-blind: on embeddings scaled 100×,
    ``2.0`` puts every point in its own bucket and recall collapses;
    on embeddings scaled 0.01× everything lands in one bucket and the
    join degenerates to all-pairs. Instead, sample a bounded number of
    rows (deterministically: ``ORDER BY id LIMIT``, so the value is
    independent of parquet scan/split order — same contract as the IVF
    quantizer sample), draw seeded random pairs, and return a quantile
    of their euclidean distances. Projection buckets then have the
    width of a *typical* inter-point distance regardless of the data's
    units, so near neighbors (a fraction of that distance apart)
    collide with stable probability.

    Driver cost is one ≤``sample_rows``-row collect — the standard
    bounded-sample pattern, fine at 100 TB.
    """
    rows = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(features).cast("array<double>").alias("f"),
        )
        .orderBy("id")
        .limit(sample_rows)
        .collect()
    )
    if len(rows) < 2:
        return 2.0
    X = np.asarray([r["f"] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    m = len(X)
    ii = rng.integers(0, m, size=2048)
    jj = rng.integers(0, m, size=2048)
    keep = ii != jj
    diffs = X[ii[keep]] - X[jj[keep]]
    d = np.sqrt((diffs * diffs).sum(axis=1))
    d = d[d > 0]
    if d.size == 0:
        # all sampled points coincide — scale is undefined, any width works
        return 2.0
    return float(np.quantile(d, quantile))


def knn_lsh(
    df: DataFrame,
    k: int,
    id_col: str = "id",
    features: str = "features",
    bucket_length: float | None = None,
    num_hash_tables: int = 3,
    dist_threshold: float = float("inf"),
) -> DataFrame:
    """Approximate kNN via bucketed random-projection LSH.

    The 100 TB path: replaces the O(n²) cartesian with a bucket-join
    (SURVEY.md §7 Phase 5). Returns ``(i, j, dist)`` where ``dist`` is
    the *squared* euclidean distance for interface parity with the
    exact paths.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vec = df.select(
        F.col(id_col).alias("id"),
        array_to_vector(F.col(features).cast("array<double>")).alias("v"),
    )
    if bucket_length is None:
        bucket_length = derive_bucket_length(df, id_col, features)
    lsh = BucketedRandomProjectionLSH(
        inputCol="v",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(vec)
    joined = (
        model.approxSimilarityJoin(vec, vec, float(dist_threshold), distCol="eucl")
        .where(F.col("datasetA.id") != F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("i"),
            F.col("datasetB.id").alias("j"),
            (F.col("eucl") * F.col("eucl")).alias("dist"),
        )
    )
    w = Window.partitionBy("i").orderBy(F.col("dist").asc(), F.col("j").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("i", "j", "dist", "rank")
    )
