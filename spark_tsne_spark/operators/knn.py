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
  + window top-k — approximate, fine to mid-scale; its single-scalar
  buckets explode on clustered corpora (see below).
- ``knn_lsh_banded`` / ``knn_lsh_banded_lists``: band-amplified
  random-projection LSH with occupancy-tuned width and PER-BUCKET
  local top-k — the 100 TB path (measured at 1M rows;
  SCALE.md round-10 section).
"""

from __future__ import annotations

import math
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from spark_tsne_spark.functions.vector import sq_dist_from_norms, l2_norm

# fp32-GEMM candidate generation engages above this broadcast size
# (the block pass is memory-bandwidth-bound: 32 concurrent workers
# saturate this host's bus, so halving the bytes of the (CH × n)
# distance stream is wall-clock — measured on the 51.2k flagship
# affinity stage). Below the threshold the pass stays pure fp64:
# every golden / oracle-checked entry (sf0.01 catalog, sf0.1 bench
# tables, the X2P golden) runs under it, so their value hashes are
# untouched. SPARK_GRAFT_KNN_FP32=0 forces fp64 everywhere, =1
# forces fp32 (used by the equivalence tests).
KNN_FP32_MIN_N = 16384
# Extra fp32 candidates per row before the exact fp64 rescore. The
# final top-k is exact unless a true neighbor's fp32 distance ranks
# beyond k+PAD — fp32 rounding on O(1e2) squared distances is ~1e-4
# absolute, orders of magnitude below typical neighbor gaps, so 32
# slots of slack make a miss astronomically unlikely (and the
# equivalence test pins fp32≡fp64 neighbor sets on real data).
KNN_FP32_PAD = 32


# Dials the affinity pipeline's lsh_banded path uses (the catalog /
# operator defaults stay 8 tables / n_probe 1 = round-10 behavior,
# which the golden pins). Chosen from the measured 1M grid (SCALE.md
# round 11): 6 tables × 2 symmetric probes scores recall 0.963 —
# the QUALITY default (kNN recall bounds everything downstream of P;
# the 8×1 default's 0.791 is weak for a production embedding) at
# ~2.5–3.5× the 8×1 kNN stage, the same cost class as the r10
# 16-table escalation but with +0.002 recall and 2.7× less
# projection state. Cost-first callers pass num_tables=8, n_probe=1.
LSH_AFFINITY_TABLES = 6
LSH_AFFINITY_N_PROBE = 2


def _use_fp32(n_all: int) -> bool:
    v = os.environ.get("SPARK_GRAFT_KNN_FP32", "")
    if v == "0":
        return False
    if v == "1":
        return True
    return n_all >= KNN_FP32_MIN_N


def knn_workspace_spec(n_all: int) -> tuple[str, tuple[int, int], type]:
    """(name, shape, dtype) of the block pass's big process-cached
    distance workspace for an ``n_all``-row broadcast. Shared with
    bench.py's warm-up pre-fault: ``cached_shared_empty`` keys on
    exact (name, shape, dtype), so the warm-up must size the mapping
    with THIS function or the one-time zero-fill lands back inside
    the first timed run. Chunk rows are budgeted at 256 MB per
    buffer and capped at 256 (see the kernel comment)."""
    if _use_fp32(n_all):
        ch = max(1, min(256, (256 * 2**20) // (4 * n_all)))
        return "knn_d32", (ch, n_all), np.float32
    ch = max(1, min(256, (256 * 2**20) // (8 * n_all)))
    return "knn_d", (ch, n_all), np.float64


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

    Exactness caveat: at ``n ≥ KNN_FP32_MIN_N`` (default 16384)
    candidate generation runs in fp32 with an exact fp64 rescore of
    the best ``k + KNN_FP32_PAD`` candidates per row. The result is
    exact unless MORE than ``KNN_FP32_PAD`` (32) false candidates
    rank inside the fp32 top-(k+PAD) ahead of a true neighbor — i.e.
    on tie-dense data where >k+32 points sit within fp32 rounding
    (~1e-4 absolute on O(1e2) squared distances) of the k-th
    distance, a strictly closer neighbor CAN fall past the cut, so
    above the threshold the contract is near-certain rather than
    guaranteed. Callers needing strict exactness on heavily
    duplicated data set ``SPARK_GRAFT_KNN_FP32=0`` (pure fp64 at any
    n). Equivalence on real data is pinned by
    ``tests/test_r10_fixes.py``.
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
    # Workspace spec + the fp32 decision happen HERE on the driver and
    # ride the closure into the workers: _use_fp32 reads an env switch,
    # and worker processes inherit the JVM's environment from session
    # start — a test or bench toggling the variable after that would
    # silently not reach them. Driver-side evaluation also guarantees
    # every task of the pass takes the same branch.
    ws_name, (CH, _), ws_dt = knn_workspace_spec(len(ids))
    fp32 = ws_dt == np.float32

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
        # ONE workspace, process-cached: tasks after a worker's first
        # reuse the already-faulted mapping instead of zero-filling
        # fresh mmap per task, and the GEMM→distance transform runs
        # in-place in the GEMM output block (a second buffer doubled
        # the memory traffic of the pass for nothing — 32 concurrent
        # workers saturate this host's bandwidth, so every avoided
        # 100 MB stream is wall-clock)
        d_buf = cached_shared_empty(ws_name, (CH, n_all), ws_dt)
        if fp32:
            # Candidate generation in fp32 (halves the bytes of the
            # bandwidth-bound GEMM + distance stream), then an EXACT
            # fp64 rescore of k+PAD candidates per row — the emitted
            # neighbors and distances are fp64, same formula and
            # op order as the pure-fp64 branch.
            X32 = X_all.astype(np.float32)
            sq32 = (X32 * X32).sum(axis=1, dtype=np.float32)
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
                if fp32:
                    np.dot(Xb[lo:hi].astype(np.float32), X32.T, out=d)
                    np.multiply(d, np.float32(-2.0), out=d)
                    d += sq32[None, :]
                    d += xb_sq[lo:hi, None].astype(np.float32)
                else:
                    np.dot(Xb[lo:hi], X_all.T, out=d)
                    np.multiply(d, -2.0, out=d)
                    d += sq_all[None, :]
                    d += xb_sq[lo:hi, None]
                    np.maximum(d, 0.0, out=d)
                d[np.arange(m), self_pos[lo:hi]] = np.inf  # exclude self
                if fp32:
                    # top-(k+PAD) fp32 candidates per row, then exact
                    # fp64 rescore of just those: the tall (m × n)
                    # stream stays fp32, the final distances are the
                    # fp64 values the pure path computes (same
                    # -2ab + ‖a‖² + ‖b‖² op order, clamped at 0).
                    cand = min(kkk + KNN_FP32_PAD, n_all - 1)
                    cidx = np.empty((m, cand), dtype=np.intp)
                    for r in range(m):
                        cidx[r] = np.argpartition(d[r], cand - 1)[:cand]
                    Xc = X_all[cidx.reshape(-1)].reshape(m, cand, -1)
                    dc = np.einsum("md,mcd->mc", Xb[lo:hi], Xc)
                    dc *= -2.0
                    dc += sq_all[cidx]
                    dc += xb_sq[lo:hi, None]
                    np.maximum(dc, 0.0, out=dc)
                    idx = np.empty((m, kkk), dtype=np.intp)
                    for r in range(m):
                        idx[r] = np.argpartition(dc[r], kkk - 1)[:kkk]
                    part = np.take_along_axis(dc, idx, axis=1)
                    order = np.argsort(part, axis=1, kind="stable")
                    sel = np.take_along_axis(
                        cidx, np.take_along_axis(idx, order, axis=1), axis=1
                    )
                else:
                    # row-loop of 1-D argpartition, NOT the axis=1
                    # form: same introselect per row (bit-identical
                    # selection), ~4x faster (measured 150ms -> 39ms
                    # per 83x50k chunk — the 2-D path's strided index
                    # bookkeeping dominates)
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


# (plan semanticHash, dials) -> (tuned width, row count); see the
# memo note inside knn_lsh_banded_lists
_BANDED_WIDTH_MEMO: dict = {}

# Occupancy probes sample the projections above this row count (one
# deterministic hash-sample, persisted for the tune's lifetime), with
# a single FULL-table verification count at the accepted width — the
# tune's cost at 3.16M was ~15 min of full-table counts (VERDICT r12
# #7) for decisions a 262k-row sample makes identically (bucket
# counts scale by the sampling fraction; the over-cap threshold is
# ~340 sampled rows at 3.16M — far above counting noise). The
# threshold sits ABOVE 1M so the r11/r12 1M grid widths are
# reproduced bit-for-bit by full counts.
OCC_SAMPLE_MIN_N = 2_000_000
OCC_SAMPLE_ROWS = 262_144


def _kth_neighbor_floor(
    proj: DataFrame,
    k: int,
    sample_q: int = 256,
    quantile: float = 0.5,
    seed: int = 42,
) -> float:
    """Euclidean distance to the k-th nearest neighbor, as a quantile
    over a spread query sample — EXACT against the full corpus (one
    broadcast-query partial-top-k pass over the persisted projection
    table, the same kernel shape as the scale harness's ground-truth
    pass). This is the width tune's recall-class scale (VERDICT r12
    #1): a bounded ``ORDER BY id`` sample sees only inter-cloud
    distances on duplicate-dense data (expected sampled cloud
    co-members ≪ 1), so only an exact-vs-full pass can see the
    in-cloud neighbor scale that bucket widths must not undercut.

    Cost: O(n · sample_q · d) flops distributed over the cached
    projections plus a (tasks × sample_q × k)-doubles driver merge —
    both bounded; computed lazily, only when the occupancy tune is
    about to take its first halving (never at golden/bench scales,
    where no bucket can exceed ``max_bucket``).
    """
    rows = (
        proj.select("id", "f")
        .orderBy(F.xxhash64("id", F.lit(int(seed))), "id")
        .limit(int(sample_q))
        .collect()
    )
    if len(rows) < 2:
        return 0.0
    qids = np.asarray([r["id"] for r in rows], dtype=np.int64)
    Q = np.asarray([r["f"] for r in rows], dtype=np.float64)
    qsq = (Q * Q).sum(axis=1)
    sc = proj.sparkSession.sparkContext
    b_q = sc.broadcast((qids, Q, qsq))
    kq = int(k)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, Qm, qs = b_q.value
        best: list[np.ndarray] = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["f"].tolist(), dtype=np.float64)
            xids = pdf["id"].to_numpy()
            # (rows × queries) squared distances; exclude self by id
            D = X @ Qm.T
            D *= -2.0
            D += qs[None, :]
            D += (X * X).sum(axis=1)[:, None]
            D[xids[:, None] == ids_q[None, :]] = np.inf
            m = min(kq, D.shape[0])
            best.append(np.partition(D, m - 1, axis=0)[:m])
        if not best:
            return
        allb = np.concatenate(best, axis=0)
        m = min(kq, allb.shape[0])
        top = np.partition(allb, m - 1, axis=0)[:m]
        yield pd.DataFrame(
            {
                "q": np.arange(top.shape[1], dtype=np.int64),
                "ds": list(top.T),
            }
        )

    parts = (
        proj.select("id", "f")
        .mapInPandas(partial, "q long, ds array<double>")
        .collect()
    )
    per_q: dict[int, list] = {}
    for r in parts:
        per_q.setdefault(int(r["q"]), []).append(
            np.asarray(r["ds"], dtype=np.float64)
        )
    kth = []
    for qi, chunks in per_q.items():
        d = np.concatenate(chunks)
        m = min(kq, d.size)
        kth.append(np.partition(d, m - 1)[m - 1])
    b_q.destroy()
    if not kth:
        return 0.0
    # squared -> euclidean (the width/derive scale)
    return float(np.sqrt(max(0.0, np.quantile(np.asarray(kth), quantile))))


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


def knn_lsh_banded_lists(
    df: DataFrame,
    k: int,
    id_col: str = "id",
    features: str = "features",
    num_tables: int = 8,
    band_size: int = 4,
    bucket_width: float | None = None,
    width_quantile: float = 0.15,
    max_bucket: int = 4096,
    occupancy_target: float = 1 / 3,
    n_probe: int = 1,
    probe_index: bool = True,
    probe_tau: float | None = None,
    seed: int = 42,
    check_coverage: bool = False,
    resources: list | None = None,
    width_floor_scale: float = 2.0,
    width_floor_quantile: float = 0.5,
    width_floor_sample: int = 256,
    dense_shard_scale: float = 2.0,
    table_groups: int = 1,
) -> DataFrame:
    """Approximate kNN via banded random-projection LSH with
    PER-BUCKET local top-k — the million-row-and-up path.

    Why not :func:`knn_lsh` (MLlib ``approxSimilarityJoin``) at this
    scale: MLlib buckets on ONE scalar projection per hash table, so
    a clustered corpus lands whole clusters in single buckets and the
    join enumerates O(Σ bucket²) candidate ROWS with no cap — at 1M
    rows that is 10⁹+ JVM pair rows per table (measured: 197 s and
    0.13 recall at 200k for a pair-join formulation of this very
    operator before this design). Two ideas fix both the cost and the
    recall:

    1. **Band amplification with occupancy-tuned width.** AND over
       ``band_size`` projections per table (selective buckets), OR
       over ``num_tables`` tables (recall back up) — the MinHash
       banding scheme (`operators/dedup.py`) transplanted to p-stable
       projections. A sampled-distance width is cluster-blind (random
       pairs are inter-cluster; the near scale can sit 100× below
       their quantile), so the width AUTO-TUNES against the data: the
       raw projections are computed once and cached, then the width
       halves (JVM-only re-bucket + count per probe) until at most
       ``occupancy_target`` of (row, table) assignments sit in
       over-``max_bucket`` buckets. Scale-free, no distance prior.
       The target is deliberately PERMISSIVE (default 1/3, not a few
       percent): gating costs a point only the tables where its
       bucket overflows — the other tables still cover it — while
       over-narrow widths split every point's neighborhood on every
       table. Measured at 200k/cap 4096: the width carrying 29%
       gated assignments scores recall **0.94**; one halving further
       (0% gated) scores 0.72 — a 5% target walks straight past the
       optimum (the full width-recall curve is in SCALE.md r10).
    2. **Per-bucket local top-k instead of a pair join.** Within each
       (table, bucket) group a numpy kernel computes the member×member
       distance block (vectorized GEMM, ≤ max_bucket² doubles =
       134 MB at the 4096 default — bounded worker transient; the
       cap needs headroom above the data's natural neighborhood
       size, or the occupancy auto-tune narrows the width until
       neighborhoods FRAGMENT and recall collapses — measured 0.72 →
       0.21 at 1M rows with a 1024 cap on 500-member clusters) and
       emits only each member's k nearest IN THAT BUCKET. If j is
       among i's true global top-k and lands in i's bucket, fewer
       than k bucket members can be closer, so j survives — the
       bucket-local cut loses NO recall vs enumerating all in-bucket
       pairs, while shuffle volume drops from Σ bucket² pair rows to
       ≤ n·L·k thin rows plus one n·L carry of the vectors (linear in
       n — the 100 TB shape).

    Buckets larger than ``max_bucket`` are SHARD-SALTED, not dropped:
    a one-pass JVM count over the cached projections finds over-cap
    (table, bucket) groups (few by construction — the width auto-tune
    bounds over-cap assignments to ``occupancy_target``, so at most
    ``n·L·target / max_bucket`` buckets, a broadcast-sized list), and
    their members are split into ``ceil(c / max_bucket)`` deterministic
    hash shards. Each shard runs the same bounded local top-k, so (a)
    no pandas group ever materializes more than ~``max_bucket`` rows
    of vectors in one worker (the pre-r11 gate let a degenerate
    bucket ship n·L/3 rows to one task before dropping them — an OOM
    risk exactly on clustered corpora), (b) members of mega-clusters
    (e.g. duplicate-heavy corpora, where every width puts all copies
    in one bucket on every table) still get neighbors — from a random
    ~max_bucket-member subset of their cluster — instead of silently
    vanishing from the output, the row-loss mode SCALE.md documents
    for the MLlib path. A residual ``2·max_bucket`` in-kernel gate
    remains as a pure safety backstop (hash-deviation overshoot past
    2× expected shard size is astronomically unlikely).

    **Multi-probe** (``n_probe`` > 1): each table also sends every
    row to QUERY the bucket(s) across its nearest band boundaries —
    the coordinate(s) whose fractional position is closest to a floor
    edge, shifted ±1 toward it (Lv et al.'s multi-probe LSH, the
    step-wise probing sequence restricted to single-coordinate
    perturbations). Quantization's loss mode is exactly boundary
    splits, so probing recovers recall like extra tables do, but
    without new projections and targeted where the split happened.
    ``probe_index`` picks the probing symmetry, and BOTH variants
    were measured at 1M rows (SCALE.md r11, L=8, n_probe=2):
    symmetric (True, default — probes are indexed AND querying)
    recall 0.986 @ 3.0× the single-probe cost; asymmetric (False —
    probes query the target bucket's base members without becoming
    candidates, the classic Lv et al. shape) 0.922 @ 2.8×. The
    textbook GEMM argument for asymmetry barely shows because this
    operator is SHUFFLE-bound, not GEMM-bound, at these dials — and
    symmetry's extra probe↔probe collisions (pairs split on a
    boundary in BOTH rows' assignments) carry real recall — so
    symmetric is the default and the efficient frontier combines it
    with FEWER tables (see the num_tables×n_probe grid in SCALE.md).
    Shuffle volume scales with ``n_probe`` (assignments = n·L·n_probe
    rows). ``n_probe=1`` (default) is the round-10 behavior bit-for-
    bit. Measured at 1M rows in SCALE.md (round 11).

    ``check_coverage=True`` adds one thin eager job (ids × tables,
    no vectors) counting rows whose every assignment is a singleton
    bucket — such rows produce no output — and warns with the exact
    count. The distributed t-SNE path gets the same surfacing for
    free (``api._prepare`` compares adjacency ids against n).

    ``probe_tau`` (multi-probe only): emit a probe row ONLY when the
    flipped coordinate is within ``probe_tau`` width-fractions of its
    floor boundary (``d < tau``, ``d`` ∈ [0, 0.5]). Rows deep inside
    their cells — whose boundary-crossing neighbors the probe would
    rarely recover — skip the probe entirely, cutting probe-bucket
    population (and the occupancy compounding that makes n_probe=2
    cost ~3× rather than ~2×) while keeping the aimed recovery pairs,
    which by construction straddle a boundary and therefore have
    small ``d`` on at least one side. ``None`` (default) or ≥ 0.5
    keeps every probe (round-11 behavior, bit-identical). Pure JVM
    ``when()``/``filter()`` on the assignment array. Measured at 1M
    (SCALE.md round 12 grid).

    ``bucket_width``: explicit widths are used AS-IS since round 11
    (quantile-width semantics, matching :func:`knn_lsh`'s
    ``bucket_length``). Before round 11 an explicit width was
    silently doubled; callers who tuned widths under the old
    semantics must re-derive them (same inputs now bucket at half
    the effective width). The ×2 headroom still applies to the
    auto-DERIVED width, where the occupancy tune can walk it back.

    ``resources``: optional list; the operator appends its persisted
    projection DataFrame so callers can unpersist it once the output
    is materialized (otherwise it stays cached until LRU eviction —
    fine for one-shot queries, wasteful inside long sessions).

    **Recall floor on the width tune** (round 13, VERDICT r12 #1):
    the occupancy rule alone is a FLOPS budget, and on duplicate-dense
    corpora it walks the width below the data's own neighbor scale —
    measured at 3.16M rows (1580-member jitter clouds): recall@90
    0.9627 at 1M → 0.50 at 3.16M because the extra density bought one
    extra halving (SCALE.md r12). The tune now refuses any halving
    that would take the width below ``width_floor_scale ×`` the
    ``width_floor_quantile`` of the sampled EXACT k-th-neighbor
    distance (:func:`_kth_neighbor_floor` — exact against the full
    corpus; a bounded row sample cannot see in-cloud distances). When
    the floor BINDS, the remaining over-cap buckets are known to be
    natural neighborhoods, so the shard-sizing cap scales by
    ``dense_shard_scale`` (their random slicing is then the dominant
    recall loss; the per-group GEMM transient grows with the cap
    squared — 134 MB → 537 MB at defaults). Both knobs are inert
    whenever the floor is not consulted or does not bind: the floor
    is computed lazily at the first would-be halving (impossible at
    golden/bench scales where n < max_bucket), and the 1M grid stops
    by occupancy before the floor binds, so all pinned goldens and
    the r11/r12 1M widths are bit-identical. ``width_floor_scale=0``
    disables the floor (pre-round-13 behavior). Occupancy probes
    above ``OCC_SAMPLE_MIN_N`` rows run on a deterministic hash
    sample with one full-table verification count (VERDICT r12 #7).

    Deterministic for a fixed seed. Returns NEIGHBOR LISTS
    ``(i, js, ds)`` sorted by (squared distance, neighbor id) — the
    shape the affinity calibration consumes directly (the flat-row
    wrapper :func:`knn_lsh_banded` explodes it for contract parity
    with the exact paths).
    """
    import warnings

    from spark_tsne_spark.shipping import ship_package

    spark = df.sparkSession
    ship_package(spark)
    L, B, sd = int(num_tables), int(band_size), int(seed)
    NP = max(1, min(int(n_probe), B + 1))
    # d = least(frac, 1-frac) never exceeds 0.5, so tau >= 0.5 is the
    # ungated round-11 behavior and needs no filter in the plan.
    tau = None
    if probe_tau is not None and NP > 1 and float(probe_tau) < 0.5:
        tau = float(probe_tau)

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_tsne_spark.runtime import tune_worker

        tune_worker()
        R = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["f"].tolist(), dtype=np.float64)
            if R is None:
                # seeded per-worker: identical directions everywhere
                R = np.random.default_rng(sd).normal(size=(X.shape[1], L * B))
            P = X @ R
            yield pd.DataFrame(
                {"id": pdf["id"], "f": pdf["f"], "p": list(P)}
            )

    sel = df.select(
        F.col(id_col).alias("id"),
        F.col(features).cast("array<double>").alias("f"),
    )
    proj = sel.mapInPandas(
        project, "id long, f array<double>, p array<double>"
    ).persist()
    if resources is not None:
        resources.append(proj)

    def with_assignments(
        w: float,
        cols: list,
        src: DataFrame | None = None,
        tables: tuple[int, int] | None = None,
    ) -> DataFrame:
        # DataFrame of ``cols`` + one (t, b, q) row per assignment:
        # every (table, bucket-hash, role) assignment for width ``w``.
        # Base bucket (role 0: indexed AND querying): xxhash64 over the
        # table's B floored band cells + the table index. Probe
        # buckets (n_probe > 1, role 1: querying only — ASYMMETRIC
        # multi-probe, Lv et al.): the r-th probe flips the single
        # band coordinate with the r-th smallest distance to a floor
        # boundary, ±1 toward that boundary. Visitors search a
        # bucket's members without being candidates there, so the
        # per-bucket GEMM grows linearly with n_probe instead of
        # quadratically (measured at 1M: symmetric probing cost 3.0×
        # the single-probe run; asymmetric delivers the same
        # boundary-recovery pairs for ~2×). All pure JVM expressions,
        # so the width probes below never re-run the Python
        # projection pass.
        #
        # TABLE-EXPLODED, not per-table-inlined (optimization round
        # 12): the table index is exploded FIRST (n·L rows — exactly
        # the volume every consumer explodes to anyway) and one
        # table's cells/probe-candidates are computed per row with
        # ``element_at(p, t·B+b+1)``, so the expression tree is
        # constant in L instead of repeating the full array_sort
        # subtree ~2B+1 times for each of L tables. The inlined form
        # spent more wall-clock CONSTRUCTING (~5-6 s of py4j calls)
        # and planning the 6×2 tree than running the kernel
        # (measured: mp bench entry 7.5 s vs sp 2.1 s at sf0.1 for
        # 1.5× the assignment volume; a withColumns staging variant
        # was built first and REJECTED — the optimizer churned 5-7 s
        # per query on the staged tree). Values are bit-identical:
        # same floors, same struct sort order, same xxhash64 inputs
        # (t was an int literal, is now the exploded int column) —
        # pinned by the unchanged banded-LSH goldens.
        probe_role = 0 if probe_index else 1
        src = proj if src is None else src
        wl = F.lit(float(w))
        tcol = F.col("_t")
        cells = [
            F.floor(F.element_at("p", tcol * B + b + 1) / wl)
            for b in range(B)
        ]
        elems = [
            F.struct(
                tcol.alias("t"),
                F.xxhash64(tcol, *cells).alias("b"),
                F.lit(0).alias("q"),
            )
        ]
        gates: list = [None]
        if NP > 1:
            fr = [
                F.element_at("p", tcol * B + b + 1) / wl - cells[b]
                for b in range(B)
            ]
            cand = F.array_sort(
                F.array(
                    *[
                        F.struct(
                            F.least(fr[b], F.lit(1.0) - fr[b]).alias("d"),
                            F.lit(b).alias("c"),
                            F.when(fr[b] < 0.5, F.lit(-1))
                            .otherwise(F.lit(1))
                            .cast("long")
                            .alias("s"),
                        )
                        for b in range(B)
                    ]
                )
            )
            for r in range(NP - 1):
                pc = [
                    cells[b]
                    + F.when(
                        cand.getItem(r)["c"] == b, cand.getItem(r)["s"]
                    ).otherwise(F.lit(0))
                    for b in range(B)
                ]
                elems.append(
                    F.struct(
                        tcol.alias("t"),
                        F.xxhash64(tcol, *pc).alias("b"),
                        F.lit(probe_role).alias("q"),
                    )
                )
                gates.append(
                    cand.getItem(r)["d"] < F.lit(tau)
                    if tau is not None
                    else None
                )
        if all(g is None for g in gates):
            arr = F.array(*elems)
        else:
            # Gated probes: null out below-the-gate elements, then
            # drop the nulls — explode never sees them, so every
            # downstream consumer (width probes, over-cap scan,
            # coverage, the main thin assignment table) prices the
            # REDUCED probe population.
            arr = F.filter(
                F.array(
                    *[
                        e if g is None else F.when(g, e)
                        for e, g in zip(elems, gates)
                    ]
                ),
                lambda s: s.isNotNull(),
            )
        t_lo, t_hi = tables if tables is not None else (0, L - 1)
        return (
            src.select(
                *cols,
                "p",
                F.explode(F.sequence(F.lit(t_lo), F.lit(t_hi))).alias("_t"),
            )
            .select(*cols, F.explode(arr).alias("a"))
            .select(
                *cols,
                F.col("a.t").alias("t"),
                F.col("a.b").alias("b"),
                F.col("a.q").alias("q"),
            )
        )

    n = None
    if bucket_width is None:
        # Session-scoped width memo: the derive (bounded sample
        # collect) + occupancy probes (eager JVM counts over the
        # cached projections) are pure functions of (input plan,
        # dials) — on repeat calls over the same input they are fixed
        # overhead that can dominate small inputs (measured: the
        # sf0.1 bench entry spent ~6 of 8.3 s re-tuning an unchanged
        # width; VERDICT r11). The memo returns bit-identical widths
        # to recomputation; stale only if the data under an identical
        # plan changes mid-session (same caveat as any cached scan).
        try:
            memo_key = (
                df.semanticHash(), id_col, features, L, B, NP, tau,
                float(width_quantile), int(max_bucket),
                float(occupancy_target), sd, int(k),
                float(width_floor_scale or 0.0),
                float(dense_shard_scale),
            )
        except Exception:  # pragma: no cover - semanticHash missing
            memo_key = None
        if memo_key is not None and memo_key in _BANDED_WIDTH_MEMO:
            w, n, floor_bound = _BANDED_WIDTH_MEMO[memo_key]
        else:
            n = proj.count()
            w = derive_bucket_length(
                df, id_col, features, quantile=width_quantile, seed=sd
            ) * 2.0
            # Occupancy-driven auto-tune with a RECALL-CLASS FLOOR
            # (VERDICT r12 #1): halve until oversized buckets hold at
            # most occupancy_target of assignments, but never past
            # ``width_floor_scale ×`` the (sampled, exact-vs-full)
            # k-th-neighbor distance quantile. The pure-flops rule
            # collapsed on duplicate-dense corpora: at 3.16M rows
            # (1580-member jitter clouds) it halved one grid step
            # below the in-cloud neighbor scale and recall@90 fell
            # 0.96 → 0.50 (SCALE.md r12; reproduced structurally in
            # scripts/sim_lsh_width.py — the tune's stop width and
            # both measured recalls match the simulator within noise).
            # The floor is lazy: computed only when the first halving
            # is about to happen, so golden/bench-scale inputs (where
            # no bucket can exceed max_bucket) never pay it and keep
            # bit-identical widths.
            #
            # Probes above OCC_SAMPLE_MIN_N run on a deterministic
            # hash-sample of rows (VERDICT r12 #7 — the 3.16M tune
            # spent ~15 min on full-table counts) with the over-cap
            # threshold scaled by the realized sampling fraction, then
            # ONE full-table verification count at the accepted width;
            # if the sample under-halved, full-count halving resumes
            # (floor still enforced).
            floor_w: float | None = None
            floor_bound = False
            src = None
            s_n = n
            cap_s = int(max_bucket)
            if n >= OCC_SAMPLE_MIN_N:
                M = 1 << 20
                keep = max(1, (M * OCC_SAMPLE_ROWS) // n)
                src = proj.where(
                    F.pmod(F.xxhash64("id", F.lit(4099)), F.lit(M)) < keep
                ).persist()
                s_n = src.count()
                cap_s = max(1, int(max_bucket * (s_n / n)))

            def _over_at(width: float, full: bool) -> int:
                source = proj if (full or src is None) else src
                cap = int(max_bucket) if (full or src is None) else cap_s
                bk = with_assignments(width, [], src=source).select("t", "b")
                return (
                    bk.groupBy("t", "b")
                    .agg(F.count("*").alias("c"))
                    .where(F.col("c") > cap)
                    .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("s"))
                    .first()["s"]
                )

            def _floor() -> float:
                return float(width_floor_scale) * _kth_neighbor_floor(
                    proj, int(k), sample_q=width_floor_sample,
                    quantile=width_floor_quantile, seed=sd,
                )

            dbg = os.environ.get("SPARK_GRAFT_LSH_DEBUG") == "1"
            for _ in range(12):
                over = _over_at(w, full=False)
                if dbg:
                    print(
                        f"# lsh_tune w={w:.6g} over={over} "
                        f"target={occupancy_target * s_n * L * NP:.0f} "
                        f"floor={floor_w}",
                        flush=True,
                    )
                if over <= occupancy_target * s_n * L * NP:
                    break
                if width_floor_scale and floor_w is None:
                    floor_w = _floor()
                    if dbg:
                        print(f"# lsh_tune floor_w={floor_w:.6g}", flush=True)
                if floor_w is not None and w / 2.0 < floor_w:
                    floor_bound = True
                    break
                w /= 2.0
            if src is not None:
                # full-table verification of the sampled decision
                for _ in range(4):
                    over = _over_at(w, full=True)
                    if dbg:
                        print(
                            f"# lsh_tune verify w={w:.6g} over={over} "
                            f"target={occupancy_target * n * L * NP:.0f}",
                            flush=True,
                        )
                    if over <= occupancy_target * n * L * NP:
                        break
                    if width_floor_scale and floor_w is None:
                        floor_w = _floor()
                    if floor_w is not None and w / 2.0 < floor_w:
                        floor_bound = True
                        break
                    w /= 2.0
                src.unpersist()
            if memo_key is not None:
                if len(_BANDED_WIDTH_MEMO) >= 64:
                    _BANDED_WIDTH_MEMO.clear()
                _BANDED_WIDTH_MEMO[memo_key] = (w, n, floor_bound)
    else:
        # used as-is (quantile-width semantics like knn_lsh's
        # bucket_length); the ×2 headroom applies only to the
        # DERIVED quantile above
        w = float(bucket_width)
        floor_bound = False

    kk = int(k)
    # Shard sizing cap: when the recall floor BOUND the tune (the
    # duplicate-dense regime — over-cap buckets are NATURAL
    # NEIGHBORHOODS, not hash accidents), random shard-slicing of
    # those clouds is the remaining recall loss (P(neighbor in my
    # shard) = 1/nsh per table), so the shard cap scales by
    # ``dense_shard_scale``: measured in the structural simulator at
    # 3.16M, recall@90 0.891 (cap 4096) → 0.956 (cap 8192) at the
    # floor-stop width. The per-group GEMM transient grows with the
    # cap's square (134 MB → 537 MB at the default k/d) — bounded and
    # only paid in the regime that needs it; max_bucket itself (and
    # every non-floor-bound caller, including all goldens and the 1M
    # grid) is unchanged.
    mb = int(max_bucket)
    shard_cap = int(max_bucket * dense_shard_scale) if floor_bound else mb

    # Hot-bucket shard map: over-cap (t, b) groups and their shard
    # counts, computed JVM-side from the cached projections (thin
    # pass, no vectors) and broadcast — by the occupancy bound there
    # are at most n·L·NP·target / max_bucket such buckets (~650 at 1M
    # rows, defaults), so the broadcast is tiny.
    thin = with_assignments(w, []).select("t", "b", "q")
    over_caps = (
        thin.groupBy("t", "b")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") > shard_cap)
        .select("t", "b", F.ceil(F.col("c") / F.lit(shard_cap)).alias("nsh"))
    )

    def _exploded(tables: tuple[int, int] | None = None) -> DataFrame:
        return (
            with_assignments(w, ["id", "f"], tables=tables)
            .join(F.broadcast(over_caps), ["t", "b"], "left")
            .withColumn(
                "shard",
                F.pmod(
                    F.xxhash64("id", "t", "b", F.lit(1313)),
                    F.coalesce(F.col("nsh"), F.lit(1)),
                ),
            )
        )

    exploded = _exploded()

    if check_coverage:
        if n is None:
            n = proj.count()
        # a row is covered only if some bucket it QUERIES holds ≥1
        # OTHER candidate (role-0 MEMBER): member assignments (q=0)
        # need a second member, probe visitors (q=1) need any member —
        # counting visitors toward occupancy undercounted dropped rows
        # in asymmetric mode (ADVICE r11)
        mcounts = (
            thin.where(F.col("q") == 0)
            .groupBy("t", "b")
            .agg(F.count("*").alias("mc"))
        )
        covered = (
            with_assignments(w, ["id"])
            .join(mcounts, ["t", "b"], "left")  # bucket-count table is
            # O(n·L·NP) rows at scale — shuffle join, not broadcast
            .where(
                F.coalesce(F.col("mc"), F.lit(0))
                >= F.when(F.col("q") == 0, F.lit(2)).otherwise(F.lit(1))
            )
            .select("id")
            .distinct()
            .count()
        )
        if covered < n:
            warnings.warn(
                f"knn_lsh_banded: {n - covered} of {n} rows share no "
                "bucket with any other row (singleton in every table) "
                "and will produce no neighbors; raise num_tables / "
                "n_probe or widen bucket_width to cover them",
                stacklevel=2,
            )

    def bucket_topk(tbl):
        # ARRAY-PACKED emission (one row per query per bucket, k-long
        # arrays) — the flat alternative is n·L·k shuffle ROWS, which
        # at 1M rows × 8 tables × k=90 is 7×10⁸ rows of per-row
        # shuffle overhead; packed it is n·L rows carrying the same
        # bytes.
        #
        # Asymmetric roles: BASE members (q=0) are both candidates and
        # queries; probe VISITORS (q=1) query the bucket's members but
        # are not candidates in it — the GEMM is (queries × members),
        # so multi-probe grows the per-bucket work linearly, not
        # quadratically. With n_probe=1 every row is a member and this
        # reduces exactly to the round-10 all-pairs kernel (same GEMM,
        # same selection — pinned by the unchanged golden).
        #
        # applyInARROW, not applyInPandas: this kernel was measured
        # materialization-bound, not GEMM-bound (the fp32-GEMM variant
        # moved nothing; SCALE.md r11) — the Arrow list column
        # flattens into the (m × d) numpy matrix with one buffer view
        # + one reshape instead of a pandas Series of per-row
        # ndarrays, and the emission builds ListArrays straight from
        # the flat result buffers.
        import pyarrow as pa

        from spark_tsne_spark.runtime import tune_worker

        tune_worker()
        m = tbl.num_rows
        empty = pa.table(
            {
                "i": pa.array([], type=pa.int64()),
                "js": pa.array([], type=pa.list_(pa.int64())),
                "ds": pa.array([], type=pa.list_(pa.float64())),
            }
        )
        # singleton shards carry no pairs; the 2·shard_cap gate is a
        # memory backstop only — shard sizing bounds E[m] ≤ shard_cap,
        # and a 2× hash-deviation overshoot at cap 4096 has vanishing
        # probability
        if m < 2 or m > 2 * shard_cap:
            return empty
        ids = tbl.column("id").to_numpy()
        roles = tbl.column("q").to_numpy()
        fcol = tbl.column("f")
        if isinstance(fcol, pa.ChunkedArray):
            fcol = fcol.combine_chunks()
        # flatten() honors list offsets/slices; feature arrays are
        # non-null fixed-d by construction (cast upstream)
        X = np.asarray(fcol.flatten()).reshape(m, -1)
        # sort by id: group arrival order is shuffle-dependent, and
        # argpartition under exact distance ties would otherwise pick
        # arrival-dependent neighbor SETS — sorted input makes the
        # whole operator deterministic for a fixed seed
        order = np.argsort(ids, kind="stable")
        ids, roles, X = ids[order], roles[order], X[order]
        mem = roles == 0
        mm = int(mem.sum())
        if mm < 1:
            return empty
        Xm = X[mem]
        idm = ids[mem]
        sq = (X * X).sum(axis=1)
        sqm = sq[mem]
        kl = min(kk, mm)
        if kl < 1:
            return empty
        D = X @ Xm.T
        D *= -2.0
        D += sqm[None, :]
        D += sq[:, None]
        np.maximum(D, 0.0, out=D)
        # self-exclusion: ids are unique within a (t, b) group (one
        # assignment per id per bucket), so the id-equality mask is
        # exactly the member rows' own columns
        D[ids[:, None] == idm[None, :]] = np.inf
        idx = np.argpartition(D, kl - 1, axis=1)[:, :kl]
        dv = np.take_along_axis(D, idx, axis=1)
        jv = idm[idx]
        valid = np.isfinite(dv)  # member rows carry one inf self-slot
        # offsets in int64 first: at extreme dials (max_bucket·k both
        # raised) m·kl can exceed 2^31 and an int32 arange would wrap
        # SILENTLY, emitting corrupt ListArray offsets (ADVICE r11)
        assert m * kl < 2**31, (
            f"bucket emission too large for int32 list offsets "
            f"(m={m}, k={kl}); lower max_bucket or k"
        )
        if valid.all():
            offs = pa.array(
                np.arange(0, (m + 1) * kl, kl, dtype=np.int64).astype(np.int32),
                type=pa.int32(),
            )
            return pa.table(
                {
                    "i": pa.array(ids, type=pa.int64()),
                    "js": pa.ListArray.from_arrays(offs, pa.array(jv.reshape(-1))),
                    "ds": pa.ListArray.from_arrays(offs, pa.array(dv.reshape(-1))),
                }
            )
        counts = valid.sum(axis=1)
        keep_rows = counts > 0
        offs = np.zeros(int(keep_rows.sum()) + 1, dtype=np.int64)
        offs[1:] = np.cumsum(counts[keep_rows])
        offs_a = pa.array(offs.astype(np.int32), type=pa.int32())
        return pa.table(
            {
                "i": pa.array(ids[keep_rows], type=pa.int64()),
                "js": pa.ListArray.from_arrays(offs_a, pa.array(jv[valid])),
                "ds": pa.ListArray.from_arrays(offs_a, pa.array(dv[valid])),
            }
        )

    def merge_lists(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-row numpy merge of ≤ L·NP candidate arrays: dedupe ids
        # (the same (i, j) surfaces from several tables — per-bucket
        # GEMM summation order can differ, so keep the smallest dist),
        # exact top-k, ties by neighbor id ascending — same ordering
        # contract as the exact paths.
        #
        # MEASURED SHAPE CHOICE (round 11): a whole-batch "vectorized"
        # rewrite (flatten all rows, two global 3-key lexsorts,
        # segment splits) was built, pinned byte-identical, and
        # REJECTED: at the real task shape (31,250 rows × 8 lists ×
        # k=90 = 22.5M flat candidates per task) the two global
        # lexsorts alone cost ~37 s vs ~7.4 s TOTAL for this loop —
        # 31k tiny lexsorts over ~720 cache-resident elements beat
        # full-width multi-key sorts (SCALE.md r11). The loop is
        # linear, bounded, and the stage stays ~25% of the 1M kNN
        # wall.
        for pdf in batches:
            out_i, out_js, out_ds = [], [], []
            for i, jss, dss in zip(pdf["i"], pdf["jss"], pdf["dss"]):
                js = np.concatenate([np.asarray(a, dtype=np.int64) for a in jss])
                ds = np.concatenate([np.asarray(a) for a in dss])
                order = np.lexsort((js, ds))
                js, ds = js[order], ds[order]
                uj, first = np.unique(js, return_index=True)
                # keep each id's best (first in (dist, j) order)
                js, ds = js[np.sort(first)], ds[np.sort(first)]
                order = np.lexsort((js, ds))[: kk]
                out_i.append(i)
                out_js.append(js[order])
                out_ds.append(ds[order])
            yield pd.DataFrame({"i": out_i, "js": out_js, "ds": out_ds})

    def _merge(local_df: DataFrame) -> DataFrame:
        return (
            local_df.groupBy("i")
            .agg(
                F.collect_list("js").alias("jss"),
                F.collect_list("ds").alias("dss"),
            )
            .mapInPandas(merge_lists, "i long, js array<long>, ds array<double>")
        )

    groups = max(1, min(int(table_groups), L))
    if groups == 1:
        local = exploded.groupBy("t", "b", "shard").applyInArrow(
            bucket_topk, "i long, js array<long>, ds array<double>"
        )
        return _merge(local)

    # STAGED table groups (round 13, VERDICT r12 #5): the candidate
    # pass's peak shuffle footprint is n·L·NP·(vector carry + k-array
    # emission) — ~238 GB at 10M rows with the 6×2 dials, which is a
    # single-box disk bound (SCALE.md r12, both 10M attempts). With
    # ``table_groups=G`` the L tables run as G SEQUENTIAL sub-passes:
    # each group's assignments are filtered map-side BEFORE the bucket
    # shuffle (only its tables' rows are shuffled), its per-row top-k
    # merge is materialized EAGERLY via localCheckpoint (n rows of
    # k-arrays — the bounded intermediate), and a driver GC nudge lets
    # the ContextCleaner delete the group's shuffle files before the
    # next group runs — peak scratch drops to ~1/G of the one-shot
    # pass plus the checkpointed group results. The result is
    # IDENTICAL to the one-shot pass: per-group top-k followed by a
    # top-k merge of group results equals the global top-k (any
    # candidate cut inside its group had ≥k strictly-closer candidates
    # there, which also beat it in the union; the dedupe-keep-min rule
    # composes the same way). Default 1 = the one-shot plan, byte for
    # byte. The trade: localCheckpoint ties the run to executor
    # liveness (no lineage recovery) — the right trade for a
    # disk-bounded standalone box; leave it off on clusters with
    # ample shuffle capacity.
    bounds = []
    base = L // groups
    extra = L % groups
    lo = 0
    for g in range(groups):
        hi = lo + base + (1 if g < extra else 0) - 1
        bounds.append((lo, hi))
        lo = hi + 1
    spark_ = df.sparkSession
    # HIERARCHICAL FOLD, not collect-then-union: holding all G group
    # results to the end would keep G × (n·k-array) checkpoints alive
    # (~86 GB at 10M/k=90/G=6) — merging each group into ONE running
    # result keeps at most two bounded intermediates resident, and the
    # top-k merge is associative so the fold equals the one-shot merge
    # (same argument as above, applied pairwise).
    running = None
    for (lo, hi) in bounds:
        # the table range is pushed INTO the explode (not filtered
        # after it): each group's map stage computes only its own
        # tables' cell/probe expressions — a post-explode filter would
        # redo all L tables' assignment work per group (measured at
        # 10M: the first group's map stage sat ≥12 min at 6× redundant
        # expression work before this change)
        part = _exploded(tables=(lo, hi))
        local_g = part.groupBy("t", "b", "shard").applyInArrow(
            bucket_topk, "i long, js array<long>, ds array<double>"
        )
        # the running result rows share local_g's (i, js, ds) shape,
        # so they fold into the group's merge as one more candidate
        # list per row — one merge shuffle per group
        src_g = local_g if running is None else local_g.unionAll(running)
        prev = running
        running = _merge(src_g).localCheckpoint(eager=True)
        del prev  # drop the previous fold state before the GC nudge
        try:  # let the ContextCleaner reclaim this group's shuffles
            spark_.sparkContext._jvm.System.gc()
        except Exception:  # pragma: no cover - py4j hiccup
            pass
    return running


def knn_lsh_banded(
    df: DataFrame,
    k: int,
    id_col: str = "id",
    features: str = "features",
    **kwargs,
) -> DataFrame:
    """Flat-row contract over :func:`knn_lsh_banded_lists` —
    ``(i, j, dist, rank)`` like the other kNN operators. The heavy
    lifting (and the scale argument) lives in the list-form function;
    this explode is JVM-side."""
    nn = knn_lsh_banded_lists(df, k, id_col, features, **kwargs)
    z = F.posexplode(F.arrays_zip("js", "ds"))
    return nn.select("i", z.alias("p", "z")).select(
        "i",
        F.col("z.js").alias("j"),
        F.col("z.ds").alias("dist"),
        (F.col("p") + 1).cast("int").alias("rank"),
    )
