"""Measure the LSH flagship path at a size where it ENGAGES
(VERDICT r9 ask #4): ~1M synthetic rows (500 jittered copies of the
sf0.1 embeddings table, d=64, same construction as the bench
flagship), end-to-end ``bh_tsne(knn_method='lsh_banded')`` with
per-stage walls, plus recall of the LSH kNN against the EXACT kNN of
a 10k-query subsample (ground truth computed over the full corpus
with a broadcast-query partial-top-k pass — the queries broadcast at
5 MB; the corpus never does).

    python scripts/scale_lsh_flagship.py [copies] [iters]  # default 500 3

Env knobs: SPARK_GRAFT_LSH_TABLES / _BAND / _WIDTHQ / _MAXBUCKET /
_NPROBE / _PROBETAU / _PROBEIDX (0 = asymmetric) / _FLOORC (the
round-13 recall-floor scale; 0 disables) / _GROUPS (staged table
groups, the 10M peak-disk dial) forward to knn_lsh_banded for
parameter sweeps.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, Window, functions as F

K = 90  # mu = 3 * perplexity(30) — the affinity pass's own k


def build_input(spark, sf_dir, copies_n):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    copies = spark.range(copies_n).select(F.col("id").alias("copy"))
    return (
        e.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("copy") * 1_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (
                    x
                    + F.pmod(
                        F.xxhash64(F.col("vec_id"), F.col("copy"), i),
                        F.lit(1000),
                    ).cast("double")
                    / 1e4
                ).cast("float"),
            ).alias("embedding"),
        )
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .cache()
    )


def exact_ground_truth(spark, big, q_pred):
    """Exact K-NN of the sampled queries vs the FULL corpus: broadcast
    the ~10k queries (5 MB), one pass over the corpus keeping a
    running per-query top-K inside each partition, then a global
    window merge of the 32 partials. O(n·q·d) flops, no corpus
    broadcast — the query-subset analogue of the block kernel."""
    sel = big.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("f"),
    )
    q = sel.where(q_pred(F.col("id"))).orderBy("id")
    q_rows = q.collect()
    q_ids = np.array([r["id"] for r in q_rows], dtype=np.int64)
    Q = np.array([r["f"] for r in q_rows], dtype=np.float64)
    q_sq = (Q * Q).sum(axis=1)
    sc = spark.sparkContext
    b_qids, b_Q, b_qsq = sc.broadcast(q_ids), sc.broadcast(Q), sc.broadcast(q_sq)

    def part_topk(batches):
        from spark_tsne_spark.runtime import tune_worker

        tune_worker()
        Q_, qsq_, qids_ = b_Q.value, b_qsq.value, b_qids.value
        nq = len(qids_)
        best_d = np.full((nq, 0), np.inf)
        best_j = np.empty((nq, 0), dtype=np.int64)
        CH = 1024
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["f"].tolist(), dtype=np.float64)
            ids = pdf["id"].to_numpy()
            x_sq = (X * X).sum(axis=1)
            for lo in range(0, len(ids), CH):
                hi = min(lo + CH, len(ids))
                d = Q_ @ X[lo:hi].T
                d *= -2.0
                d += x_sq[None, lo:hi]
                d += qsq_[:, None]
                np.maximum(d, 0.0, out=d)
                # exclude self matches
                self_cols = {int(v): c for c, v in enumerate(ids[lo:hi])}
                for r, qid in enumerate(qids_):
                    c = self_cols.get(int(qid))
                    if c is not None:
                        d[r, c] = np.inf
                cat_d = np.concatenate([best_d, d], axis=1)
                cat_j = np.concatenate(
                    [best_j, np.broadcast_to(ids[lo:hi], (nq, hi - lo))], axis=1
                )
                if cat_d.shape[1] > K:
                    idx = np.argpartition(cat_d, K - 1, axis=1)[:, :K]
                else:
                    idx = np.argsort(cat_d, axis=1)
                best_d = np.take_along_axis(cat_d, idx, axis=1)
                best_j = np.take_along_axis(cat_j, idx, axis=1)
        yield pd.DataFrame(
            {"q": qids_, "js": list(best_j), "ds": list(best_d)}
        )

    partial = sel.mapInPandas(
        part_topk, "q long, js array<long>, ds array<double>"
    )
    flat = partial.select(
        "q", F.explode(F.arrays_zip("js", "ds")).alias("z")
    ).select("q", F.col("z.js").alias("j"), F.col("z.ds").alias("d"))
    w = Window.partitionBy("q").orderBy(F.col("d").asc(), F.col("j").asc())
    return (
        flat.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= K)
        .select(F.col("q").alias("i"), "j")
    )


def main():
    copies_n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        # Scale-adaptive dial (guide §2): 64 fits the 1M point; at 10M
        # a 64-way reduce sorts ~550 MB/task and the UnsafeExternalSorter
        # spill DOUBLES the on-disk shuffle footprint (measured: the
        # first 10M attempt died on disk in the bucket-pass reduce).
        # 256 at 10M keeps per-task sorts ~140 MB = no spill.
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"),
        )
        # 48g fits the 1M point; the 10M point (5000 copies) caches
        # ~22 GB of kNN pairs + ~15 GB of grouped adjacency, so let
        # the caller raise the heap instead of silently spilling
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        )
        # Shuffle codec dial (guide §2.3): the 10M candidate pass is
        # int64/double-heavy shuffle bytes on a disk-bounded box —
        # zstd trades CPU for a markedly better ratio there; default
        # stays lz4 so recorded smaller-scale runs are comparable.
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("scale_lsh_flagship")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spark_tsne_spark.api import bh_tsne
    from spark_tsne_spark.operators.knn import knn_lsh_banded

    out: dict = {"copies": copies_n, "iters": iters}
    t0 = time.time()
    big = build_input(spark, sf_dir, copies_n)
    n = big.count()
    out["n_rows"] = n
    out["input_build_sec"] = round(time.time() - t0, 3)
    print(f"input: {n} rows in {out['input_build_sec']}s", flush=True)

    lsh_kwargs = {}
    if os.environ.get("SPARK_GRAFT_LSH_TABLES"):
        lsh_kwargs["num_tables"] = int(os.environ["SPARK_GRAFT_LSH_TABLES"])
    if os.environ.get("SPARK_GRAFT_LSH_BAND"):
        lsh_kwargs["band_size"] = int(os.environ["SPARK_GRAFT_LSH_BAND"])
    if os.environ.get("SPARK_GRAFT_LSH_WIDTHQ"):
        lsh_kwargs["width_quantile"] = float(os.environ["SPARK_GRAFT_LSH_WIDTHQ"])
    if os.environ.get("SPARK_GRAFT_LSH_MAXBUCKET"):
        lsh_kwargs["max_bucket"] = int(os.environ["SPARK_GRAFT_LSH_MAXBUCKET"])
    if os.environ.get("SPARK_GRAFT_LSH_NPROBE"):
        lsh_kwargs["n_probe"] = int(os.environ["SPARK_GRAFT_LSH_NPROBE"])
    if os.environ.get("SPARK_GRAFT_LSH_PROBETAU"):
        lsh_kwargs["probe_tau"] = float(os.environ["SPARK_GRAFT_LSH_PROBETAU"])
    if os.environ.get("SPARK_GRAFT_LSH_PROBEIDX"):
        lsh_kwargs["probe_index"] = (
            os.environ["SPARK_GRAFT_LSH_PROBEIDX"] != "0"
        )
    if os.environ.get("SPARK_GRAFT_LSH_FLOORC"):
        lsh_kwargs["width_floor_scale"] = float(
            os.environ["SPARK_GRAFT_LSH_FLOORC"]
        )
    if os.environ.get("SPARK_GRAFT_LSH_GROUPS"):
        lsh_kwargs["table_groups"] = int(os.environ["SPARK_GRAFT_LSH_GROUPS"])
    out["lsh_kwargs"] = lsh_kwargs

    # Stage 1 measured alone: the banded-LSH kNN itself.
    t1 = time.time()
    lsh = knn_lsh_banded(
        big, K, id_col="vec_id", features="embedding", **lsh_kwargs
    )
    if not lsh_kwargs.get("table_groups"):
        # One-shot pass: cache the flat pairs for the recall join.
        # With staged table_groups the merged LISTS are already
        # localCheckpoint-materialized inside the operator, so the
        # flat explode recomputes cheaply from that leaf — caching a
        # second 900M-row flat copy at 10M (~25 GB spill) is exactly
        # the disk this mode exists to avoid.
        lsh = lsh.cache()
    lsh_rows = lsh.count()
    out["lsh_knn_sec"] = round(time.time() - t1, 3)
    out["lsh_knn_rows"] = lsh_rows
    out["lsh_mean_nbrs"] = round(lsh_rows / n, 2)
    print(
        f"lsh knn: {lsh_rows} pairs ({out['lsh_mean_nbrs']}/row) "
        f"in {out['lsh_knn_sec']}s",
        flush=True,
    )

    # Recall vs exact ground truth on the 10k-query subsample
    # (base ids divisible by 100 → 20 bases × copies).
    # Query subsample density dial: GT cost is O(n·q·d) GEMM, so at
    # 10M rows the default 1-in-100 sample (100k queries) is ~1 h of
    # pure BLAS; 1-in-1000 (10k queries) keeps the recall estimate
    # affordable at the same statistical weight per query.
    gt_mod = int(os.environ.get("SPARK_GRAFT_GT_MOD", "100"))
    # Query-sample SPREAD dial: ids are vec_id + copy*1e6, so for any
    # mod dividing 1e6 the plain id%mod==0 predicate degenerates to
    # vec_id%mod==0 — at mod=1000 that is copies of just TWO of the
    # 2000 base embeddings, and the recall estimate collapses to the
    # LSH's behavior inside two jitter clouds (measured at 3.16M:
    # 0.50 under 2-base sampling). GT_HASH=1 samples by xxhash64(id)
    # instead, spreading the same query budget uniformly over bases
    # AND copies. Default stays the id-mod predicate so the recorded
    # 1M rows stay reproducible.
    gt_hash = os.environ.get("SPARK_GRAFT_GT_HASH") == "1"
    q_pred = (
        (lambda c: F.pmod(F.xxhash64(c), F.lit(gt_mod)) == 0)
        if gt_hash
        else (lambda c: F.pmod(c, F.lit(gt_mod)) == 0)
    )
    out["gt_hash_sampling"] = gt_hash
    t2 = time.time()
    gt = exact_ground_truth(spark, big, q_pred).cache()
    gt_n = gt.count()
    out["gt_pairs"] = gt_n
    out["gt_sec"] = round(time.time() - t2, 3)
    # Broadcast the GT side (10k queries × K pairs ≈ 14 MB): just over
    # the auto-broadcast threshold, so without the hint the planner
    # sort-merges and re-shuffles ALL n·K kNN pairs (~20 GB at 10M)
    # for a count the broadcast join gets from the cached pairs in
    # place (guide §3.1).
    hit = lsh.select("i", "j").join(F.broadcast(gt), ["i", "j"]).count()
    out["recall_at_k"] = round(hit / gt_n, 4)
    print(
        f"ground truth {gt_n} pairs in {out['gt_sec']}s; "
        f"recall@{K} = {out['recall_at_k']}",
        flush=True,
    )
    lsh.unpersist()
    gt.unpersist()
    # Shuffle files of the standalone kNN stage are only deleted when
    # the driver GC collects their ShuffleDependency references; at
    # 10M that is ~35 GB of disk the e2e's second kNN pass needs back.
    spark.sparkContext._jvm.System.gc()

    if os.environ.get("SPARK_GRAFT_LSH_SKIP_E2E") == "1":
        print("E2E " + json.dumps(out), flush=True)
        return

    # End-to-end flagship on the LSH path, stage-profiled.
    stages: dict = {}
    t3 = time.time()
    res = bh_tsne(
        big,
        max_iterations=iters,
        perplexity=30.0,
        seed=42,
        id_col="vec_id",
        features="embedding",
        knn_method="lsh_banded",
        profile=stages,
    )
    df = res.to_df(spark)
    out["e2e_rows"] = df.count()
    out["e2e_sec"] = round(time.time() - t3, 3)
    out["stages"] = stages
    print("E2E " + json.dumps(out), flush=True)
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "scale_lsh_out.json",
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
