"""Attribute the 1M-row affinity tail (VERDICT r11 #2).

The r11 1M e2e measured affinity_sec=469.6 against a 360.5 s
kNN-alone stage — a ~110 s tail with no attribution because the
production affinity is ONE fused job (kNN → β calibration →
symmetrize → adjacency cache). This script materializes the
intermediates so each stage is timed alone:

  1. banded-LSH kNN lists at the affinity dials (6 tables × 2 probes)
     → cache + count
  2. β calibration from the CACHED kNN lists → cache + count
  3. symmetrize+adjacency from the CACHED calibrated lists — the
     r11-rejected packed path (adjacency_from_calibrated) vs the
     shipped explode-both + compute_p chain, ABBA-interleaved: this
     re-runs scripts/ab_symmetrize.py's question AT 1M, the regime
     affinities.py:108 says to revisit (180M thin rows, row/network-
     bound, vs the 50k flagship shape where codegen wins).
  4. the ids collect (api._prepare's driver-side sort of adjacency
     ids) — timed because it is the only driver-side term.

    python scripts/ab_affinity_1m.py [copies] [rounds]   # default 500 2

Env: SPARK_GRAFT_LSH_PROBETAU forwards to the kNN stage so the tau
grid can reuse this harness.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

K = 90  # 3 * perplexity(30)


def main():
    copies_n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("ab_affinity_1m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from scale_lsh_flagship import build_input

    from spark_tsne_spark.operators.affinities import (
        adjacency_from_calibrated,
        compute_p,
    )
    from spark_tsne_spark.operators.knn import (
        LSH_AFFINITY_N_PROBE,
        LSH_AFFINITY_TABLES,
        knn_lsh_banded_lists,
    )
    from spark_tsne_spark.operators.x2p import calibrate
    from spark_tsne_spark.shipping import ship_package

    ship_package(spark)
    out: dict = {"copies": copies_n}
    t0 = time.time()
    big = build_input(spark, sf_dir, copies_n)
    n = big.count()
    out["n_rows"] = n
    out["input_build_sec"] = round(time.time() - t0, 3)
    print(f"input: {n} rows in {out['input_build_sec']}s", flush=True)

    knn_kwargs = dict(
        num_tables=LSH_AFFINITY_TABLES, n_probe=LSH_AFFINITY_N_PROBE
    )
    if os.environ.get("SPARK_GRAFT_LSH_PROBETAU"):
        knn_kwargs["probe_tau"] = float(os.environ["SPARK_GRAFT_LSH_PROBETAU"])
    out["knn_kwargs"] = knn_kwargs

    # Stage 1: kNN lists alone (the production path feeds these
    # straight into calibrate without materializing — the split is
    # the whole point here).
    resources: list = []
    t1 = time.time()
    nn = knn_lsh_banded_lists(
        big, K, id_col="vec_id", features="embedding",
        resources=resources, **knn_kwargs,
    ).persist()
    nn_rows = nn.count()
    out["knn_sec"] = round(time.time() - t1, 3)
    out["knn_rows"] = nn_rows
    out["mean_nbrs"] = round(
        nn.select(F.sum(F.size("js"))).first()[0] / n, 2
    )
    print(
        f"knn: {nn_rows} rows ({out['mean_nbrs']}/row) in {out['knn_sec']}s",
        flush=True,
    )
    for r in resources:
        r.unpersist()

    # Stage 2: β calibration alone, from the cached kNN lists.
    t2 = time.time()
    cal = calibrate(nn, perplexity=30.0, tol=1e-5).select(
        "i", "js", "ps"
    ).persist()
    cal.count()
    out["calibrate_sec"] = round(time.time() - t2, 3)
    print(f"calibrate: {out['calibrate_sec']}s", flush=True)
    nn.unpersist()

    # Stage 3: symmetrize+adjacency ABBA from the cached calibrated
    # lists — shipped thin-row chain vs the packed r11 alternative.
    def run_old():
        p_ji = cal.select(
            "i", F.explode(F.arrays_zip("js", "ps")).alias("e")
        ).select("i", F.col("e.js").alias("j"), F.col("e.ps").alias("p"))
        adj = compute_p(p_ji, n, cpus).persist()
        adj.select("i").count()
        adj.unpersist()

    def run_new():
        adj = adjacency_from_calibrated(cal, n, cpus).persist()
        adj.select("i").count()
        adj.unpersist()

    ab = {"old": [], "new": []}
    for r in range(rounds):
        order = [("old", run_old), ("new", run_new)]
        if r % 2:
            order.reverse()
        for name, fn in order:
            ta = time.time()
            fn()
            ab[name].append(round(time.time() - ta, 3))
        print(
            f"# symmetrize round {r}: old={ab['old'][-1]} new={ab['new'][-1]}",
            flush=True,
        )
    out["symmetrize_old"] = ab["old"]
    out["symmetrize_new"] = ab["new"]
    out["symmetrize_old_min"] = min(ab["old"])
    out["symmetrize_new_min"] = min(ab["new"])

    # Stage 4: the driver-side ids collect api._prepare pays.
    adj = compute_p(
        cal.select(
            "i", F.explode(F.arrays_zip("js", "ps")).alias("e")
        ).select("i", F.col("e.js").alias("j"), F.col("e.ps").alias("p")),
        n, cpus,
    ).persist()
    adj.select("i").count()
    t4 = time.time()
    import numpy as np

    ids = np.sort(
        adj.select("i").toPandas()["i"].to_numpy(dtype=np.int64)
    )
    out["ids_collect_sec"] = round(time.time() - t4, 3)
    out["ids_n"] = int(len(ids))
    adj.unpersist()
    cal.unpersist()

    print("AB1M " + json.dumps(out), flush=True)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "ab_affinity_1m_out.json"), "w",
    ) as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
