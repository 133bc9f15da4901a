"""Interleaved A/B of the affinity symmetrize tail at flagship shape
(50k rows, k=90): OLD explode-both → repartition(i) → groupBy(i,j).sum
→ regroup (`compute_p`) vs NEW fused list-form shuffle
(`adjacency_from_calibrated`). The calibrated neighbor lists are
cached once so each arm times ONLY the symmetrize+adjacency job;
arms alternate to cancel host weather.

    python scripts/ab_symmetrize.py [rounds]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("ab_symmetrize")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bench import FLAGSHIP_COPIES  # same input construction
    from spark_tsne_spark.operators.affinities import (
        adjacency_from_calibrated,
        compute_p,
    )
    from spark_tsne_spark.operators.x2p import calibrated_neighbors
    from spark_tsne_spark.shipping import ship_package

    ship_package(spark)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    copies = spark.range(FLAGSHIP_COPIES).select(F.col("id").alias("copy"))
    big = (
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
        .repartition(int(cpus))
        .cache()
    )
    n = big.count()
    cal = calibrated_neighbors(
        big, perplexity=30.0, id_col="vec_id", features="embedding"
    ).select("i", "js", "ps").cache()
    cal.count()
    print(f"n={n}, cal cached", flush=True)

    def run_old():
        p_ji = cal.select(
            "i", F.explode(F.arrays_zip("js", "ps")).alias("e")
        ).select("i", F.col("e.js").alias("j"), F.col("e.ps").alias("p"))
        adj = compute_p(p_ji, n, int(cpus)).cache()
        adj.select("i").count()
        adj.unpersist()

    def run_new():
        adj = adjacency_from_calibrated(cal, n, int(cpus)).cache()
        adj.select("i").count()
        adj.unpersist()

    # one untimed warm lap each (codegen + worker reuse parity)
    run_old()
    run_new()
    out = {"old": [], "new": []}
    for r in range(rounds):
        # ABBA ordering cancels first-mover bias within each pair
        order = [("old", run_old), ("new", run_new)]
        if r % 2:
            order.reverse()
        for name, fn in order:
            t0 = time.time()
            fn()
            out[name].append(round(time.time() - t0, 3))
        print(f"# round {r}: old={out['old'][-1]} new={out['new'][-1]}", flush=True)
    out["old_min"], out["new_min"] = min(out["old"]), min(out["new"])
    print("AB " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
