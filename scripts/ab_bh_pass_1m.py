"""ABBA the round-12 mapInArrow BH force pass vs the old mapInPandas
pass at 1M rows (the regime where the 50k A/B was a wash but the
SCALE.md e2e attributed ~8.9 s/iter to the pass).

The adjacency is FABRICATED at the exact production shape — n rows x
k neighbor lists (random neighbor ids: worst-case gather locality,
like LSH output), hash-partitioned into `cpus` partitions and cached,
matching what ``api._prepare`` feeds ``_loop`` — because the pass
cost depends only on the shape, not on which neighbors the kNN chose.
That makes the kernel A/B ~20x cheaper than rebuilding the 1M LSH
affinity per run. Both passes share ``bh_forces`` and are pinned
bit-identical on real adjacencies (tests/test_r12_fixes.py) and here.

    python scripts/ab_bh_pass_1m.py [n] [k] [rounds]   # default 1_000_000 90 3
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession, functions as F


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 90
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "48g")
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("ab_bh_pass_1m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from spark_tsne_spark.api import TREE_COARSE_MIN_N, TREE_LEAF_SIZE
    from spark_tsne_spark.gradient import GRAD_SCHEMA, bh_block, bh_gradient_pass
    from spark_tsne_spark.shipping import ship_package
    from spark_tsne_spark.sptree import FlatTree

    ship_package(spark)
    out: dict = {"n": n, "k": k, "cpus": cpus}

    # Fabricated adjacency at production shape: js random in [0, n),
    # ps positive and row-normalized-ish (values irrelevant to cost).
    t0 = time.time()
    pos = F.sequence(F.lit(0), F.lit(k - 1))
    adjacency = (
        spark.range(n)
        .select(
            F.col("id").alias("i"),
            F.transform(
                pos, lambda p: F.pmod(F.xxhash64(F.col("id"), p), F.lit(n))
            ).alias("js"),
            F.transform(
                pos,
                lambda p: (
                    F.pmod(F.xxhash64(p, F.col("id")), F.lit(1000)).cast(
                        "double"
                    )
                    + F.lit(1.0)
                )
                / F.lit(1000.0 * k),
            ).alias("ps"),
        )
        .repartition(cpus, "i")
        .persist()
    )
    adjacency.count()
    out["adjacency_build_sec"] = round(time.time() - t0, 3)
    print(f"adjacency: {n}x{k} in {out['adjacency_build_sec']}s", flush=True)

    ids = np.arange(n, dtype=np.int64)
    rng = np.random.default_rng(42)
    Y = rng.standard_normal((n, 2)) * 1e-4
    bc_ids = sc.broadcast(ids)
    t = time.time()
    tree = FlatTree.build(
        Y, leaf_size=TREE_LEAF_SIZE if n >= TREE_COARSE_MIN_N else 1
    )
    out["tree_build_sec"] = round(time.time() - t, 3)
    t = time.time()
    bc_state = sc.broadcast((Y, tree))
    out["broadcast_sec"] = round(time.time() - t, 3)
    print(
        f"tree {out['tree_build_sec']}s broadcast {out['broadcast_sec']}s",
        flush=True,
    )

    def old_pass():
        def run(batches):
            from spark_tsne_spark.runtime import tune_worker as tune_malloc

            tune_malloc()
            Yv, treev = bc_state.value
            ids_sorted = bc_ids.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                yield bh_block(pdf, Yv, treev, ids_sorted, 0.5, 12.0)

        return adjacency.mapInPandas(run, GRAD_SCHEMA)

    def new_pass():
        return bh_gradient_pass(adjacency, bc_state, bc_ids, 0.5, 12.0)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    ab = {"old_noop": [], "new_noop": [], "old_collect": [], "new_collect": []}
    for r in range(rounds):
        order = [("old", old_pass), ("new", new_pass)]
        if r % 2:
            order.reverse()
        for name, mk in order:
            df = mk()
            sc.setJobDescription(f"{name} bh pass noop r{r}")
            t = time.time()
            noop(df)
            ab[f"{name}_noop"].append(round(time.time() - t, 3))
            sc.setJobDescription(f"{name} bh pass toPandas r{r}")
            t = time.time()
            res = df.toPandas()
            ab[f"{name}_collect"].append(round(time.time() - t, 3))
            del res
        print(f"# round {r}: {ab}", flush=True)
    out.update(ab)
    for key in ab:
        out[f"{key}_min"] = min(ab[key])
    print("ABBH1M " + json.dumps(out), flush=True)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "ab_bh_pass_out.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
