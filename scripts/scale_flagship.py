"""Scale-step the distributed flagship (VERDICT r4 #5): run
tsne_bh_distributed's exact construction at 50k and 200k rows (25 vs
100 jittered copies of the sf0.1 embeddings table), 10 BH iterations,
and print the stage breakdown per scale so SCALE.md's linearity claim
is pinned by two measured points instead of one.

    python scripts/scale_flagship.py [copies ...]   # default: 25 100
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def run_at(spark, sf_dir, copies_n):
    from spark_tsne_spark.api import bh_tsne

    stages: dict = {}
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t0 = time.time()
    copies = spark.range(copies_n).select(F.col("id").alias("copy"))
    big = (
        e.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("copy") * 1_000_000).alias("vid"),
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
        .withColumnRenamed("vid", "vec_id")
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .cache()
    )
    n = big.count()
    stages["input_build_sec"] = round(time.time() - t0, 3)
    t1 = time.time()
    res = bh_tsne(
        big,
        max_iterations=10,
        perplexity=30.0,
        seed=42,
        id_col="vec_id",
        features="embedding",
        profile=stages,
    )
    df = res.to_df(spark)
    rows = df.count()
    stages["total_sec"] = round(time.time() - t0, 3)
    stages["tsne_sec"] = round(time.time() - t1, 3)
    stages["n_rows"] = n
    stages["out_rows"] = rows
    big.unpersist()
    spark.catalog.clearCache()
    return stages


def main():
    copy_counts = [int(a) for a in sys.argv[1:]] or [25, 100]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.maxResultSize", "8g")
        .appName("scale_flagship")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
    for c in copy_counts:
        # Two runs per scale, the WARM one is the signal: a fresh
        # session's first full-size pass pays one-time Python-worker
        # arena/workspace warmup (~15 s at 50k on this host class),
        # which lands entirely on the smaller scale and corrupts the
        # ratio (r10: cold 50k affinity 20.1 s vs 3.3-4.5 s steady
        # state in a warmed session).
        runs = [run_at(spark, sf_dir, c) for _ in range(max(1, reps))]
        out[c] = {"runs": runs, "warm": runs[-1]}
        print(f"SCALE copies={c}: {json.dumps(out[c])}", flush=True)
    spark.stop()
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "scale_flagship_out.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
