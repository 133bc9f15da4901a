"""Interleaved ABBA A/B of the query-side BLAS fair-share floor
(VERDICT r10 #2): the query fan-out kernels' `concurrent` is the
plan-side partition count of the FILTERED query batch, which inherits
the table's parquet splits while only a few hold rows — fair-share
then runs 1-thread BLAS with idle cores. floor=4 bounds that.

Times ivf_topk and IvfIndex.query at sf0.1 with the floor forced to
1 (old behavior) vs 4 (shipped), alternating arms.

    python scripts/ab_blas_floor.py [rounds]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("ab_blas_floor")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import spark_tsne_spark.operators.similarity as S
    from spark_tsne_spark.shipping import ship_package

    ship_package(spark)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e.count()
    qs = e.where(F.col("vec_id") < 100)

    orig_fanout = S._make_cell_fanout

    def force_floor(n):
        def patched(b_C, n_top, concurrent=1, floor=1):
            return orig_fanout(b_C, n_top, concurrent=concurrent, floor=n)

        S._make_cell_fanout = patched

    def run_ivf():
        S.ivf_topk(e, qs, k=10, id_col="vec_id", vec_col="embedding").count()

    idx = S.IvfIndex.build(e, "/tmp/ab_blas_floor_ivf", id_col="vec_id",
                           vec_col="embedding")

    def run_idx_query():
        idx.query(qs, k=10).count()

    out: dict = {}
    for kname, fn in (("ivf_topk", run_ivf), ("ivf_index_query", run_idx_query)):
        # warm both arms once (codegen/worker parity)
        for f in (1, 4):
            force_floor(f)
            fn()
        res = {"floor1": [], "floor4": []}
        for r in range(rounds):
            arms = [(1, "floor1"), (4, "floor4")]
            if r % 2:
                arms.reverse()
            for f, key in arms:
                force_floor(f)
                t0 = time.time()
                fn()
                res[key].append(round(time.time() - t0, 3))
        res["floor1_min"] = min(res["floor1"])
        res["floor4_min"] = min(res["floor4"])
        out[kname] = res
        print(f"# {kname}: {json.dumps(res)}", flush=True)
    S._make_cell_fanout = orig_fanout
    print("AB " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
