"""Decompose ann_ivf_pq_topk / ann_ivf_topk wall time (round 13 part 2).

Isolated session, same conf as bench.py. Times each driver-synchronous
piece of the IVF/IVF-PQ pipeline separately, 3 repeats, so the entry's
bench seconds can be attributed to: the sample-collect Spark job, the
driver-side numpy trainers, and the distributed query tail.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    python scripts/attr_ann_r13.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from spark_tsne_spark.session import get_spark
from spark_tsne_spark.shipping import ship_package
from spark_tsne_spark.sources.tables import load_table


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "attr_ann", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    ship_package(spark)
    # same warmups as bench.py (worker pool + arena)
    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()
    emb = load_table(spark, "embeddings", sf_dir)
    emb.count()

    from spark_tsne_spark.operators.similarity import (
        _kmeans_centroids,
        _pq_codebooks,
        _spherical_kmeans,
        ivf_pq_topk,
        ivf_topk,
    )

    out = {"runs": []}
    for rep in range(3):
        r = {}
        base = emb.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
        # piece 1: the TakeOrdered sample-collect Spark job
        t0 = time.time()
        h = F.xxhash64(F.lit("ivf-42"), F.col("id").cast("string"))
        rows = (
            base.select("id", "v").orderBy(h.asc(), F.col("id").asc())
            .limit(100_000).collect()
        )
        r["sample_collect_sec"] = round(time.time() - t0, 3)
        rows.sort(key=lambda x: x["id"])
        X = np.array([x["v"] for x in rows], dtype=np.float64)
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        X = X[norms[:, 0] > 0] / norms[norms[:, 0] > 0]
        # piece 2: numpy spherical k-means (in the bench driver process)
        t0 = time.time()
        _spherical_kmeans(X, 16, 42)
        r["kmeans_numpy_sec"] = round(time.time() - t0, 3)
        # piece 3: numpy PQ codebooks
        t0 = time.time()
        _pq_codebooks(X, 8, 256, 42)
        r["pq_numpy_sec"] = round(time.time() - t0, 3)
        # piece 4: full ivf_topk entry (bench shape) noop-timed
        qs = emb.where(F.col("vec_id") < 100)
        t0 = time.time()
        ivf_topk(emb, qs, k=10, id_col="vec_id", vec_col="embedding") \
            .write.format("noop").mode("overwrite").save()
        r["ivf_topk_entry_sec"] = round(time.time() - t0, 3)
        # piece 5: full ivf_pq_topk entry with stage profile
        prof = {}
        t0 = time.time()
        ivf_pq_topk(
            emb, qs, k=10, id_col="vec_id", vec_col="embedding", profile=prof
        ).write.format("noop").mode("overwrite").save()
        r["ivf_pq_entry_sec"] = round(time.time() - t0, 3)
        r["ivf_pq_stages"] = prof
        out["runs"].append(r)
        print(json.dumps(r))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
