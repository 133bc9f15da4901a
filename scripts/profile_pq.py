"""Attribute ann_ivf_pq_topk's wall time (VERDICT r4 #4 / r6 #3):
run the REAL entry path N times; each repeat reports the
driver-synchronous train stages (via the ``profile`` hook) plus the
single-action execution wall, and the Spark job count for the action
(window-independent structural metric). Usage:

    python scripts/profile_pq.py [repeats] [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from spark_tsne_spark.session import get_spark
    from spark_tsne_spark.shipping import ship_package
    from spark_tsne_spark.sources.tables import load_table

    spark = get_spark("profile_pq", shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    # Warm python workers so repeat 0 isn't all interpreter spin-up.
    spark.range(128).repartition(32).mapInPandas(
        lambda it: (p for p in it), "id long"
    ).count()
    load_table(spark, "embeddings", sf_dir).count()

    from spark_tsne_spark.operators.similarity import ivf_pq_topk

    sc = spark.sparkContext
    st = sc.statusTracker()
    for r in range(reps):
        prof: dict = {}
        e = load_table(spark, "embeddings", sf_dir)
        qs = e.where(F.col("vec_id") < 100)
        group = f"pq-{r}"
        sc.setJobGroup(group, group)
        t0 = time.time()
        out = ivf_pq_topk(
            e, qs, k=10, id_col="vec_id", vec_col="embedding", profile=prof
        )
        t1 = time.time()
        n = out.count()
        t2 = time.time()
        jobs = st.getJobIdsForGroup(group)
        print(
            f"repeat={r} total={t2 - t0:.2f}s "
            f"train_sample_kmeans={prof.get('pq_sample_kmeans_sec')}s "
            f"codebooks={prof.get('pq_codebook_train_sec')}s "
            f"action={t2 - t1:.2f}s jobs={len(jobs)} rows={n}",
            flush=True,
        )
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
