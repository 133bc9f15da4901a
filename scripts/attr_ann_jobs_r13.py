"""Per-Spark-job timeline of the ANN IVF entries (round 13 part 2).

Runs each entry once warm inside a job group and prints every job's
wall time and stage names from the status tracker, so the ~3 s query
tail can be attributed job by job.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_tsne_spark.session import get_spark
from spark_tsne_spark.shipping import ship_package
from spark_tsne_spark.sources.tables import load_table


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "attr_ann_jobs", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    ship_package(spark)
    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()
    emb = load_table(spark, "embeddings", sf_dir)
    emb.count()

    from spark_tsne_spark.operators.similarity import ivf_pq_topk, ivf_topk

    sc = spark.sparkContext
    jsc = sc._jsc.sc()

    def timeline(tag, fn):
        fn()  # warm
        group = f"attr-{tag}"
        sc.setJobGroup(group, tag)
        t0 = time.time()
        fn()
        wall = time.time() - t0
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        ids = sorted(tracker.getJobIdsForGroup(group))
        print(f"== {tag}: wall {wall:.3f}s, {len(ids)} jobs")
        tot = 0.0
        for jid in ids:
            jinfo = jsc.statusTracker().getJobInfo(jid)
            stage_ids = []
            if jinfo.nonEmpty():
                stage_ids = list(jinfo.get().stageIds())
            names, dur = [], 0.0
            for sid in stage_ids:
                s = jsc.statusTracker().getStageInfo(int(sid))
                if s.nonEmpty():
                    si = s.get()
                    names.append(f"{si.name()}[{si.numTasks()}]")
            print(f"  job {jid}: stages={names}")
        print(f"  (sum of job walls not available; wall={wall:.3f})")

    qs = emb.where(F.col("vec_id") < 100)
    timeline(
        "ivf_topk",
        lambda: ivf_topk(emb, qs, k=10, id_col="vec_id", vec_col="embedding")
        .write.format("noop").mode("overwrite").save(),
    )
    timeline(
        "ivf_pq_topk",
        lambda: ivf_pq_topk(emb, qs, k=10, id_col="vec_id", vec_col="embedding")
        .write.format("noop").mode("overwrite").save(),
    )


if __name__ == "__main__":
    main()
