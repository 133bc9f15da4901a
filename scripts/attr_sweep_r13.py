"""Job-timeline sweep of the bench's 1.3-2.3s band (round 13 part 2).

For each entry: one warm run, then one timed run inside a job group;
prints wall seconds, job count, and each job's stage names + task
counts, so entries with an excess exchange / serialized job chain
stand out. Read-only attribution — no code under test is modified.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_tsne_spark.session import get_spark
from spark_tsne_spark.shipping import ship_package

ENTRIES = [
    "allpairs_cosine", "part_cooccurrence", "dedup_clusters",
    "bootstrap_ci", "rrf_hybrid_search", "simhash_recall_eval",
    "correlation_matrix", "linkage_scores", "q2_min_cost_supplier",
    "lead_time_p90", "dedup_sorted_neighborhood", "ann_recall_at_k",
    "dedup_containment", "trigram_lm_ppl", "dim_truncation_recall",
    "lsh_recall_eval", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "term_pmi", "bpe_train", "abc_xyz", "ngram_novelty",
    "token_budget_mix", "ann_ivf_index_query",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "attr_sweep", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    ship_package(spark)
    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()

    import bench as B

    cat = B.bench_queries()
    sc = spark.sparkContext
    jsc = sc._jsc.sc()

    report = {}
    for name in ENTRIES:
        fn = cat.get(name)
        if fn is None:
            print(f"!! {name}: not in bench_queries")
            continue
        fn = fn.fn if hasattr(fn, "fn") else fn

        def once():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        try:
            once()  # warm
        except Exception as e:
            print(f"!! {name}: warm failed: {e}")
            continue
        group = f"sweep-{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        once()
        wall = time.time() - t0
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        ids = sorted(tracker.getJobIdsForGroup(group))
        jobs = []
        for jid in ids:
            jinfo = jsc.statusTracker().getJobInfo(jid)
            names = []
            if jinfo.nonEmpty():
                for sid in list(jinfo.get().stageIds()):
                    s = jsc.statusTracker().getStageInfo(int(sid))
                    if s.nonEmpty():
                        si = s.get()
                        nm = si.name().split(" at ")[0]
                        names.append(f"{nm}[{si.numTasks()}]")
            jobs.append(names)
        report[name] = {"wall": round(wall, 3), "n_jobs": len(ids), "jobs": jobs}
        print(f"{name}: wall={wall:.3f}s jobs={len(ids)}")
        for j in jobs:
            print(f"    {j}")
    with open("/tmp/attr_sweep_r13.json", "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
