"""Dump .explain('formatted') for a list of bench entries and count
Exchange / BroadcastExchange / window / aggregate nodes (round 13
part 2 attribution)."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_tsne_spark.session import get_spark
from spark_tsne_spark.shipping import ship_package


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plans_r13"
    entries = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "q2_min_cost_supplier", "allpairs_cosine", "simhash_recall_eval",
        "rrf_hybrid_search", "trigram_lm_ppl", "lsh_recall_eval",
        "ann_recall_at_k", "lead_time_p90", "ngram_novelty",
        "dedup_sorted_neighborhood", "part_cooccurrence", "dedup_clusters",
        "term_pmi",
    ]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(
        "dump_plans", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    ship_package(spark)
    import bench as B

    cat = B.bench_queries()
    for name in entries:
        fn = cat.get(name)
        if fn is None:
            print(f"!! {name} missing")
            continue
        fn = fn.fn if hasattr(fn, "fn") else fn
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        ex = len(re.findall(r"\n\s*(?:[+:]-|)\s*Exchange ", plan))
        bex = plan.count("BroadcastExchange")
        smj = plan.count("SortMergeJoin")
        bhj = plan.count("BroadcastHashJoin")
        win = plan.count(" Window ")
        agg = plan.count("HashAggregate")
        py = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count("MapInArrow")
        print(
            f"{name}: Exchange={ex} BroadcastExchange={bex} SMJ={smj} "
            f"BHJ={bhj} Window={win} HashAgg={agg} PyNodes={py}"
        )


if __name__ == "__main__":
    main()
