"""Measure AQE-off effect on driver-synchronized iteration loops
(round 13 part 2): embedding_kmeans, graph_communities,
dedup_graph_rank, dedup_graph_triangles, similar_items.

Interleaved A/B per entry (AQE on vs off around the whole entry),
4 pairs, min + mean reported — the same methodology that validated
the t-SNE loop AQE-off in round 13 part 1 (scripts/ab_iter_floor.py).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    python scripts/attr_loops_r13.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_tsne_spark.session import get_spark
from spark_tsne_spark.shipping import ship_package

ENTRIES = [
    "embedding_kmeans",
    "graph_communities",
    "dedup_graph_rank",
    "dedup_graph_triangles",
    "similar_items",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "attr_loops", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    ship_package(spark)
    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as B

    cat = B.bench_queries()

    def run_once(name: str) -> float:
        t0 = time.time()
        fn = cat[name]
        fn = fn.fn if hasattr(fn, "fn") else fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    results = {}
    for name in ENTRIES:
        run_once(name)  # warm the entry's code paths, untimed
        on, off = [], []
        for _ in range(4):
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            on.append(round(run_once(name), 3))
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            off.append(round(run_once(name), 3))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        results[name] = {
            "aqe_on": on, "aqe_off": off,
            "on_min": min(on), "off_min": min(off),
            "on_mean": round(sum(on) / len(on), 3),
            "off_mean": round(sum(off) / len(off), 3),
        }
        print(name, json.dumps(results[name]))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
