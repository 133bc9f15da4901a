"""Catalog-wide robustness pass at bench scale.

Runs EVERY catalog entry end-to-end (count action) at a given sf dir
(default sf0.1 — 10x the driver's correctness scale), one session,
and prints per-entry wall time + a final summary. The point is not
timing precision (bench.py owns that for the headline set) but
breadth: the correctness catalog must not be a toy-scale artifact —
every plan that hash-matches DuckDB at sf0.01 has to RUN at 10x.

Usage: python scripts/robustness_sf01.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    from spark_tsne_spark.plans.queries import catalog

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # the flagship runs hundreds of iterations — bench.py times its
    # distributed form properly; skip it here like the r5 pass did
    skip = {"tsne_embedding"}
    fails, slow, total = [], [], 0.0
    entries = sorted(catalog().items())
    for name, q in entries:
        if name in skip:
            print(f"  {name}: SKIP (benched separately)", flush=True)
            continue
        t0 = time.time()
        try:
            n = q.fn(spark, sf_dir).count()
            dt = time.time() - t0
            total += dt
            if dt > 10:
                slow.append((name, dt))
            print(f"  {name}: rows={n} t={dt:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            fails.append(name)
            print(f"  {name}: FAIL {type(e).__name__}: {e}", flush=True)
        spark.catalog.clearCache()
    print(
        f"RESULT: {len(entries) - len(fails) - len(skip)}/{len(entries)} ok; "
        f"fails={fails}; total={total:.1f}s; over-10s={slow}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
