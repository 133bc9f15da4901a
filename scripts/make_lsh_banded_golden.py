"""Generate the golden parquet for the knn_lsh_banded_approx oracle.

Like make_lsh_golden.py, this is an exact REGRESSION PIN of a
deterministic operator's output, not an independent recomputation:
knn_lsh_banded is deterministic for a fixed seed by construction
(seeded numpy projections, JVM xxhash64 buckets, count-driven width
auto-tune, id-sorted bucket kernels, (dist, j)-tiebroken merge). The
pin turns the driver's rows-only check into a full value check;
approximation QUALITY (recall vs exact kNN) is pinned separately in
tests/test_r10_fixes.py.

    python scripts/make_lsh_banded_golden.py              # 8x1 entry
    python scripts/make_lsh_banded_golden.py --multiprobe # 6x2 entry
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MP = "--multiprobe" in sys.argv
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden",
    "knn_lsh_banded_mp_sf001.parquet" if MP else "knn_lsh_banded_sf001.parquet",
)


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    from spark_tsne_spark.plans.queries import (
        knn_lsh_banded_approx,
        knn_lsh_banded_multiprobe,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("make-lsh-banded-golden")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = knn_lsh_banded_multiprobe if MP else knn_lsh_banded_approx
    pdf = (
        fn(spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values(["i", "rank"])
        .reset_index(drop=True)
    )
    spark.stop()
    con = duckdb.connect()
    con.register("g", pdf)
    con.execute(
        f"COPY (SELECT * FROM g ORDER BY i, rank) TO '{OUT}' (FORMAT PARQUET)"
    )
    print(f"wrote {len(pdf)} rows to {OUT}")


if __name__ == "__main__":
    main()
