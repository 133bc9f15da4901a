"""Generate the golden parquet for the knn_lsh_approx catalog oracle.

Unlike x2p's golden (independently recomputed — see
make_x2p_golden.py), LSH hyperplanes come from MLlib's seeded
internal RNG, so the golden is an exact REGRESSION PIN of the
operator's deterministic output: every piece of knn_lsh is JVM-side
(seeded BucketedRandomProjectionLSH, expression-evaluated distances,
(dist, j)-tiebroken ranking), verified byte-identical across
local[8]/local[32] and shuffle-partition settings. The pin turns the
driver's rows-only check into a full value check; approximation
QUALITY (recall vs exact kNN) is pinned separately by pytest.

    python scripts/make_lsh_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "knn_lsh_sf001.parquet",
)


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    from spark_tsne_spark.plans.queries import knn_lsh_approx

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("make-lsh-golden")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pdf = (
        knn_lsh_approx(spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values(["i", "rank"])
        .reset_index(drop=True)
    )
    spark.stop()
    con = duckdb.connect()
    con.register("g", pdf)
    con.execute(f"COPY (SELECT * FROM g ORDER BY i, rank) TO '{OUT}' (FORMAT PARQUET)")
    print(f"wrote {len(pdf)} rows to {OUT}")


if __name__ == "__main__":
    main()
