"""Generate the golden parquet for the ann_ivf_pq_topk catalog oracle.

Same pattern as make_ivf_golden.py: IVF-PQ is seeded end to end
(deterministic quantizer samples, linspace PQ seeding, argmin/argmax
assignment, tie-broken rankings) and partition-count invariant
(pinned by pytest). Approximation QUALITY (recall vs exact after the
exact re-rank) is pinned separately by pytest.

    python scripts/make_ivfpq_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "ann_ivfpq_sf001.parquet",
)


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    from spark_tsne_spark.plans.queries import ann_ivf_pq_topk

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("make-ivfpq-golden")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pdf = (
        ann_ivf_pq_topk(spark, "/root/testdata/sf0.01")
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
