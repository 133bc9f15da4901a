"""Generate the golden parquet for the semdedup_prune catalog oracle.

Same pattern as make_ivf_golden.py: the operator is seeded end to end
(deterministic k-means sample, argmax assignment, id-ordered
triu-max prune rule) and partition-count invariant (pinned by
pytest), so its output is a stable regression target.

    python scripts/make_semdedup_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "semdedup_sf001.parquet",
)


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    from spark_tsne_spark.plans.queries import semdedup_prune

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("make-semdedup-golden")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pdf = (
        semdedup_prune(spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    spark.stop()
    assert not pdf["keep"].all(), "fixture must exercise the prune path"
    con = duckdb.connect()
    con.register("g", pdf)
    con.execute(f"COPY (SELECT * FROM g ORDER BY id) TO '{OUT}' (FORMAT PARQUET)")
    print(f"wrote {len(pdf)} rows ({int((~pdf['keep']).sum())} pruned) to {OUT}")


if __name__ == "__main__":
    main()
