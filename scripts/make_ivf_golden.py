"""Generate the golden parquet for the ann_ivf_topk catalog oracle.

A regression pin of the operator's deterministic output (like
make_lsh_golden.py): the IVF path is seeded end to end — driver-side
spherical k-means on a deterministically-ordered sample, argmax cell
assignment, cosine ranking with (cosine desc, j) tiebreaks — and
verified byte-identical across local[8]/local[32]. Approximation
QUALITY (recall vs exact) is pinned separately by pytest.

    python scripts/make_ivf_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "ann_ivf_sf001.parquet",
)


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    from spark_tsne_spark.plans.queries import ann_ivf_topk

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("make-ivf-golden")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pdf = (
        ann_ivf_topk(spark, "/root/testdata/sf0.01")
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
