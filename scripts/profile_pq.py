"""Attribute ann_ivf_pq_topk's bench repeat growth (VERDICT r4 #4):
run the entry N times with per-stage wall timings (train / encode /
ADC+re-rank) and print one line per repeat. Usage:

    python scripts/profile_pq.py [repeats] [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("profile_pq")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spark_tsne_spark.operators.similarity import (
        _kmeans_centroids,
        _make_pq_encode,
        _make_pq_qfanout,
        _pq_codebooks,
        _pq_query_tail,
        _CODE_SCHEMA,
        _QFAN_SCHEMA,
    )
    from spark_tsne_spark.shipping import ship_package

    ship_package(spark)
    sc = spark.sparkContext

    for r in range(reps):
        t0 = time.time()
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        base = emb.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
        qs = base.where(F.col("id") < 100).select(
            F.col("id").alias("vec_id"), F.col("v").alias("embedding")
        )
        t1 = time.time()
        C, n_corpus, Xs = _kmeans_centroids(base, 16, 42, return_sample=True)
        books = _pq_codebooks(Xs, 8, 256, 42)
        t2 = time.time()
        b_C, b_books = sc.broadcast(C), sc.broadcast(books)
        par = sc.defaultParallelism
        parts = max(1, min(par, n_corpus // 4096 + 1))
        codes = base.repartition(parts).mapInPandas(
            _make_pq_encode(b_C, b_books), _CODE_SCHEMA
        )
        n_codes_rows = codes.count()
        t3 = time.time()
        query_cells = qs.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("v")
        ).mapInPandas(_make_pq_qfanout(b_C, 4), _QFAN_SCHEMA)
        qv = qs.select(F.col("vec_id").alias("i"), F.col("embedding").alias("vi"))
        out = _pq_query_tail(codes, query_cells, base, qv, 10, 4, b_books)
        n = out.count()
        t4 = time.time()
        print(
            f"repeat={r} total={t4 - t0:.2f}s train={t2 - t1:.2f}s "
            f"encode={t3 - t2:.2f}s query_tail={t4 - t3:.2f}s "
            f"rows={n} code_rows={n_codes_rows}",
            flush=True,
        )
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
