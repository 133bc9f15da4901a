"""End-to-end example pipeline — parity with the reference's MNIST
example (``MNIST.scala:17-74``), driven off the synthetic embeddings
table (the MNIST csv.gz itself is a git-lfs pointer in the reference).

Pipeline: read → limit (S2) → global standardize (P1-P2) → PCA (P3)
→ Barnes-Hut t-SNE → per-iteration CSV sink + cost.txt (S5) that the
reference's d3 player format can consume.

Usage:  python examples/mnist_like.py [out_dir] [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F


def main(out_dir: str = "/tmp/tsne_progress", sf_dir: str = "/root/testdata/sf0.001"):
    from spark_tsne_spark.api import bh_tsne
    from spark_tsne_spark.operators.preprocess import (
        global_stats,
        pca_project,
        standardize,
    )
    from spark_tsne_spark.session import get_spark
    from spark_tsne_spark.streaming.progress import IterationSink

    spark = get_spark("mnist-like-example")

    # S1/S2: typed read + row limit (reference keeps the first 6000)
    df = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .limit(6000)
        .select("vec_id", F.col("embedding").alias("features"))
    )

    # P1-P2: ONE global mean/std over all components (reference quirk)
    mean, std = global_stats(df)
    z = standardize(df, mean, std).cache()

    # P3: PCA to 50 dims (capped by input dim)
    dim = len(z.first()["features"])
    z50 = pca_project(z, k=min(50, dim)).cache()
    z50.count()

    # S5: per-iteration sink (result%05d.csv + cost.txt)
    ids = np.array([r["vec_id"] for r in z50.select("vec_id").collect()])
    sink = IterationSink(out_dir, np.sort(ids))

    res = bh_tsne(
        z50,
        max_iterations=200,
        perplexity=30.0,
        theta=0.5,
        seed=42,
        id_col="vec_id",
        features="features",
        callback=sink,
    )
    # Fold the per-iteration CSVs into the player JSON and place the
    # bundled viewer next to it: open player.html over any static
    # server and it autoloads tsne_run.json.
    import shutil

    from spark_tsne_spark.streaming.player import fold_progress_to_player_json

    labels = {int(i): int(i) % 10 for i in ids}
    fold_progress_to_player_json(
        out_dir, os.path.join(out_dir, "tsne_run.json"), labels=labels
    )
    shutil.copy(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "player.html"),
        os.path.join(out_dir, "player.html"),
    )
    print(f"final KL: {res.losses[-1][1]:.4f}; artifacts in {out_dir}")
    print(f"view: python -m http.server -d {out_dir}  ->  /player.html")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
