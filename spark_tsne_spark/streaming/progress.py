"""Per-iteration t-SNE progress sink + stream reader.

Behavioral twin of the reference's MNIST callback, which writes one
``result%05d.csv`` per iteration plus a running ``cost.txt`` from the
driver (reference ``MNIST.scala:50,58-70``), feeding the d3 player.
Here the sink also doubles as a Structured-Streaming-readable
directory: each iteration lands as one atomic CSV file, so
``spark.readStream.csv(dir)`` can tail a live optimization.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, types as T

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("iteration", T.IntegerType()),
        T.StructField("id", T.LongType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
    ]
)


class IterationSink:
    """Callback object for ``simple_tsne``/``bh_tsne``'s ``callback=``.

    Writes ``result{iteration:05d}.csv`` (iteration, id, x, y rows)
    per call and appends ``iteration,loss`` to ``cost.txt`` when a
    loss is reported — the reference's exact artifact shape, atomic
    enough for a file-source stream to consume.
    """

    def __init__(self, out_dir: str, ids: np.ndarray, every: int = 1):
        self.out_dir = out_dir
        self.ids = np.asarray(ids)
        self.every = every
        os.makedirs(out_dir, exist_ok=True)
        self._cost_path = os.path.join(out_dir, "cost.txt")

    def __call__(self, iteration: int, Y: np.ndarray, loss: float | None) -> None:
        if iteration % self.every != 0:
            return
        tmp = os.path.join(self.out_dir, f".result{iteration:05d}.csv.tmp")
        final = os.path.join(self.out_dir, f"result{iteration:05d}.csv")
        with open(tmp, "w") as f:
            for i, row in zip(self.ids, Y):
                f.write(f"{iteration},{int(i)},{row[0]},{row[1]}\n")
        os.rename(tmp, final)  # atomic: stream readers never see partials
        if loss is not None:
            with open(self._cost_path, "a") as f:
                f.write(f"{iteration},{loss}\n")


def read_progress_stream(spark: SparkSession, out_dir: str) -> DataFrame:
    """Tail an IterationSink directory as a Structured Stream."""
    return (
        spark.readStream.schema(PROGRESS_SCHEMA)
        .option("maxFilesPerTrigger", 10)
        .option("pathGlobFilter", "result*.csv")
        .csv(out_dir)
    )
