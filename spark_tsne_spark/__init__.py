"""spark_tsne_spark — a PySpark-native distributed t-SNE + data-pipeline engine.

A from-scratch re-implementation of the capabilities of the reference
engine (saurfang/spark-tsne, a Scala/Breeze Spark 2.1 library) as an
idiomatic PySpark DataFrame/pandas-UDF engine, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB corpus pipeline needs.

Public API (mirrors the reference surface, SURVEY.md §2.9):

- ``x2p(df, tol=1e-5, perplexity=30.0)`` — affinity calibration
  (reference: ``X2P.scala:14``)
- ``compute_p(p_ji, n)`` — symmetrize + clamp (``TSNEHelper.scala:10``)
- ``simple_tsne(...)`` / ``bh_tsne(...)`` — exact and Barnes-Hut
  drivers (``SimpleTSNE.scala:15``, ``BHTSNE.scala:16``)
- ``TSNEParam`` — hyperparameters (``TSNEParam.scala:3-11``)
- ``SPTree`` — Barnes-Hut space-partitioning tree (``SPTree.scala``)
"""

from spark_tsne_spark.params import TSNEParam
from spark_tsne_spark.sptree import SPTree
from spark_tsne_spark.operators.x2p import x2p
from spark_tsne_spark.operators.affinities import compute_p
from spark_tsne_spark.api import simple_tsne, bh_tsne, lbfgs_tsne

__all__ = [
    "TSNEParam",
    "SPTree",
    "x2p",
    "compute_p",
    "simple_tsne",
    "bh_tsne",
    "lbfgs_tsne",
]

__version__ = "0.1.0"
