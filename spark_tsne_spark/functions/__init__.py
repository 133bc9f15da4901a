from spark_tsne_spark.functions.vector import (
    l2_norm,
    sq_dist_from_norms,
    sq_dist,
    dot,
    cosine_sim,
)

__all__ = ["l2_norm", "sq_dist_from_norms", "sq_dist", "dot", "cosine_sim"]
